"""Tests for the QAT stack: fake-quant primitives, quantized models,
bit-width schema compatibility, and QAT trainability."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spef_tpu.quant.bitwidth import default_bit_width, load_bit_width, save_bit_width
from spef_tpu.quant.fake_quant import FakeQuantAct, quantize_input_image, quantize_weight
from spef_tpu.models.wrapper import import_model


class TestFakeQuant:
    def test_weight_quant_levels(self):
        w = jnp.asarray(np.random.RandomState(0).randn(3, 3, 4, 8).astype(np.float32))
        wq = np.asarray(quantize_weight(w, bits=3))
        # Per output channel: at most 2^3 - 1 = 7 distinct levels (narrow range).
        for c in range(8):
            levels = np.unique(np.round(wq[..., c] / (np.abs(wq[..., c]).max() / 3 + 1e-12)))
            assert len(np.unique(wq[..., c])) <= 7

    def test_weight_quant_none_is_identity(self):
        w = jnp.asarray(np.random.RandomState(1).randn(4, 4).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(quantize_weight(w, None)), np.asarray(w))

    def test_weight_quant_gradient_flows(self):
        w = jnp.asarray(np.random.RandomState(2).randn(8).astype(np.float32))
        g = jax.grad(lambda w: jnp.sum(quantize_weight(w, 4) ** 2))(w)
        assert np.abs(np.asarray(g)).sum() > 0

    def test_binary_ternary(self):
        w = jnp.asarray(np.random.RandomState(3).randn(16, 4).astype(np.float32))
        wb = np.asarray(quantize_weight(w, 1))
        assert all(len(np.unique(wb[:, c])) <= 2 for c in range(4))
        wt = np.asarray(quantize_weight(w, 2))
        assert all(len(np.unique(wt[:, c])) <= 3 for c in range(4))

    def test_act_quant_levels_and_grad(self):
        m = FakeQuantAct(bits=4, signed=False)
        x = jnp.linspace(0, 8, 100)
        params = m.init(jax.random.PRNGKey(0), x)
        y = np.asarray(m.apply(params, x))
        assert len(np.unique(y)) <= 16
        g = jax.grad(lambda p: jnp.sum(m.apply(p, x)))(params)
        assert np.isfinite(jax.tree_util.tree_leaves(g)[0]).all()

    def test_input_quant_grid(self):
        x = jnp.asarray([0.0, 0.5, 1.0, 1.2, -0.1])
        y = np.asarray(quantize_input_image(x, 8))
        np.testing.assert_allclose(y * 255, np.round(np.clip(np.asarray(x), 0, 1) * 255), atol=1e-5)


class TestBitWidthSchema:
    def test_roundtrip(self, tmp_path):
        bw = default_bit_width(n_blocks=17)
        save_bit_width(str(tmp_path), bw)
        loaded = load_bit_width(str(tmp_path / "bit_width.json"))
        assert loaded == bw

    def test_reference_format(self, tmp_path):
        """File format matches the reference: stringified tuples."""
        bw = default_bit_width(2)
        save_bit_width(str(tmp_path), bw)
        with open(tmp_path / "bit_width.json") as f:
            raw = json.load(f)
        assert raw["first_conv"] == "(3, 3)"
        assert isinstance(raw["inverted_residual"], list)
        assert raw["inverted_residual"][0].startswith("[(")

    def test_missing_file_warns_returns_none(self, tmp_path):
        with pytest.warns(UserWarning):
            assert load_bit_width(str(tmp_path / "nope.json")) is None


class TestQuantModels:
    def test_qsmall_forward(self):
        model = import_model(
            backbone_name="small_q", head_name="ursonet_q", img_size=(32, 32),
            ori_mode="regression", pos_mode="regression",
        )
        out = model.apply(jnp.ones((2, 32, 32, 3)) * 0.5)
        assert out[0].shape == (2, 4) and out[1].shape == (2, 3)
        assert np.isfinite(np.asarray(out[0])).all()

    def test_qsmall_mobile_with_bit_width(self):
        bw = default_bit_width(n_blocks=2, w=4, a=4)
        model = import_model(
            backbone_name="small_mobile_q", head_name="ursonet_q", img_size=(32, 48),
            bit_width=bw, ori_mode="classification", n_ori_bins=100, pos_mode="regression",
        )
        out = model.apply(jnp.ones((1, 32, 48, 3)) * 0.3)
        assert out[0].shape == (1, 100)

    def test_quantization_off_matches_float_semantics(self):
        """quantization=False must produce a plain float network."""
        model = import_model(
            backbone_name="small_q", head_name="ursonet_q", img_size=(32, 32),
            quantization=False, ori_mode="regression", pos_mode="regression",
        )
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        out = model.apply(x)
        assert np.isfinite(np.asarray(out[0])).all()
        # No act-quant scale parameters present.
        flat = jax.tree_util.tree_leaves_with_path(model.variables["params"])
        assert not any("log2_scale" in str(p) for p, _ in flat)

    def test_brevitas_aliases(self):
        model = import_model(
            backbone_name="small_brevitas", head_name="ursonet_brevitas", img_size=(32, 32),
            ori_mode="regression", pos_mode="regression",
        )
        assert model.backbone_name == "small_q" and model.head_name == "ursonet_q"

    def test_qat_gradient_step_decreases_loss(self):
        import optax

        model = import_model(
            backbone_name="small_q", head_name="ursonet_q", img_size=(24, 24),
            ori_mode="regression", pos_mode="regression",
        )
        x = jax.random.uniform(jax.random.PRNGKey(1), (4, 24, 24, 3))
        target = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (4, 1))

        tx = optax.sgd(0.05, momentum=0.9)
        params = model.variables["params"]
        opt_state = tx.init(params)

        def loss_fn(p):
            variables = {"params": p, "batch_stats": model.variables["batch_stats"]}
            ori, pos = model.module.apply(variables, x, False)
            ori = ori / jnp.linalg.norm(ori, axis=-1, keepdims=True)
            return jnp.mean(jnp.sum((ori - target) ** 2, axis=-1))

        l0 = float(loss_fn(params))
        for _ in range(10):
            g = jax.grad(loss_fn)(params)
            updates, opt_state = tx.update(g, opt_state)
            params = optax.apply_updates(params, updates)
        l1 = float(loss_fn(params))
        assert l1 < l0, (l0, l1)

    def test_shared_residual_scale_is_shared(self):
        """The residual add's two quantizers must be ONE parameter."""
        model = import_model(
            backbone_name="small_q", head_name="ursonet_q", img_size=(32, 32),
            ori_mode="regression", pos_mode="regression",
        )
        flat = [
            "/".join(str(getattr(k, "key", k)) for k in path)
            for path, _ in jax.tree_util.tree_leaves_with_path(model.variables["params"])
        ]
        shared = [p for p in flat if "/shared_quant/" in p]
        assert len(shared) == 1, shared
