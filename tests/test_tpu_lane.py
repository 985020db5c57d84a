"""Real-TPU kernel regression lane (VERDICT r1 weakness 5).

These tests compile the Pallas kernels with the ACTUAL Mosaic backend on a
real chip — interpret-mode CI cannot catch tile-alignment, DMA, or
lowering regressions.  Run with::

    SPEF_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_lane.py -v

In the default CPU-mesh CI lane every test here auto-skips.  Shapes are
kept small so the whole lane compiles in ~a minute (with the persistent
compile cache, seconds).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu

_on_tpu = jax.devices()[0].platform == "tpu"
requires_tpu = pytest.mark.skipif(not _on_tpu, reason="no real TPU available")


@requires_tpu
class TestPallasKernelsOnChip:
    def test_int8_matmul_requant_bit_exact(self):
        from spef_tpu.ops.pallas.int8_ops import int8_matmul_requant, xla_matmul_requant

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randint(-128, 128, (256, 128), np.int8))
        w = jnp.asarray(rng.randint(-128, 128, (128, 128), np.int8))
        mult = jnp.asarray(rng.rand(128).astype(np.float32) * 1e-2)
        bias = jnp.asarray(rng.randn(128).astype(np.float32) * 1e-2)
        kw = dict(relu=True, out_inv_step=37.0, out_qmax=127.0, out_qmin=0.0)
        a = int8_matmul_requant(x, w, mult, bias, **kw)
        b = xla_matmul_requant(x, w, mult, bias, **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_int8_depthwise3x3_bit_exact(self):
        from spef_tpu.ops.pallas.int8_ops import int8_depthwise3x3, xla_depthwise3x3

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randint(0, 128, (2, 16, 16, 128), np.int8))
        w = jnp.asarray(rng.randint(-8, 8, (3, 3, 128), np.int8))
        mult = jnp.asarray(rng.rand(128).astype(np.float32) * 1e-2)
        bias = jnp.asarray(rng.randn(128).astype(np.float32) * 1e-2)
        kw = dict(stride=1, in_step=0.05, out_inv_step=21.0, out_qmax=127.0)
        a = int8_depthwise3x3(x, w, mult, bias, **kw)
        b = xla_depthwise3x3(x, w, mult, bias, **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_int8_matmul_bits_carry_bit_exact(self):
        """in_unsigned decode + out_bits emit (interior unsigned 8-bit grids,
        w8a8 family — r5): the Pallas kernel must match the XLA op on-chip
        when the input carries uint8 bits AND the output grid is unsigned."""
        from spef_tpu.ops.pallas.int8_ops import int8_matmul_requant, xla_matmul_requant

        rng = np.random.RandomState(2)
        q_true = rng.randint(0, 256, (256, 128))  # unsigned q incl. >127
        x_bits = jnp.asarray(np.where(q_true > 127, q_true - 256, q_true).astype(np.int8))
        w = jnp.asarray(rng.randint(-128, 128, (128, 128), np.int8))
        mult = jnp.asarray(rng.rand(128).astype(np.float32) * 1e-2)
        bias = jnp.asarray(rng.randn(128).astype(np.float32) * 1e-2)
        kw = dict(relu=True, out_inv_step=9.0, out_qmax=255.0, out_qmin=0.0,
                  in_unsigned=True, out_bits=True)
        a = int8_matmul_requant(x_bits, w, mult, bias, **kw)
        b = xla_matmul_requant(x_bits, w, mult, bias, **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # The emit genuinely exercises the wrap region (negative bits).
        assert (np.asarray(a) < 0).any()

    def test_int8_depthwise_bits_carry_bit_exact(self):
        from spef_tpu.ops.pallas.int8_ops import int8_depthwise3x3, xla_depthwise3x3

        rng = np.random.RandomState(3)
        q_true = rng.randint(0, 256, (2, 16, 16, 128))
        x_bits = jnp.asarray(np.where(q_true > 127, q_true - 256, q_true).astype(np.int8))
        w = jnp.asarray(rng.randint(-8, 8, (3, 3, 128), np.int8))
        mult = jnp.asarray(rng.rand(128).astype(np.float32) * 1e-2)
        bias = jnp.asarray(rng.randn(128).astype(np.float32) * 1e-2)
        kw = dict(stride=1, in_step=0.05, out_inv_step=900.0, out_qmax=255.0,
                  in_unsigned=True, out_bits=True)
        a = int8_depthwise3x3(x_bits, w, mult, bias, **kw)
        b = xla_depthwise3x3(x_bits, w, mult, bias, **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert (np.asarray(a) < 0).any()

    def test_w8a8_pallas_pipeline_on_chip(self):
        """Whole-pipeline w8a8 parity ON CHIP: the per-layer Pallas executor
        (bits-carries through HBM) vs the exact int32 reference executor."""
        from spef_tpu.models.wrapper import import_model
        from spef_tpu.quant.bitwidth import default_bit_width
        from spef_tpu.quant.convert import convert_qat_params
        from spef_tpu.quant.int8_model import build_int8_forward
        from spef_tpu.quant.int8_pallas import build_pallas_forward
        from spef_tpu.quant.parity import compare_tensors

        bw = default_bit_width(n_blocks=2, w=8, a=8, shared=8)
        bw["inverted_residual"][0] = [(8, 8), (8, 8), (8,)]
        model = import_model(
            backbone_name="small_mobile_q", head_name="ursonet_q",
            img_size=(48, 64), bit_width=bw, ori_mode="classification",
            n_ori_bins=64, pos_mode="regression", seed=3,
        )
        graph = convert_qat_params(model)
        images = jnp.asarray(
            np.random.RandomState(11).randint(0, 256, (4, 48, 64, 3), dtype=np.uint8))
        ref = jax.jit(build_int8_forward(graph))(images)
        pal = build_pallas_forward(graph, backend="pallas")(images)
        for k, (r, o) in enumerate(zip(ref, pal)):
            m = compare_tensors(r, o)
            assert m["cosine"] > 0.999, (k, m)

    def _block_entry(self, rng, cin, ch, cout, stride, residual):
        def conv(shape):
            return {
                "w_int": jnp.asarray(rng.randint(-8, 8, shape, np.int8)),
                "mult_core": jnp.asarray(rng.rand(shape[-1]).astype(np.float32) * 1e-2),
                "bias": jnp.asarray(rng.randn(shape[-1]).astype(np.float32) * 1e-2),
                "stride": 1,
                "groups": 1,
            }

        blk = {
            "use_residual": residual,
            "input_quant": True,
            "expand_ratio": ch // cin,
            "shared_step": 0.07,
            "shared_qmax": 127.0,
            "expand": {**conv((1, 1, cin, ch)), "act_step": 0.045, "act_qmax": 255.0},
            "depthwise": {**conv((3, 3, 1, ch)), "stride": stride, "groups": ch,
                          "act_step": 0.03, "act_qmax": 255.0},
            "project": conv((1, 1, ch, cout)),
        }
        return blk

    @pytest.mark.parametrize("stride,residual", [(1, True), (1, False), (2, False)])
    def test_fused_mbconv_matches_xla_block(self, stride, residual):
        from spef_tpu.ops.pallas.fused_block import fused_mbconv, pad_act, unpad_act
        from spef_tpu.quant.int8_fused import _xla_block

        rng = np.random.RandomState(2 + stride)
        cin = cout = 32
        blk = self._block_entry(rng, cin, 64, cout, stride, residual)
        x = jnp.asarray(rng.randint(-64, 64, (2, 16, 16, cin), np.int8))
        in_step = blk["shared_step"] if residual else 0.05
        out_grid = {"step": 0.06, "qmax": 127.0, "qmin": -128.0}
        shared = {"step": blk["shared_step"], "qmax": blk["shared_qmax"],
                  "qmin": -blk["shared_qmax"] - 1}
        a = fused_mbconv(pad_act(x), blk, in_step=in_step, out_grid=out_grid,
                         shared_grid=shared, logical_hw=(16, 16))
        a = unpad_act(a, 16 // stride, cout)
        b, _ = _xla_block(x, blk, in_step, out_grid)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fused_stem_matches_carry(self):
        from spef_tpu.ops.pallas.fused_block import fused_stem, unpad_act
        from spef_tpu.quant.int8_carry import _conv_acc, _requant_int8

        rng = np.random.RandomState(7)
        stem = {
            "w_int": jnp.asarray(rng.randint(-8, 8, (3, 3, 3, 32), np.int8)),
            "mult_core": jnp.asarray(rng.rand(32).astype(np.float32) * 1e-2),
            "bias": jnp.asarray(rng.randn(32).astype(np.float32) * 1e-2),
            "act_step": 0.02,
            "act_qmax": 255.0,
            "stride": 2,
            "groups": 1,
        }
        images = jnp.asarray(rng.randint(0, 256, (2, 32, 32, 3), np.uint8))
        a = unpad_act(fused_stem(images, stem), 16, 32)

        acc = _conv_acc(images, stem["w_int"], 2, 1)
        yf = jnp.maximum(acc * (stem["mult_core"] / 255.0) + stem["bias"], 0.0)
        b = _requant_int8(yf, stem["act_step"], stem["act_qmax"])
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@requires_tpu
class TestPackedOnChip:
    """On-chip (Mosaic, non-interpret) validation of the width-packed
    layouts: the r3 phase-major kernels consume packed slabs directly
    (lane-slice column shifts, block-diagonal matmuls) — no lane->sublane
    split reshape anywhere, so these must lower on real Mosaic."""

    @pytest.mark.parametrize("stride,residual", [(1, True), (2, False)])
    def test_packed_block_matches_plain(self, stride, residual):
        from spef_tpu.ops.pallas.fused_block import (
            fused_mbconv, pad_act, pad_act_packed, unpad_act, unpad_act_packed)

        rng = np.random.RandomState(31 + stride)
        entry = TestPallasKernelsOnChip()
        blk = entry._block_entry(rng, 32, 64, 32, stride, residual)
        x = jnp.asarray(rng.randint(-64, 64, (2, 16, 16, 32), np.int8))
        in_step = blk["shared_step"] if residual else 0.05
        out_grid = {"step": 0.06, "qmax": 127.0, "qmin": -128.0}
        shared = {"step": blk["shared_step"], "qmax": blk["shared_qmax"]}
        kw = dict(in_step=in_step, out_grid=out_grid, shared_grid=shared,
                  logical_hw=(16, 16))
        plain = unpad_act(fused_mbconv(pad_act(x), blk, **kw), 16 // stride, 32)
        packed = unpad_act_packed(
            fused_mbconv(pad_act_packed(x), blk, in_packed=True,
                         out_packed=True, **kw), 16 // stride, 32)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(packed))

    def test_packed_stem_matches_plain(self):
        from spef_tpu.ops.pallas.fused_block import (
            fused_stem, unpad_act, unpad_act_packed)

        rng = np.random.RandomState(7)
        stem = {
            "w_int": jnp.asarray(rng.randint(-8, 8, (3, 3, 3, 32), np.int8)),
            "mult_core": jnp.asarray(rng.rand(32).astype(np.float32) * 1e-2),
            "bias": jnp.asarray(rng.randn(32).astype(np.float32) * 1e-2),
            "stride": 2, "groups": 1, "act_step": 0.05, "act_qmax": 255.0,
        }
        images = jnp.asarray(rng.randint(0, 256, (2, 32, 48, 3), dtype=np.uint8))
        plain = unpad_act(fused_stem(images, stem), 24, 32)
        packed = unpad_act_packed(fused_stem(images, stem, out_packed=True), 24, 32)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(packed))


@requires_tpu
def test_boundary_block_matches_xla_on_chip():
    """Boundary-only recipe (no inner act grids) through the fused kernel on
    the real chip, plain layout."""
    from spef_tpu.ops.pallas.fused_block import fused_mbconv, pad_act, unpad_act
    from spef_tpu.quant.int8_fused import _xla_block

    rng = np.random.RandomState(41)
    entry = TestPallasKernelsOnChip()
    blk = entry._block_entry(rng, 32, 64, 32, 1, False)
    for part in ("expand", "depthwise"):
        blk[part].pop("act_step"), blk[part].pop("act_qmax")
    x = jnp.asarray(rng.randint(-64, 64, (2, 16, 16, 32), np.int8))
    out_grid = {"step": 0.06, "qmax": 127.0, "qmin": -128.0}
    a = unpad_act(
        fused_mbconv(pad_act(x), blk, in_step=0.05, out_grid=out_grid,
                     logical_hw=(16, 16)), 16, 32)
    b, _ = _xla_block(x, blk, 0.05, out_grid)
    d = np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32))
    assert d.max() <= 1, d.max()  # f32-vs-bf16 interior: requant ties only


@requires_tpu
def test_exported_artifact_runs_on_chip(tmp_path):
    """AOT deployment artifact (spef_tpu/deploy.py): a tpu+cpu jax.export
    of the predict pipeline must load and execute on the real chip and
    match the live engine (the FINN-deploy / TVM-lib.tar parity check,
    `src/finn/spe_finn.py:92-151`)."""
    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.data.camera import DSPEED_CAMERA
    from spef_tpu.deploy import export_predict, load_exported
    from spef_tpu.engine import SPEJax, build_predict_fn
    from spef_tpu.models.wrapper import import_model

    spe_utils = SPEUtils.create(
        DSPEED_CAMERA, ori_mode="classification", n_ori_bins_per_dim=4,
        pos_mode="classification", n_pos_bins_per_dim=4,
    )
    model = import_model(
        backbone_name="small_mobile", head_name="ursonet", img_size=(32, 48),
        ori_mode="classification", n_ori_bins=spe_utils.orientation.n_bins,
        pos_mode="classification", n_pos_bins=spe_utils.position.n_bins, seed=5,
    )
    path = str(tmp_path / "model.spef")
    export_predict(build_predict_fn(model, spe_utils), batch=2,
                   img_size=(32, 48), out_path=path, platforms=("tpu", "cpu"))
    images = np.random.RandomState(9).randint(0, 256, (2, 32, 48, 3),
                                              dtype=np.uint8)
    pose, ms = load_exported(path).predict(images)
    live, _ = SPEJax(model, spe_utils).predict(images)
    assert ms > 0
    for k in live:
        np.testing.assert_allclose(np.asarray(pose[k]), np.asarray(live[k]),
                                    rtol=1e-4, atol=1e-4, err_msg=k)
