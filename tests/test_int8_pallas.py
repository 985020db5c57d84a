"""Parity tests: Pallas-fused int8 pipeline vs the reference int8 executor
and the QAT fake-quant network (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from spef_tpu.models.wrapper import import_model
from spef_tpu.quant.bitwidth import default_bit_width
from spef_tpu.quant.convert import convert_qat_params
from spef_tpu.quant.int8_model import build_int8_forward
from spef_tpu.quant.int8_pallas import build_pallas_forward
from spef_tpu.quant.parity import compare_tensors


@pytest.fixture(scope="module")
def setup():
    bw = default_bit_width(n_blocks=2, w=4, a=4, shared=4)
    bw["inverted_residual"][0] = [(4, 4), (4, 4), (4,)]
    model = import_model(
        backbone_name="small_mobile_q", head_name="ursonet_q", img_size=(32, 48),
        bit_width=bw, ori_mode="classification", n_ori_bins=64, pos_mode="regression",
        seed=11,
    )
    graph = convert_qat_params(model)
    images = jnp.asarray(
        np.random.RandomState(5).randint(0, 256, (2, 32, 48, 3), dtype=np.uint8)
    )
    return model, graph, images


def test_pallas_matches_reference_int8_executor(setup):
    model, graph, images = setup
    ref_fwd = build_int8_forward(graph)
    pallas_fwd = build_pallas_forward(graph)
    ref_out = ref_fwd(images)
    with pltpu.force_tpu_interpret_mode():
        pal_out = pallas_fwd(images)
    for r, p, name in ((ref_out[0], pal_out[0], "ori"), (ref_out[1], pal_out[1], "pos")):
        m = compare_tensors(r, p)
        assert m["cosine"] > 0.9999, (name, m)
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), rtol=1e-3, atol=1e-3)


def test_pallas_matches_qat(setup):
    model, graph, images = setup
    pallas_fwd = build_pallas_forward(graph)
    with pltpu.force_tpu_interpret_mode():
        pal_out = pallas_fwd(images)
    qat_out = model.apply(images.astype(jnp.float32) / 255.0, False)
    m = compare_tensors(qat_out[0], pal_out[0])
    assert m["cosine"] > 0.999, m


def test_default_recipe_unquantized_expand():
    """The default bit-width recipe leaves block 0's expand conv unquantized
    ((None, None)) — both executors must handle the float handoff."""
    from spef_tpu.quant.int8_model import build_int8_forward as build_ref

    model = import_model(
        backbone_name="small_mobile_q", head_name="ursonet_q", img_size=(32, 48),
        bit_width=None,  # default recipe
        ori_mode="classification", n_ori_bins=64, pos_mode="regression", seed=13,
    )
    graph = convert_qat_params(model)
    assert "act_step" not in graph["blocks"][0]["expand"]  # the interesting case

    images = jnp.asarray(
        np.random.RandomState(9).randint(0, 256, (2, 32, 48, 3), dtype=np.uint8)
    )
    ref_out = build_ref(graph)(images)
    with pltpu.force_tpu_interpret_mode():
        pal_out = build_pallas_forward(graph, backend="pallas")(images)
    xla_out = build_pallas_forward(graph, backend="xla")(images)
    for a, b in ((ref_out, pal_out), (ref_out, xla_out)):
        m = compare_tensors(a[0], b[0])
        assert m["cosine"] > 0.9999, m


def test_fused_pipeline_matches_reference_with_batch_tiling(setup):
    """Whole-pipeline parity of the fused-block executor (int8_fused), with a
    batch size that activates tile_b > 1 (multiple images per program)."""
    from spef_tpu.quant.int8_fused import build_fused_forward

    model, graph, _ = setup
    images = jnp.asarray(
        np.random.RandomState(17).randint(0, 256, (8, 32, 48, 3), dtype=np.uint8)
    )
    ref_out = build_int8_forward(graph)(images)
    fused = build_fused_forward(graph, interpret=True)
    fused_out = fused(images)
    for r, p, name in ((ref_out[0], fused_out[0], "ori"),
                       (ref_out[1], fused_out[1], "pos")):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), rtol=1e-3,
                                   atol=1e-3, err_msg=name)


def test_fused_pipeline_packed_layout_matches_plain(setup, monkeypatch):
    """Executor-level parity of the width-PACKED (phase-major) fused path:
    SPEF_PACK=1 engages the packed layouts for every <=32-channel boundary
    (stem + both blocks of the small model) including the packed->plain
    relayout at the chain's end — output must be bit-identical to the plain
    fused executor and match the reference int8 executor."""
    from spef_tpu.quant.int8_fused import build_fused_forward

    model, graph, _ = setup
    images = jnp.asarray(
        np.random.RandomState(21).randint(0, 256, (4, 32, 48, 3), dtype=np.uint8)
    )
    plain_out = build_fused_forward(graph, interpret=True)(images)
    monkeypatch.setenv("SPEF_PACK", "1")
    packed_out = build_fused_forward(graph, interpret=True)(images)
    for a, b, name in ((plain_out[0], packed_out[0], "ori"),
                       (plain_out[1], packed_out[1], "pos")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
    ref_out = build_int8_forward(graph)(images)
    np.testing.assert_allclose(np.asarray(packed_out[0]), np.asarray(ref_out[0]),
                               rtol=1e-3, atol=1e-3)


def test_fused_mbconv_tile_b_variants_identical():
    """fused_mbconv output is invariant to (tile_oh, tile_b) choices."""
    from spef_tpu.ops.pallas.fused_block import fused_mbconv, pad_act

    rng = np.random.RandomState(3)
    blk = {
        "use_residual": False,
        "input_quant": True,
        "expand_ratio": 4,
        "shared_step": 0.07,
        "shared_qmax": 127.0,
        "expand": {"w_int": jnp.asarray(rng.randint(-8, 8, (1, 1, 32, 64), np.int8)),
                   "mult_core": jnp.asarray(rng.rand(64).astype(np.float32) * 1e-2),
                   "bias": jnp.asarray(rng.randn(64).astype(np.float32) * 1e-2),
                   "stride": 1, "groups": 1, "act_step": 0.045, "act_qmax": 255.0},
        "depthwise": {"w_int": jnp.asarray(rng.randint(-8, 8, (3, 3, 1, 64), np.int8)),
                      "mult_core": jnp.asarray(rng.rand(64).astype(np.float32) * 1e-2),
                      "bias": jnp.asarray(rng.randn(64).astype(np.float32) * 1e-2),
                      "stride": 2, "groups": 64, "act_step": 0.03, "act_qmax": 255.0},
        "project": {"w_int": jnp.asarray(rng.randint(-8, 8, (1, 1, 64, 32), np.int8)),
                    "mult_core": jnp.asarray(rng.rand(32).astype(np.float32) * 1e-2),
                    "bias": jnp.asarray(rng.randn(32).astype(np.float32) * 1e-2),
                    "stride": 1, "groups": 1},
    }
    x = pad_act(jnp.asarray(rng.randint(-64, 64, (4, 16, 16, 32), np.int8)))
    out_grid = {"step": 0.06, "qmax": 127.0, "qmin": -128.0}
    outs = []
    for tile_oh, tile_b in ((8, 1), (8, 4), (4, 2)):
        with pltpu.force_tpu_interpret_mode():
            o = fused_mbconv(x, blk, in_step=0.05, out_grid=out_grid,
                             logical_hw=(16, 16), tile_oh=tile_oh, tile_b=tile_b)
        outs.append(np.asarray(o))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_boundary_recipe_all_executors_agree():
    """Boundary-only recipe (int8 between blocks, float interiors —
    quant/bitwidth.boundary_bit_width): every executor must handle a block
    with NO depthwise act grid and agree with the reference executor."""
    from spef_tpu.quant.bitwidth import boundary_bit_width
    from spef_tpu.quant.int8_fused import build_fused_forward
    from spef_tpu.quant.int8_model import build_int8_forward as build_ref

    model = import_model(
        backbone_name="small_mobile_q", head_name="ursonet_q", img_size=(32, 48),
        bit_width=boundary_bit_width(n_blocks=2),
        ori_mode="classification", n_ori_bins=64, pos_mode="regression", seed=23,
    )
    graph = convert_qat_params(model)
    for blk in graph["blocks"]:
        assert "act_step" not in blk["depthwise"]  # the recipe's point
        if "expand" in blk:
            assert "act_step" not in blk["expand"]

    images = jnp.asarray(
        np.random.RandomState(29).randint(0, 256, (4, 32, 48, 3), dtype=np.uint8)
    )
    ref_out = build_ref(graph)(images)
    xla_out = build_pallas_forward(graph, backend="xla")(images)
    with pltpu.force_tpu_interpret_mode():
        pal_out = build_pallas_forward(graph, backend="pallas")(images)
    fused_out = build_fused_forward(graph, interpret=True)(images)
    for out, name in ((xla_out, "carry"), (pal_out, "pallas")):
        m = compare_tensors(ref_out[0], out[0])
        # Float interiors run bf16 in the deployment executors vs f32 in the
        # reference one: close, not bit-exact.  On an UNTRAINED net the head
        # pool sits on a rounding knife-edge (pooled ~0.8 quant steps), so
        # single p_int flips are expected and cosine/zero_pattern on ~1e-3
        # logits are meaningless — bound the absolute error instead; the
        # trained-model parity gate is the build ladder's parity_report.
        assert m["mse"] < 1e-5, (name, m)
        assert np.isfinite(np.asarray(out[0])).all(), name
    # The fused kernel's f32 dw taps flip occasional requant TIES vs the
    # reference's ordering (verified per-block: maxdiff == 1 int step).  On
    # an untrained net the logits are ~1e-3, so cosine is meaningless —
    # bound the absolute error in head-input quant steps instead.
    m = compare_tensors(ref_out[0], fused_out[0])
    assert m["mse"] < 5e-7 and m["zero_pattern"] == 1.0, m
    assert np.isfinite(np.asarray(fused_out[0])).all()


def test_boundary_recipe_saturated_stem_all_executors():
    """Boundary recipe with the stem/head unsigned 8-bit grids SATURATED
    into the upper half (q in 128..255) — the regime a plain int8 cast
    wraps to negatives (found on the w8a8 ladder: int8 test ESA 0.61 vs
    QAT 0.17).  The kernel executors carry uint8 BITS for these edges
    (``in_unsigned`` decode) and must agree with the exact reference."""
    from spef_tpu.quant.bitwidth import boundary_bit_width
    from spef_tpu.quant.int8_carry import build_int8_carry_forward
    from spef_tpu.quant.int8_fused import build_fused_forward
    from spef_tpu.quant.int8_model import build_int8_forward as build_ref

    model = import_model(
        backbone_name="small_mobile_q", head_name="ursonet_q", img_size=(32, 48),
        bit_width=boundary_bit_width(n_blocks=2),
        ori_mode="classification", n_ori_bins=64, pos_mode="regression", seed=31,
    )
    # Shrink every learned activation range so activations fill the whole
    # unsigned grid, including q > 127.
    model.variables = jax.tree_util.tree_map_with_path(
        lambda path, v: jnp.full_like(v, np.log2(0.25))
        if path and getattr(path[-1], "key", None) == "log2_scale" else v,
        model.variables,
    )
    graph = convert_qat_params(model)
    assert graph["stem"]["act_qmax"] == 255.0
    images = jnp.asarray(
        np.random.RandomState(37).randint(0, 256, (4, 32, 48, 3), dtype=np.uint8)
    )
    # Confirm the stem actually exercises the wrap region on this input.
    from spef_tpu.quant.int8_carry import _conv_acc

    stem = graph["stem"]
    acc = _conv_acc(images, stem["w_int"], 2, 1)
    yf = jnp.maximum(acc * (stem["mult_core"] / 255.0) + stem["bias"], 0.0)
    qstem = np.asarray(jnp.clip(jnp.round(yf / stem["act_step"]), 0, 255))
    assert (qstem > 127).mean() > 0.02, "test input no longer hits q>127"

    ref_out = build_ref(graph)(images)
    outs = {"carry": build_int8_carry_forward(graph)(images),
            "xla": build_pallas_forward(graph, backend="xla")(images)}
    with pltpu.force_tpu_interpret_mode():
        outs["pallas"] = build_pallas_forward(graph, backend="pallas")(images)
    outs["fused"] = build_fused_forward(graph, interpret=True)(images)
    for name, out in outs.items():
        for k, (r, o) in enumerate(zip(ref_out, out)):
            m = compare_tensors(r, o)
            assert m["cosine"] > 0.999, (name, k, m)
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=5e-3, atol=5e-3,
                                       err_msg=f"{name}[{k}]")


def test_packed_layout_roundtrip_and_block_equivalence():
    """Width-packed layout (4 px/lane-group for c<=32): pad/unpad roundtrip,
    and fused_mbconv yields identical ints through packed vs plain layouts."""
    from spef_tpu.ops.pallas.fused_block import (
        fused_mbconv, pad_act, pad_act_packed, unpad_act, unpad_act_packed)

    rng = np.random.RandomState(11)
    x = rng.randint(-50, 50, (2, 8, 24, 24)).astype(np.int8)
    rt = unpad_act_packed(pad_act_packed(jnp.asarray(x)), 24, 24)
    np.testing.assert_array_equal(np.asarray(rt), x)

    def conv(shape):
        return {"w_int": jnp.asarray(rng.randint(-8, 8, shape, np.int8)),
                "mult_core": jnp.asarray(rng.rand(shape[-1]).astype(np.float32) * 1e-2),
                "bias": jnp.asarray(rng.randn(shape[-1]).astype(np.float32) * 1e-2),
                "stride": 1, "groups": 1}

    # (stride, residual, expand, grids, equal-grid residual, tiling):
    # covers the phase-major kernel's branches — block-diag expand vs
    # identity, hidden/dw grids vs boundary recipe (real interiors), the
    # ratio-requant vs clamp residual exits, and multi-tile/batch tiling
    # (group-boundary column shifts + DMA edge masks).
    cases = [
        dict(stride=1, residual=True, expand=True, grids=True, eqgrid=False),
        dict(stride=2, residual=False, expand=True, grids=True, eqgrid=False),
        dict(stride=1, residual=True, expand=False, grids=True, eqgrid=False),
        dict(stride=1, residual=True, expand=True, grids=False, eqgrid=False),
        dict(stride=1, residual=True, expand=True, grids=True, eqgrid=True),
        dict(stride=2, residual=False, expand=False, grids=False, eqgrid=False),
        dict(stride=1, residual=True, expand=True, grids=True, eqgrid=False,
             tile_oh=4, tile_b=2),
        dict(stride=2, residual=False, expand=True, grids=False, eqgrid=False,
             tile_oh=2, tile_b=2),
    ]
    for case in cases:
        stride, residual = case["stride"], case["residual"]
        cin = cout = 32
        ch = cin if not case["expand"] else 128
        dw = {**conv((3, 3, 1, ch)), "stride": stride, "groups": ch}
        if case["grids"]:
            dw.update(act_step=0.03, act_qmax=255.0)
        blk = {"use_residual": residual, "input_quant": True, "expand_ratio": 4,
               "shared_step": 0.07, "shared_qmax": 127.0,
               "depthwise": dw, "project": conv((1, 1, ch, cout))}
        if case["expand"]:
            blk["expand"] = conv((1, 1, cin, ch))
            if case["grids"]:
                blk["expand"].update(act_step=0.045, act_qmax=255.0)
        h = w = 16
        x = rng.randint(-40, 40, (2, h, w, cin)).astype(np.int8)
        if case["eqgrid"]:
            grid = {"step": blk["shared_step"], "qmax": 127.0, "qmin": -128.0}
        else:
            grid = {"step": 0.06, "qmax": 127.0, "qmin": -128.0}
        shared = {"step": blk["shared_step"], "qmax": blk["shared_qmax"]}
        kw = dict(in_step=0.05, out_grid=grid, logical_hw=(h, w),
                  shared_grid=shared if residual else None, interpret=True,
                  tile_oh=case.get("tile_oh", 0), tile_b=case.get("tile_b", 0))
        plain = unpad_act(
            fused_mbconv(pad_act(jnp.asarray(x)), blk, **kw), w // stride, cout)
        packed = unpad_act_packed(
            fused_mbconv(pad_act_packed(jnp.asarray(x)), blk,
                         in_packed=True, out_packed=True, **kw),
            w // stride, cout)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(packed),
                                      err_msg=str(case))


def test_fused_packed_wide_to_narrow_transition(monkeypatch):
    """Wide->narrow block (c>32 -> cout<=32, absent from MobileNetV2 but
    reachable for custom settings) under SPEF_PACK: the plain-input kernel
    cannot emit the packed layout on real Mosaic (lane-merge reshape), so
    the executor emits plain and repacks XLA-side — parity with the plain
    fused executor must hold through the transition."""
    from spef_tpu.models.wrapper import ModelWrapper, SPEModel
    from spef_tpu.quant.bitwidth import default_bit_width
    from spef_tpu.quant.int8_fused import build_fused_forward
    from spef_tpu.quant.qmodels import QMobileNetV2, QURSONetHead

    bw = default_bit_width(n_blocks=2, w=4, a=4, shared=4)
    bw["inverted_residual"][0] = [(4, 4), (4, 4), (4,)]
    backbone = QMobileNetV2(
        out_features=64, settings=((6, 64, 1, 1), (6, 24, 1, 2)),
        batchnorm=True, residual=True, quantization=True, bit_width=bw)
    head = QURSONetHead(n_ori_outputs=16, n_pos_outputs=3,
                        quantization=True, bit_width=bw)
    module = ModelWrapper(backbone=backbone, head=head)
    dummy = jnp.zeros((1, 32, 64, 3), jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(3)}, dummy, False)
    model = SPEModel(module=module, variables=dict(variables),
                     backbone_name="mobilenet_v2_q", head_name="ursonet_q",
                     bit_width=bw)
    graph = convert_qat_params(model)
    assert int(graph["blocks"][1]["project"]["w_int"].shape[-1]) == 24  # narrow
    assert int(graph["blocks"][1]["expand"]["w_int"].shape[-2]) == 64  # wide in

    images = jnp.asarray(
        np.random.RandomState(33).randint(0, 256, (2, 32, 64, 3), dtype=np.uint8))
    plain_out = build_fused_forward(graph, interpret=True)(images)
    monkeypatch.setenv("SPEF_PACK", "1")
    packed_out = build_fused_forward(graph, interpret=True)(images)
    for a, b, name in ((plain_out[0], packed_out[0], "ori"),
                       (plain_out[1], packed_out[1], "pos")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
    # Both blocks must take the fused path (w and w/2 multiples of 8) —
    # otherwise the XLA fallback makes this test vacuous.
    from spef_tpu.quant.int8_fused import _block_fusable
    assert _block_fusable(graph["blocks"][0], 16, 32)
    assert _block_fusable(graph["blocks"][1], 16, 32)
