"""Tests for the fused-kernel autotuner plumbing (quant/autotune.py).

The measurement sweep itself is chip-only (build_int8 --autotune); here we
test the persistence/lookup contract the kernels rely on at build time.
"""

import json

import numpy as np

import spef_tpu.quant.autotune as at


def test_signature_and_roundtrip(tmp_path, monkeypatch):
    path = str(tmp_path / "fused_tuning.json")
    monkeypatch.setattr(at, "_TUNING_PATH", path)
    monkeypatch.setattr(at, "_cache", None)

    sig = at.block_signature("mbconv", 64, 64, 24, 144, 24, 1)
    assert sig == "mbconv:h64w64ci24ch144co24s1"
    assert at.lookup_tile(sig) == (0, 0)  # empty table

    table = {sig: {"tile_oh": 16, "tile_b": 4, "ms": 0.5,
                   "candidates": {"t16b4": 0.5, "t32b1": 0.7},
                   "default_ms": 0.7, "speedup": 1.4}}
    at.save_tuning(table, path)
    assert at.lookup_tile(sig) == (16, 4)
    # reload from disk (fresh cache)
    monkeypatch.setattr(at, "_cache", None)
    assert at.lookup_tile(sig) == (16, 4)
    assert json.load(open(path))[sig]["speedup"] == 1.4
    # legacy entries without tile_b fall back to auto batch-tiling
    at.save_tuning({sig: {"tile_oh": 8}}, path)
    assert at.lookup_tile(sig) == (8, 0)


def test_candidates_divide_output_rows():
    for ho in (8, 16, 32, 64, 128, 12):
        for t in at._candidates(ho):
            assert ho % t == 0 and t <= ho


def test_kernel_uses_tuned_tile(tmp_path, monkeypatch):
    """fused_mbconv picks the persisted winner when tile_oh is not given
    (verified via the resulting grid: n_tiles = Ho / tile)."""
    import jax.numpy as jnp

    from spef_tpu.ops.pallas.fused_block import fused_mbconv, pad_act, unpad_act

    path = str(tmp_path / "t.json")
    monkeypatch.setattr(at, "_TUNING_PATH", path)
    monkeypatch.setattr(at, "_cache", None)
    sig = at.block_signature("mbconv", 16, 16, 8, 16, 8, 1)
    at.save_tuning({sig: {"tile_oh": 8, "ms": 1.0, "candidates": {}, "default_ms": 1.0,
                          "speedup": 1.0}}, path)

    rng = np.random.RandomState(0)
    blk = {
        "use_residual": False,
        "input_quant": True,
        "expand_ratio": 2,
        "expand": {"w_int": jnp.asarray(rng.randint(-8, 8, (1, 1, 8, 16), np.int8)),
                   "mult_core": jnp.ones(16, jnp.float32) * 0.01,
                   "bias": jnp.zeros(16, jnp.float32), "stride": 1, "groups": 1,
                   "act_step": 0.05, "act_qmax": 255.0},
        "depthwise": {"w_int": jnp.asarray(rng.randint(-8, 8, (3, 3, 1, 16), np.int8)),
                      "mult_core": jnp.ones(16, jnp.float32) * 0.01,
                      "bias": jnp.zeros(16, jnp.float32), "stride": 1, "groups": 16,
                      "act_step": 0.05, "act_qmax": 255.0},
        "project": {"w_int": jnp.asarray(rng.randint(-8, 8, (1, 1, 16, 8), np.int8)),
                    "mult_core": jnp.ones(8, jnp.float32) * 0.01,
                    "bias": jnp.zeros(8, jnp.float32), "stride": 1, "groups": 1},
    }
    x = jnp.asarray(rng.randint(-16, 16, (1, 16, 16, 8)).astype(np.int8))
    out = fused_mbconv(pad_act(x), blk, in_step=0.05,
                       out_grid={"step": 0.05, "qmax": 127.0, "qmin": -128.0},
                       logical_hw=(16, 16), interpret=True)
    out = unpad_act(out, 16, 8)
    assert out.shape == (1, 16, 16, 8)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_hybrid_backend_plan_and_parity(tmp_path, monkeypatch):
    """When the tuning table says XLA beat the fused kernel for a block,
    build_fused_forward routes that block through the conv-form carry ops
    — and the hybrid output is identical to the all-Pallas pipeline."""
    import jax.numpy as jnp

    import spef_tpu.quant.int8_fused as fused
    from spef_tpu.models.wrapper import import_model
    from spef_tpu.quant.bitwidth import default_bit_width
    from spef_tpu.quant.convert import convert_qat_params

    bw = default_bit_width(n_blocks=2, w=8, a=4, shared=4)
    bw["inverted_residual"] = [[(8, 4), (8, 4), (8,)] for _ in range(2)]
    model = import_model(
        backbone_name="small_mobile_q", head_name="ursonet_q", img_size=(48, 64),
        bit_width=bw, ori_mode="classification", n_ori_bins=64,
        pos_mode="regression", seed=7,
    )
    graph = convert_qat_params(model, bw)
    images = jnp.asarray(
        np.random.RandomState(11).randint(0, 256, (2, 48, 64, 3), dtype=np.uint8))

    monkeypatch.setattr(at, "_TUNING_PATH", str(tmp_path / "t.json"))
    monkeypatch.setattr(at, "_cache", None)

    monkeypatch.setenv("SPEF_ALL_FUSED", "1")
    ref = fused.build_fused_forward(graph, interpret=True)(images)
    monkeypatch.delenv("SPEF_ALL_FUSED")

    # Mark block 0 xla-preferred (stem + block 1 stay fused: no entries).
    blk = graph["blocks"][0]
    d = blk["depthwise"]
    cin = int(blk["expand"]["w_int"].shape[-2] if "expand" in blk
              else d["w_int"].shape[-1])
    sig = at.block_signature("mbconv", 24, 32, cin, int(d["w_int"].shape[-1]),
                             int(blk["project"]["w_int"].shape[-1]),
                             int(d["stride"]))
    at.save_tuning({sig: {"tile_oh": 8, "ms": 9.9, "xla_ms": 0.1,
                          "backend": "xla"}})

    plan = fused.plan_backends(graph, (48, 64))
    assert plan["stem"] == "fused"
    assert plan["blocks"][0] == "xla" and plan["blocks"][1] == "fused"

    calls = []
    orig = fused._xla_block
    monkeypatch.setattr(
        fused, "_xla_block",
        lambda *a, **k: calls.append(1) or orig(*a, **k))
    out = fused.build_fused_forward(graph, interpret=True)(images)
    assert calls, "xla-preferred block did not route through _xla_block"
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(out[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(out[1]), atol=1e-5)


def test_plan_backends_charges_transitions(monkeypatch, tmp_path):
    """The planner is a 2-state DP with a per-switch penalty: a node whose
    measured advantage is SMALLER than the boundary cost must not flip the
    plan (round-3 postmortem: an interleaved 7/10 plan ran 3x slower than
    either pure path), while a large advantage still earns its crossings."""
    import spef_tpu.quant.autotune as at
    import spef_tpu.quant.int8_fused as fused
    from spef_tpu.models.wrapper import import_model
    from spef_tpu.quant.bitwidth import default_bit_width
    from spef_tpu.quant.convert import convert_qat_params

    bw = default_bit_width(n_blocks=3, w=8, a=8, shared=8)
    model = import_model(
        backbone_name="small_mobile_q", head_name="ursonet_q", img_size=(48, 64),
        bit_width=bw, ori_mode="classification", n_ori_bins=64,
        pos_mode="regression", seed=7,
    )
    graph = convert_qat_params(model, bw)

    monkeypatch.setattr(at, "_TUNING_PATH", str(tmp_path / "t.json"))
    monkeypatch.setattr(at, "_cache", None)

    def sig_of(i, h, w):
        blk = graph["blocks"][i]
        d = blk["depthwise"]
        cin = int(blk["expand"]["w_int"].shape[-2] if "expand" in blk
                  else d["w_int"].shape[-1])
        return at.block_signature(
            "mbconv", h, w, cin, int(d["w_int"].shape[-1]),
            int(blk["project"]["w_int"].shape[-1]), int(d["stride"]))

    # Shapes walked by plan_backends for img (48, 64): stem halves to 24x32.
    hw = [(24, 32)]
    for blk in graph["blocks"][:-1]:
        s = int(blk["depthwise"]["stride"])
        hw.append((hw[-1][0] // s, hw[-1][1] // s))

    # All nodes measured fused-favorable except block 1, whose xla edge
    # (0.05 ms) is below the two switch crossings it would need.
    table = {sig_of(i, *hw[i]): {"tile_oh": 8, "ms": 1.0, "xla_ms": 2.0}
             for i in range(len(graph["blocks"]))}
    marginal = sig_of(1, *hw[1])
    table[marginal] = {"tile_oh": 8, "ms": 1.0, "xla_ms": 0.95}
    at.save_tuning(table)
    plan = fused.plan_backends(graph, (48, 64))
    assert plan["blocks"][1] == "fused", plan  # 0.05 ms < 2 * 0.15 ms

    # A decisive advantage still switches.
    table[marginal] = {"tile_oh": 8, "ms": 1.0, "xla_ms": 0.2}
    at.save_tuning(table)
    plan = fused.plan_backends(graph, (48, 64))
    assert plan["blocks"][1] == "xla", plan


def test_graph_level_plan_override(monkeypatch, tmp_path):
    """A persisted graph-level plan (tune_fused arbitration winner) beats
    the per-node DP: composed end-to-end measurement is the final arbiter
    because isolated node times cannot see cross-node XLA fusion."""
    import spef_tpu.quant.autotune as at
    import spef_tpu.quant.int8_fused as fused
    from spef_tpu.models.wrapper import import_model
    from spef_tpu.quant.bitwidth import default_bit_width
    from spef_tpu.quant.convert import convert_qat_params

    bw = default_bit_width(n_blocks=2, w=8, a=4, shared=8)
    bw["inverted_residual"] = [[(8, 4), (8, 4), (8,)] for _ in range(2)]
    model = import_model(
        backbone_name="small_mobile_q", head_name="ursonet_q", img_size=(48, 64),
        bit_width=bw, ori_mode="classification", n_ori_bins=64,
        pos_mode="regression", seed=7,
    )
    graph = convert_qat_params(model, bw)

    monkeypatch.setattr(at, "_TUNING_PATH", str(tmp_path / "t.json"))
    monkeypatch.setattr(at, "_cache", None)

    # No table: DP defaults everything to fused.
    assert fused.plan_backends(graph, (48, 64))["blocks"] == ["fused", "fused"]

    stored = {"stem": "xla", "blocks": ["xla", "fused"],
              "source": "graph-arb", "winner": "hybrid"}
    at.save_tuning({fused.plan_key(graph, (48, 64)): stored})
    plan = fused.plan_backends(graph, (48, 64))
    assert plan == {"stem": "xla", "blocks": ["xla", "fused"]}

    # An explicit plan= forces routing regardless of the table.
    import jax.numpy as jnp
    import numpy as np
    images = jnp.asarray(
        np.random.RandomState(1).randint(0, 256, (2, 48, 64, 3), dtype=np.uint8))
    calls = []
    orig = fused._xla_block
    monkeypatch.setattr(fused, "_xla_block",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    all_xla = {"stem": "xla", "blocks": ["xla", "xla"]}
    out = fused.build_fused_forward(graph, interpret=True, plan=all_xla)(images)
    assert len(calls) == 2
    monkeypatch.setattr(fused, "_xla_block", orig)
    ref = fused.build_fused_forward(
        graph, interpret=True,
        plan={"stem": "fused", "blocks": ["fused", "fused"]})(images)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(out[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(out[1]), atol=1e-5)


def test_penalty_sweep_yields_contiguous_runs(monkeypatch, tmp_path):
    """tune_fused's arbitration sweeps the DP transition penalty to generate
    contiguous-run candidates: with alternating per-node winners, raising
    transition_ms must monotonically reduce backend switches, reaching a
    pure single-backend plan at the extreme."""
    import spef_tpu.quant.autotune as at
    import spef_tpu.quant.int8_fused as fused
    from spef_tpu.models.wrapper import import_model
    from spef_tpu.quant.bitwidth import default_bit_width
    from spef_tpu.quant.convert import convert_qat_params

    bw = default_bit_width(n_blocks=4, w=8, a=8, shared=8)
    model = import_model(
        backbone_name="small_mobile_q", head_name="ursonet_q", img_size=(48, 64),
        bit_width=bw, ori_mode="classification", n_ori_bins=64,
        pos_mode="regression", seed=7,
    )
    graph = convert_qat_params(model, bw)

    monkeypatch.setattr(at, "_TUNING_PATH", str(tmp_path / "t.json"))
    monkeypatch.setattr(at, "_cache", None)

    def sig_of(i, h, w):
        blk = graph["blocks"][i]
        d = blk["depthwise"]
        cin = int(blk["expand"]["w_int"].shape[-2] if "expand" in blk
                  else d["w_int"].shape[-1])
        return at.block_signature(
            "mbconv", h, w, cin, int(d["w_int"].shape[-1]),
            int(blk["project"]["w_int"].shape[-1]), int(d["stride"]))

    hw = [(24, 32)]
    for blk in graph["blocks"][:-1]:
        s = int(blk["depthwise"]["stride"])
        hw.append((hw[-1][0] // s, hw[-1][1] // s))

    # Alternating winners with a modest (0.2 ms) edge each way.
    table = {}
    for i in range(len(graph["blocks"])):
        f, x = (1.0, 1.2) if i % 2 == 0 else (1.2, 1.0)
        table[sig_of(i, *hw[i])] = {"tile_oh": 8, "ms": f, "xla_ms": x}
    at.save_tuning(table)

    def n_switches(plan):
        chain = [plan["stem"]] + plan["blocks"]
        return sum(a != b for a, b in zip(chain, chain[1:]))

    sw = [n_switches(fused.plan_backends(graph, (48, 64), transition_ms=t))
          for t in (0.05, 0.15, 1.0)]
    assert sw[0] >= sw[1] >= sw[2], sw
    assert sw[0] > 0, "low penalty should follow the alternating winners"
    assert sw[2] == 0, "extreme penalty must degenerate to a pure plan"


def test_plan_backends_measured_boundary_costs(monkeypatch, tmp_path):
    """Measured ``trans:<sig>-><sig>`` entries (probe_transition.py) override
    the scalar switch penalty per boundary: cheap measured boundaries let a
    marginal advantage flip; expensive ones pin even a decisive advantage."""
    import spef_tpu.quant.autotune as at
    import spef_tpu.quant.int8_fused as fused
    from spef_tpu.models.wrapper import import_model
    from spef_tpu.quant.bitwidth import default_bit_width
    from spef_tpu.quant.convert import convert_qat_params

    bw = default_bit_width(n_blocks=2, w=8, a=8, shared=8)
    model = import_model(
        backbone_name="small_mobile_q", head_name="ursonet_q", img_size=(48, 64),
        bit_width=bw, ori_mode="classification", n_ori_bins=64,
        pos_mode="regression", seed=7,
    )
    graph = convert_qat_params(model, bw)

    monkeypatch.setattr(at, "_TUNING_PATH", str(tmp_path / "t.json"))
    monkeypatch.setattr(at, "_cache", None)

    sigs = fused.node_signatures(graph, (48, 64))  # [stem, b0, b1]
    table = {s: {"tile_oh": 8, "ms": 1.0, "xla_ms": 2.0} for s in sigs[1:]}
    marginal = sigs[2]  # last block: flipping it costs ONE boundary crossing
    table[marginal] = {"tile_oh": 8, "ms": 1.0, "xla_ms": 0.95}
    boundary = f"trans:{sigs[1]}->{sigs[2]}"

    # Scalar default (0.15/switch): 0.05 ms advantage loses (see
    # test_plan_backends_charges_transitions).  A measured near-free
    # boundary flips it.
    table[boundary] = {"transition_ms": 0.01}
    at.save_tuning(table)
    plan = fused.plan_backends(graph, (48, 64))
    assert plan["blocks"][1] == "xla", plan

    # A measured EXPENSIVE boundary pins a decisive advantage to fused.
    table[marginal] = {"tile_oh": 8, "ms": 1.0, "xla_ms": 0.2}
    table[boundary] = {"transition_ms": 5.0}
    at.save_tuning(table)
    plan = fused.plan_backends(graph, (48, 64))
    assert plan["blocks"][1] == "fused", plan

    # Negative measured values (timing noise) clamp to zero, never pay you
    # to switch.
    table[boundary] = {"transition_ms": -3.0}
    at.save_tuning(table)
    plan = fused.plan_backends(graph, (48, 64))
    assert plan["blocks"][1] == "xla", plan
