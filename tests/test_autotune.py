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
