"""Executor parity across the bit-width families the sensitivity sweep uses.

The mixed-precision study (`experiments/bitwidth_sweep.py`, mirroring the
reference's `generate_experiment.py:5-117`) exercises bit-width combinations
the fixed-width tests never touch: 1/2-bit depthwise weights, 3-bit expand
activations, low-bit projections, narrow shared residual grids.  A latent
executor divergence at one of those combos would silently poison the sweep's
science, so every family is pinned here: for each bit-width dict, the
readable int8 executor and the conv-form carry executor must agree
bit-exactly, and both must track the QAT fake-quant network."""

import jax
import numpy as np
import pytest

import jax.numpy as jnp

from spef_tpu.models.wrapper import import_model
from spef_tpu.quant.bitwidth import default_bit_width
from spef_tpu.quant.convert import convert_qat_params
from spef_tpu.quant.int8_carry import build_int8_carry_forward
from spef_tpu.quant.int8_model import build_int8_forward
from spef_tpu.quant.parity import predict_and_compare


def _w8a8(n_blocks=2):
    return default_bit_width(n_blocks=n_blocks, w=8, a=8, shared=8)


def _family(name):
    """Tiny-model (2-block) analogues of experiments/bitwidth_sweep.build_cases."""
    bw = _w8a8()
    if name == "dw_w1":
        bw["inverted_residual"] = [[(8, 8), (1, 8), (8,)] for _ in range(2)]
    elif name == "dw_w2":
        bw["inverted_residual"] = [[(8, 8), (2, 8), (8,)] for _ in range(2)]
    elif name == "expand_a3":
        bw["inverted_residual"] = [[(8, 3), (8, 8), (8,)] for _ in range(2)]
    elif name == "proj_w2":
        bw["inverted_residual"] = [[(8, 8), (8, 8), (2,)] for _ in range(2)]
    elif name == "shared_a3":
        bw["shared_act"] = 3
    elif name == "one_block_mixed":
        # Positional ablation shape: first block degraded, second clean.
        bw["inverted_residual"] = [[(8, 3), (1, 8), (2,)], [(8, 8), (8, 8), (8,)]]
    return bw


FAMILIES = ["uniform_w8a8", "dw_w1", "dw_w2", "expand_a3", "proj_w2",
            "shared_a3", "one_block_mixed"]


def _images(seed=11):
    return jnp.asarray(
        np.random.RandomState(seed).randint(0, 256, size=(4, 48, 64, 3), dtype=np.uint8)
    )


@pytest.mark.parametrize("family", FAMILIES)
def test_executors_agree_across_sweep_families(family):
    bw = _family(family)
    model = import_model(
        backbone_name="small_mobile_q", head_name="ursonet_q", img_size=(48, 64),
        bit_width=bw, ori_mode="classification", n_ori_bins=64, pos_mode="regression",
        seed=7,
    )
    graph = convert_qat_params(model, bw)
    f_ref = jax.jit(build_int8_forward(graph))
    f_carry = jax.jit(build_int8_carry_forward(graph))
    images = _images()

    o1, p1 = f_ref(images)
    o2, p2 = f_carry(images)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5,
                               err_msg=f"carry != int8_model for {family}")
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5,
                               err_msg=f"carry != int8_model for {family}")

    def qat_fwd(images_f):
        return model.apply(images_f, False)

    report = predict_and_compare(qat_fwd, f_ref, images)
    assert report["ori_raw"]["cosine"] > 0.999, (family, report)
    assert report["pos_raw"]["cosine"] > 0.999, (family, report)


def _fused_family(name):
    """Like _family but defaulting to an a4 base; 'w8a8' exercises the wide
    unsigned interior grids (qmax 255) the kernel executors carry as uint8
    bits since r5 (previously refused and routed to carry/int8_model)."""
    bw = default_bit_width(n_blocks=2, w=8, a=4, shared=4)
    bw["inverted_residual"] = [[(8, 4), (8, 4), (8,)] for _ in range(2)]
    if name == "dw_w1":
        bw["inverted_residual"] = [[(8, 4), (1, 4), (8,)] for _ in range(2)]
    elif name == "expand_a3":
        bw["inverted_residual"] = [[(8, 3), (8, 4), (8,)] for _ in range(2)]
    elif name == "one_block_mixed":
        bw["inverted_residual"] = [[(8, 3), (1, 4), (2,)], [(8, 4), (8, 4), (8,)]]
    elif name == "w8a8":
        bw = default_bit_width(n_blocks=2, w=8, a=8, shared=8)
        bw["inverted_residual"] = [[(8, 8), (8, 8), (8,)] for _ in range(2)]
    return bw


@pytest.mark.parametrize("family", ["dw_w1", "expand_a3", "one_block_mixed", "w8a8"])
def test_fused_executor_agrees_on_special_families(family):
    """The fused-block Pallas pipeline (interpret mode) must match the
    readable int8 executor on the sweep's special low-bit families too —
    this is the executor the deployment benchmarks run."""
    from spef_tpu.quant.int8_fused import build_fused_forward

    bw = _fused_family(family)
    model = import_model(
        backbone_name="small_mobile_q", head_name="ursonet_q", img_size=(48, 64),
        bit_width=bw, ori_mode="classification", n_ori_bins=64, pos_mode="regression",
        seed=7,
    )
    graph = convert_qat_params(model, bw)
    f_ref = jax.jit(build_int8_forward(graph))
    f_fused = build_fused_forward(graph, interpret=True)
    images = _images()

    o1, p1 = f_ref(images)
    o2, p2 = f_fused(images)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5,
                               err_msg=f"fused != int8_model for {family}")
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5,
                               err_msg=f"fused != int8_model for {family}")
