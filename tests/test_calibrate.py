"""Tests for the PTQ activation-calibration path (reference
`build_nvidia.py:30-127` calibration modes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spef_tpu.models.wrapper import import_model
from spef_tpu.quant.bitwidth import default_bit_width
from spef_tpu.quant.calibrate import (
    HistogramCollector,
    calibrate_graph,
    write_scales_to_params,
)
from spef_tpu.quant.convert import convert_qat_params
from spef_tpu.quant.int8_model import build_int8_forward, build_weight_only_forward
from spef_tpu.quant.parity import compare_tensors


@pytest.fixture(scope="module")
def qat8_model():
    bw = default_bit_width(n_blocks=2, w=8, a=8, shared=8)
    bw["inverted_residual"][0] = [(8, 8), (8, 8), (8,)]
    return import_model(
        backbone_name="small_mobile_q", head_name="ursonet_q", img_size=(48, 64),
        bit_width=bw, ori_mode="classification", n_ori_bins=64, pos_mode="regression",
        seed=3,
    )


def _batches(n, seed=0, shape=(4, 48, 64, 3)):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, shape, np.uint8) for _ in range(n)]


class TestHistogramCollector:
    def test_absmax_and_growth(self):
        c = HistogramCollector(n_bins=64)
        c.update(np.linspace(0, 1.0, 1000))
        r1 = c.range
        c.update(np.array([5.0]))  # forces range doubling
        assert c.range > r1 and c.range >= 5.0
        assert c.amax("absmax", qmax=127.0) == pytest.approx(5.0)
        assert int(c.counts.sum()) == 1001

    def test_percentile_below_max(self):
        c = HistogramCollector()
        x = np.concatenate([np.random.RandomState(0).rand(100000), [100.0]])
        c.update(x)
        p = c.amax("percentile", qmax=127.0, percentile=99.9)
        assert p < 5.0  # single outlier at 100 ignored
        assert c.amax("absmax", qmax=127.0) == pytest.approx(100.0)

    def test_update_hist_matches_update(self):
        """Device-side pre-binned collection tracks the host path within a
        bin width for every amax method."""
        x = np.abs(np.random.RandomState(2).randn(50000)).astype(np.float32)
        host = HistogramCollector()
        host.update(x)
        dev = HistogramCollector()
        amax = float(x.max())
        rng_ = amax * 1.25
        counts, _ = np.histogram(x, bins=dev.n_bins, range=(0.0, rng_))
        dev.update_hist(counts, rng_, amax)
        assert dev.amax("absmax", 127.0) == pytest.approx(host.amax("absmax", 127.0))
        for method in ("percentile", "mse"):
            a, b = host.amax(method, 127.0), dev.amax(method, 127.0)
            assert b == pytest.approx(a, rel=0.02), (method, a, b)

    def test_mse_and_entropy_reasonable(self):
        c = HistogramCollector()
        c.update(np.abs(np.random.RandomState(1).randn(200000)))
        for method in ("mse", "entropy"):
            amax = c.amax(method, qmax=127.0)
            assert 0.5 < amax <= c.amax_observed * 1.01, (method, amax)


class TestCalibrateGraph:
    def test_grids_cover_distribution_and_execute(self, qat8_model):
        graph = convert_qat_params(qat8_model)
        cal, amaxes = calibrate_graph(graph, _batches(4), method="absmax")
        assert len(amaxes) >= 8
        for site, amax in amaxes.items():
            assert np.isfinite(amax) and amax > 0, site
        # Calibrated steps differ from the (untrained) QAT init grids.
        assert cal["stem"]["act_step"] != graph["stem"]["act_step"]

        # The calibrated graph is a valid int8 program whose outputs track
        # the float (weight-only) network.
        int8_fwd = jax.jit(build_int8_forward(cal))
        wo_fwd = jax.jit(build_weight_only_forward(cal))
        imgs = jnp.asarray(_batches(1, seed=9)[0])
        o_int8, p_int8 = int8_fwd(imgs)
        o_wo, p_wo = wo_fwd(imgs)
        assert np.isfinite(np.asarray(o_int8)).all()
        m = compare_tensors(o_wo, o_int8)
        assert m["cosine"] > 0.98, m

    def test_methods_all_run(self, qat8_model):
        graph = convert_qat_params(qat8_model)
        batches = _batches(2)
        steps = {}
        for method in ("absmax", "percentile", "mse", "entropy"):
            cal, _ = calibrate_graph(graph, batches, method=method)
            steps[method] = cal["stem"]["act_step"]
            assert np.isfinite(steps[method]) and steps[method] > 0
        # Clipping methods choose grids no wider than absmax.
        assert steps["percentile"] <= steps["absmax"] * 1.01
        assert steps["mse"] <= steps["absmax"] * 1.01

    def test_write_back_round_trip(self, qat8_model):
        graph = convert_qat_params(qat8_model)
        _, amaxes = calibrate_graph(graph, _batches(2), method="percentile")
        new_vars = write_scales_to_params(qat8_model.variables, amaxes)
        qat8_model.variables = new_vars
        graph2 = convert_qat_params(qat8_model)
        # Re-converted grids reproduce the calibrated amaxes.
        np.testing.assert_allclose(
            graph2["stem"]["act_step"] * graph2["stem"]["act_qmax"],
            amaxes["stem"], rtol=1e-5,
        )
        np.testing.assert_allclose(
            graph2["final_shared"]["step"] * graph2["final_shared"]["qmax"],
            amaxes["final_shared"], rtol=1e-5,
        )


class TestBoundaryRecipeCalibration:
    """Regression: boundary-recipe graphs have float interiors (no act grid
    on expand/depthwise, `quant/convert.py:118-121`); calibrate_graph must
    skip those sites instead of KeyError'ing ('act_qmax') as it did when the
    R3C chip queue ran the boundary calibrate-then-QAT ladder."""

    def test_calibrates_boundary_graph(self):
        from spef_tpu.quant.bitwidth import boundary_bit_width

        bw = boundary_bit_width(n_blocks=2)
        model = import_model(
            backbone_name="small_mobile_q", head_name="ursonet_q",
            img_size=(48, 64), bit_width=bw, ori_mode="classification",
            n_ori_bins=64, pos_mode="regression", seed=3,
        )
        graph = convert_qat_params(model, bw)
        cal, amaxes = calibrate_graph(graph, _batches(2), method="percentile")
        # Boundary sites calibrated, interior conv sites untouched (no grid).
        assert "final_shared" in amaxes
        for blk, cblk in zip(graph["blocks"], cal["blocks"]):
            if "act_qmax" not in blk["depthwise"]:
                assert "act_step" not in cblk["depthwise"]
        for site, amax in amaxes.items():
            assert np.isfinite(amax) and amax > 0, site
