"""Post-training activation calibration (PTQ) — QAT-free quantization.

Counterpart of the reference's NVIDIA build calibration
(`/root/reference/build_nvidia.py:30-127,209-217`): a FLOAT checkpoint is
quantized without quantization-aware training by observing activation
distributions over calibration batches and choosing each site's
quantization grid by one of four criteria:

  * ``absmax``     — grid covers the observed maximum magnitude ("max");
  * ``percentile`` — grid covers the p-th percentile of magnitudes (the
                     reference's ``99.99``/``99.999`` sweeps);
  * ``mse``        — amax minimizing the expected quantization MSE under
                     the observed distribution;
  * ``entropy``    — amax minimizing the KL divergence between original
                     and quantized distributions (TensorRT-style).

Flow: FP32 checkpoint -> warm-started QAT model -> ``convert_qat_params``
(integer weights are data-free: per-channel absmax) -> observe activations
at every grid site of the converted graph with a float tap-forward ->
overwrite ``act_step`` / ``shared_step`` / ``pool_step`` -> the calibrated
graph runs on any int8 executor.  ``write_scales_to_params`` maps the
calibrated amax values back onto the QAT model's ``log2_scale`` parameters
so an optional QAT fine-tune starts from the calibrated grids (the
reference's calibrate-then-QAT recipe, `build_nvidia.py:209-276`).

Distributions are accumulated as 2048-bin magnitude histograms with
range-doubling merges (the pytorch-quantization calibrator scheme), so
calibration memory is O(sites), not O(activations).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "HistogramCollector",
    "collect_activation_stats",
    "calibrate_graph",
    "write_scales_to_params",
]


class HistogramCollector:
    """Magnitude histogram with dynamic range growth (power-of-two merges)."""

    def __init__(self, n_bins: int = 2048):
        self.n_bins = n_bins
        self.counts: Optional[np.ndarray] = None
        self.range: float = 0.0
        self.amax_observed: float = 0.0

    def update(self, x: np.ndarray) -> None:
        mags = np.abs(np.asarray(x, np.float32)).ravel()
        amax = float(mags.max()) if mags.size else 0.0
        self.amax_observed = max(self.amax_observed, amax)
        if self.counts is None:
            self.range = max(amax, 1e-12) * 1.25
            self.counts = np.zeros(self.n_bins, np.int64)
        while amax > self.range:
            # Double the range; merge neighbouring bins to keep n_bins.
            merged = self.counts.reshape(-1, 2).sum(axis=1)
            self.counts = np.concatenate([merged, np.zeros(self.n_bins // 2, np.int64)])
            self.range *= 2.0
        hist, _ = np.histogram(mags, bins=self.n_bins, range=(0.0, self.range))
        self.counts += hist

    def update_hist(self, counts: np.ndarray, range_: float, amax: float) -> None:
        """Merge a pre-binned magnitude histogram (device-side collection).

        Incoming values are approximated at their bin centers, so the
        redistribution error is bounded by one incoming bin width —
        irrelevant at 2048 bins for every amax method here.
        """
        counts = np.asarray(counts, np.int64)
        amax = float(amax)
        self.amax_observed = max(self.amax_observed, amax)
        if self.counts is None:
            self.range = max(float(range_), 1e-12)
            self.counts = np.zeros(self.n_bins, np.int64)
        while amax > self.range:
            merged = self.counts.reshape(-1, 2).sum(axis=1)
            self.counts = np.concatenate([merged, np.zeros(self.n_bins // 2, np.int64)])
            self.range *= 2.0
        centers = (np.arange(counts.size) + 0.5) * (float(range_) / counts.size)
        idx = np.minimum((centers / self.range * self.n_bins).astype(np.int64),
                         self.n_bins - 1)
        np.add.at(self.counts, idx, counts)

    # ------------------------------------------------------------------
    def _centers(self) -> np.ndarray:
        w = self.range / self.n_bins
        return (np.arange(self.n_bins) + 0.5) * w

    def amax(self, method: str, qmax: float, percentile: float = 99.99) -> float:
        assert self.counts is not None, "no data collected"
        if method == "absmax":
            return max(self.amax_observed, 1e-12)
        if method == "percentile":
            cdf = np.cumsum(self.counts) / max(self.counts.sum(), 1)
            idx = int(np.searchsorted(cdf, percentile / 100.0))
            idx = min(idx, self.n_bins - 1)
            return max(float((idx + 1) * self.range / self.n_bins), 1e-12)
        if method == "mse":
            return self._amax_mse(qmax)
        if method == "entropy":
            return self._amax_entropy(qmax)
        raise ValueError(f"unknown calibration method {method!r}")

    def _amax_mse(self, qmax: float, n_candidates: int = 100) -> float:
        centers = self._centers()
        p = self.counts.astype(np.float64)
        best_amax, best_err = self.range, math.inf
        hi = max(self.amax_observed, self.range / self.n_bins)
        for frac in np.linspace(0.2, 1.0, n_candidates):
            amax = hi * frac
            step = amax / qmax
            q = np.clip(np.round(centers / step), 0, qmax) * step
            err = float(np.sum(p * (centers - q) ** 2))
            if err < best_err:
                best_err, best_amax = err, amax
        return max(best_amax, 1e-12)

    def _amax_entropy(self, qmax: float, start_frac: float = 0.25) -> float:
        """TensorRT-style KL calibration over candidate clip points."""
        p_full = self.counts.astype(np.float64)
        n_levels = int(qmax) + 1
        nz = np.nonzero(p_full)[0]
        if nz.size == 0:
            return max(self.amax_observed, 1e-12)
        last = int(nz[-1]) + 1
        best_i, best_kl = last, math.inf
        start = max(n_levels, int(last * start_frac))
        for i in range(start, last + 1):
            ref = p_full[:i].copy()
            outliers = p_full[i:].sum()
            ref[-1] += outliers  # clip mass into the last bin
            if ref.sum() == 0:
                continue
            # Quantize bins [0, i) to n_levels, then expand back.
            edges = np.linspace(0, i, n_levels + 1).astype(int)
            q = np.zeros(i)
            for j in range(n_levels):
                lo, hi_ = edges[j], max(edges[j + 1], edges[j] + 1)
                chunk = p_full[lo:hi_]
                nz_mask = chunk > 0
                if nz_mask.any():
                    q[lo:hi_][nz_mask] = chunk[nz_mask].sum() / nz_mask.sum()
            ref_d = ref / ref.sum()
            q_d = q / max(q.sum(), 1e-12)
            mask = ref_d > 0
            kl = float(np.sum(ref_d[mask] * np.log(ref_d[mask] / np.maximum(q_d[mask], 1e-12))))
            if kl < best_kl:
                best_kl, best_i = kl, i
        return max(best_i * self.range / self.n_bins, 1e-12)


# ---------------------------------------------------------------------------
# Tap forward: float execution of the converted graph, returning the
# activation tensors feeding every quantization-grid site.
# ---------------------------------------------------------------------------


def _conv_f32(x, layer, relu):
    w = layer["w_int"].astype(jnp.float32) * layer["mult_core"]
    # mult_core folds s_w * |g|; the conv then runs on real-valued weights.
    k = w.shape[0]
    pad = (k - 1) // 2
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, w, (layer["stride"], layer["stride"]), [(pad, pad), (pad, pad)],
        dimension_numbers=dn, feature_group_count=layer["groups"],
        preferred_element_type=jnp.float32,
    )
    y = y + layer["bias"]
    return jnp.maximum(y, 0.0) if relu else y


def _tap_forward(graph: Dict[str, Any], images: jax.Array) -> Dict[str, jax.Array]:
    """Float forward; returns {site: activation} for every grid site."""
    taps: Dict[str, jax.Array] = {}
    x = images.astype(jnp.float32) / 255.0 if images.dtype == jnp.uint8 else images

    y = _conv_f32(x, graph["stem"], relu=True)
    taps["stem"] = y

    for i, blk in enumerate(graph["blocks"]):
        shared_vals: List[jax.Array] = []
        if "shared_step" in blk and (blk["input_quant"] or blk["use_residual"]):
            shared_vals.append(y)
        residual = y
        h = y
        if "expand" in blk:
            h = _conv_f32(h, blk["expand"], relu=True)
            if "act_step" in blk["expand"]:
                taps[f"block{i}.expand"] = h
        h = _conv_f32(h, blk["depthwise"], relu=True)
        taps[f"block{i}.depthwise"] = h
        h = _conv_f32(h, blk["project"], relu=False)
        if blk["use_residual"]:
            shared_vals.append(h)
            y = h + residual
            shared_vals.append(y)
        else:
            y = h
        if shared_vals:
            # One per-site magnitude pool: the shared quantizer sees the
            # block input, the projection output, and their sum.
            taps[f"block{i}.shared"] = jnp.concatenate(
                [jnp.abs(v).reshape(v.shape[0], -1) for v in shared_vals], axis=1
            )

    taps["final_shared"] = y
    y = _conv_f32(y, graph["head_conv"], relu=True)
    taps["head_conv"] = y
    pooled = jnp.mean(y, axis=(1, 2))
    taps["head.pool"] = pooled
    return taps


def collect_activation_stats(
    graph: Dict[str, Any],
    batches: Iterable[np.ndarray],
    n_bins: int = 2048,
    max_batches: int = 256,
) -> Dict[str, HistogramCollector]:
    """Observe the float net over calibration batches (256 max, the
    reference's calibration budget `build_nvidia.py:209-217`).

    Histograms are computed ON DEVICE against each batch's own range and
    merged host-side (``HistogramCollector.update_hist``): the per-batch
    transfer is (1 amax scalar + n_bins counts) per site instead of the
    full activation tensors — pulling every tap to the host costs GBs per
    batch through the TPU tunnel and stalls calibration for hours.
    """

    def _stats(imgs):
        taps = _tap_forward(graph, imgs)
        out = {}
        for site, v in taps.items():
            mags = jnp.abs(v.astype(jnp.float32)).ravel()
            amax = jnp.max(mags)  # exact, over every value
            rng_ = jnp.maximum(amax, 1e-12) * 1.25
            # Histogram from a strided subsample (<=256k values/site/batch;
            # calibration statistics, not an exact count) via sort +
            # searchsorted: TPU scatter-add serializes on colliding indices,
            # so a bincount over millions of values is pathologically slow,
            # while sort + binary search are native.
            k = max(1, mags.size // 262144)
            sub = jnp.sort(mags[::k])
            edges = jnp.linspace(0.0, rng_, n_bins + 1)
            ss = jnp.searchsorted(sub, edges, side="left")
            out[site] = (amax, (ss[1:] - ss[:-1]).astype(jnp.int32))
        return out

    stats_fn = jax.jit(_stats)
    collectors: Dict[str, HistogramCollector] = {}
    for b, images in enumerate(batches):
        if b >= max_batches:
            break
        stats = jax.device_get(stats_fn(jnp.asarray(images)))
        for site, (amax, counts) in stats.items():
            rng_ = max(float(amax), 1e-12) * 1.25
            collectors.setdefault(site, HistogramCollector(n_bins)).update_hist(
                counts, rng_, float(amax))
    assert collectors, "no calibration batches provided"
    return collectors


def calibrate_graph(
    graph: Dict[str, Any],
    batches: Iterable[np.ndarray],
    method: str = "percentile",
    percentile: float = 99.99,
    n_bins: int = 2048,
    max_batches: int = 256,
) -> Tuple[Dict[str, Any], Dict[str, float]]:
    """Overwrite every activation grid of ``graph`` from observed statistics.

    Returns (calibrated graph — shallow-copied, layer dicts replaced — and
    {site: amax}).  Weight grids are untouched (data-free per-channel absmax,
    already exact).
    """
    stats = collect_activation_stats(graph, batches, n_bins, max_batches)

    amaxes = {}

    def site_amax(site: str, qmax: float) -> float:
        amax = stats[site].amax(method, qmax, percentile)
        amaxes[site] = amax
        return amax

    g = dict(graph)

    def with_grid(layer: Dict[str, Any], site: str) -> Dict[str, Any]:
        # Recipes with float interiors (boundary: int8 block edges only,
        # `quant/convert.py:118-121` emits no act grid there) simply have
        # no activation grid to calibrate at this site.
        if "act_qmax" not in layer:
            return layer
        layer = dict(layer)
        qmax = layer["act_qmax"]
        layer["act_step"] = site_amax(site, qmax) / qmax
        return layer

    g["stem"] = with_grid(graph["stem"], "stem")
    new_blocks = []
    for i, blk in enumerate(graph["blocks"]):
        b = dict(blk)
        if f"block{i}.shared" in stats and "shared_step" in b:
            b["shared_step"] = site_amax(f"block{i}.shared", b["shared_qmax"]) / b["shared_qmax"]
        if "expand" in b:
            b["expand"] = with_grid(b["expand"], f"block{i}.expand")
        b["depthwise"] = with_grid(b["depthwise"], f"block{i}.depthwise")
        new_blocks.append(b)
    g["blocks"] = new_blocks

    fs = dict(graph["final_shared"])
    fs["step"] = site_amax("final_shared", fs["qmax"]) / fs["qmax"]
    g["final_shared"] = fs

    g["head_conv"] = with_grid(graph["head_conv"], "head_conv")

    head = dict(graph["head"])
    head["pool_step"] = site_amax("head.pool", head["pool_qmax"]) / head["pool_qmax"]
    g["head"] = head
    return g, amaxes


def write_scales_to_params(variables: Any, amaxes: Dict[str, float]) -> Any:
    """Map calibrated amax values onto the QAT model's ``log2_scale`` params
    so QAT fine-tuning starts from the calibrated grids."""
    from flax.core import unfreeze

    # Fresh mutable containers (handles FrozenDict and aliased plain dicts).
    variables = jax.tree_util.tree_map(lambda x: x, unfreeze(variables))
    params = variables["params"]

    def set_scale(tree, amax):
        tree["log2_scale"] = jnp.asarray(np.log2(max(amax, 1e-12)), jnp.float32)

    bb = params["backbone"]
    if "stem" in amaxes and "act_quant" in bb.get("stem", {}):
        set_scale(bb["stem"]["act_quant"], amaxes["stem"])
    for i in range(len([k for k in bb if k.startswith("block_")])):
        bp = bb.get(f"block_{i}", {})
        if f"block{i}.shared" in amaxes and "shared_quant" in bp:
            set_scale(bp["shared_quant"], amaxes[f"block{i}.shared"])
        if f"block{i}.expand" in amaxes and "act_quant" in bp.get("expand", {}):
            set_scale(bp["expand"]["act_quant"], amaxes[f"block{i}.expand"])
        if f"block{i}.depthwise" in amaxes and "act_quant" in bp.get("depthwise", {}):
            set_scale(bp["depthwise"]["act_quant"], amaxes[f"block{i}.depthwise"])
    if "final_shared" in amaxes and "final_shared_quant" in bb:
        set_scale(bb["final_shared_quant"], amaxes["final_shared"])
    if "head_conv" in amaxes and "act_quant" in bb.get("head_conv", {}):
        set_scale(bb["head_conv"]["act_quant"], amaxes["head_conv"])
    if "head.pool" in amaxes and "pool_quant" in params.get("head", {}):
        set_scale(params["head"]["pool_quant"], amaxes["head.pool"])
    return variables
