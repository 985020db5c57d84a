"""URSONet-style soft-classification codecs — batched matmul formulations.

TPU-native counterpart of
`/root/reference/src/spe/classification_utils.py` (OrientationSoftClassification,
PositionSoftClassification).  Same math, different execution strategy:

  * Encode: the Gaussian kernel over the bin histogram is a single
    ``(B, 4) x (4, n_bins)`` (ori) or ``(B, 3)-vs-(n_bins, 3)`` (pos)
    batched computation — no per-sample loop.
  * Ori decode: the reference accumulates ``A = sum_i p_i q_i q_i^T`` then
    calls ``np.linalg.eig`` *per sample in a Python loop*
    (`classification_utils.py:149-166`).  Here ``A`` is computed for the
    whole batch as ``(p * H^T) @ H`` (two small matmuls on the MXU) and the
    dominant eigenvector comes from ``jnp.linalg.eigh`` — ``A`` is symmetric
    PSD, so ``eigh`` is both correct and much faster, and it vmaps/bathces
    natively on device.
  * Pos decode: probability-weighted mean of bin centers = one matmul.

Histogram construction happens once at init on host (numpy-free: pure JAX
ops evaluated eagerly) — identical bin layout, redundant-bin flags and
deletion behavior as the reference (`classification_utils.py:39-83`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spef_tpu.pose.rotations import euler2quat, normalize_quaternion

__all__ = ["OrientationSoftClassification", "PositionSoftClassification"]


def _grid3(n: int, min_lim: np.ndarray, max_lim: np.ndarray) -> np.ndarray:
    """(n^3, 3) grid over [min_lim, max_lim], 'ij' meshgrid order — matches
    the reference bin ordering (`classification_utils.py:56-59`)."""
    lin = np.linspace(0.0, 1.0, n)
    grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), axis=-1).reshape(-1, 3)
    return grid * (max_lim - min_lim) + min_lim


@dataclasses.dataclass(frozen=True)
class OrientationSoftClassification:
    """Probabilistic attitude codec over an n^3 Euler-bin quaternion histogram.

    Attributes:
        histogram: (n_bins, 4) unit quaternions of the kept bins.
        redundant_flags: (n^3,) bool — which raw bins are boundary/gimbal
            duplicates (only meaningful when ``delete_unused_bins=False``
            they are masked at encode time; when True they're removed).
    """

    n_bins_per_dim: int
    smooth_factor: float
    delete_unused_bins: bool
    histogram: jax.Array  # (n_bins, 4) float32
    redundant_flags: jax.Array  # (n_raw_bins,) bool

    @classmethod
    def create(
        cls,
        n_bins_per_dim: int = 12,
        smooth_factor: float = 3,
        delete_unused_bins: bool = True,
    ) -> "OrientationSoftClassification":
        min_lim = np.array([-180.0, -90.0, -180.0])
        max_lim = np.array([180.0, 90.0, 180.0])
        euler_bins = _grid3(n_bins_per_dim, min_lim, max_lim)
        quats = np.asarray(euler2quat(jnp.asarray(euler_bins)))

        # Redundant-bin bookkeeping (`classification_utils.py:68-75`):
        # circular duplicates at yaw=+180 / roll=+180 and gimbal-lock rows at
        # |pitch|=90 (except yaw=-180 & pitch=-90 which are kept).
        boundary = np.logical_or(euler_bins[:, 0] == max_lim[0], euler_bins[:, 2] == max_lim[2])
        gimbal = np.logical_and(np.abs(euler_bins[:, 1]) == max_lim[1], euler_bins[:, 0] != min_lim[0])
        redundant = np.logical_or(boundary, gimbal)

        if delete_unused_bins:
            quats = quats[~redundant]

        return cls(
            n_bins_per_dim=n_bins_per_dim,
            smooth_factor=float(smooth_factor),
            delete_unused_bins=delete_unused_bins,
            histogram=jnp.asarray(quats, dtype=jnp.float32),
            redundant_flags=jnp.asarray(redundant),
        )

    @property
    def n_bins(self) -> int:
        return self.histogram.shape[0]

    def encode(self, ori: jax.Array) -> jax.Array:
        """Encode true orientations to soft-class targets.

        Gaussian kernel of eq.3 in Proenca's URSONet
        (`classification_utils.py:85-111`), batched: ``(..., 4) -> (..., n_bins)``.
        """
        variance = (self.smooth_factor / self.n_bins_per_dim) ** 2 / 12.0
        # |<q, h_i>| for all bins: one matmul on the MXU.
        dots = jnp.abs(ori @ self.histogram.T)  # (..., n_bins)
        ang = 2.0 * jnp.arccos(jnp.minimum(1.0, dots)) / jnp.pi
        kernel = jnp.exp(-(ang**2) / (2.0 * variance))
        if not self.delete_unused_bins:
            kernel = jnp.where(self.redundant_flags, 0.0, kernel)
        return (kernel / jnp.sum(kernel, axis=-1, keepdims=True)).astype(jnp.float32)

    def decode(self, probs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Decode soft-class PDFs to average quaternions + uncertainty.

        Replaces the reference's per-sample ``np.linalg.eig`` loop
        (`classification_utils.py:113-166`) with a batched symmetric
        eigendecomposition:

            A = H^T diag(p) H   (4x4, symmetric PSD)
            q = eigenvector of A with the largest eigenvalue
            H_inv = A^{-1}      (max-likelihood uncertainty)

        Accepts ``(n_bins,)`` or ``(B, n_bins)``; returns ``(q, h_inv)`` with
        matching batch shape.
        """
        squeeze = probs.ndim == 1
        p = jnp.atleast_2d(probs)
        h = self.histogram  # (n, 4)
        # A[b] = sum_i p[b,i] h[i] h[i]^T  ==  (p[b] * H^T) @ H
        a = jnp.einsum("bn,ni,nj->bij", p, h, h)
        w, v = jnp.linalg.eigh(a)  # ascending eigenvalues
        q_avg = v[..., :, -1]
        q_avg = normalize_quaternion(q_avg).astype(jnp.float32)
        h_inv = jnp.linalg.inv(a).astype(jnp.float32)
        if squeeze:
            return q_avg[0], h_inv[0]
        return q_avg, h_inv

    def decode_batch(self, probs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Alias of :meth:`decode` (the reference separates the two because
        its single-sample path cannot batch; ours always can)."""
        return self.decode(probs)


@dataclasses.dataclass(frozen=True)
class PositionSoftClassification:
    """Soft-classification codec over an n^3 xyz position grid.

    Reference: `classification_utils.py:179-285`.  Default limits carry a
    5 m margin, set by ``SPEUtils`` (`src/spe/spe_utils.py:49-53`):
    min=[-16,-12,-2], max=[16,12,40].
    """

    n_bins_per_dim: int
    smooth_factor: float
    histogram: jax.Array  # (n_bins, 3)
    min_lim: Tuple[float, float, float]
    max_lim: Tuple[float, float, float]

    @classmethod
    def create(
        cls,
        n_bins_per_dim: int = 10,
        smooth_factor: float = 100,
        min_lim=(-16.0, -12.0, -2.0),
        max_lim=(16.0, 12.0, 40.0),
    ) -> "PositionSoftClassification":
        bins = _grid3(n_bins_per_dim, np.asarray(min_lim, float), np.asarray(max_lim, float))
        return cls(
            n_bins_per_dim=n_bins_per_dim,
            smooth_factor=float(smooth_factor),
            histogram=jnp.asarray(bins, dtype=jnp.float32),
            min_lim=tuple(min_lim),
            max_lim=tuple(max_lim),
        )

    @property
    def n_bins(self) -> int:
        return self.histogram.shape[0]

    def encode(self, pos: jax.Array) -> jax.Array:
        """Gaussian kernel over squared distances to bin centers, batched.

        ``(..., 3) -> (..., n_bins)``.  Matches `classification_utils.py:218-240`.
        """
        variance = (self.smooth_factor / self.n_bins_per_dim) ** 2 / 12.0
        diff = pos[..., None, :] - self.histogram  # (..., n_bins, 3)
        kernel = jnp.exp(-jnp.sum(diff**2, axis=-1) / (2.0 * variance))
        return (kernel / jnp.sum(kernel, axis=-1, keepdims=True)).astype(jnp.float32)

    def decode(self, probs: jax.Array) -> jax.Array:
        """Probability-weighted mean of bin centers — one matmul.

        Matches `classification_utils.py:242-267` (incl. re-normalization by
        the PDF sum).  ``(..., n_bins) -> (..., 3)``.
        """
        weighted = probs @ self.histogram  # (..., 3)
        total = jnp.sum(probs, axis=-1, keepdims=True)
        return (weighted / total).astype(jnp.float32)

    def decode_batch(self, probs: jax.Array) -> jax.Array:
        return self.decode(probs)
