"""Pose-estimation heads — Flax.

Counterparts of the reference heads:
  * ``URSONetHead`` (`/root/reference/src/modeling/head/ursonet.py:10-33`):
    global average pool -> two FC branches (ori with dropout 0.2, pos plain).
  * ``KeypointRegressionHead`` (`src/modeling/head/keypoints.py:10-28`):
    flatten -> dropout -> single linear to 2*(K+1) normalized coords.  The
    reference hard-codes 122880 input features; here the dense layer infers
    its input size from the feature map, which generalizes across image sizes.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from spef_tpu.models.layers import dense_init

__all__ = ["URSONetHead", "KeypointRegressionHead", "KeypointHeatmapHead"]


class URSONetHead(nn.Module):
    """Two-branch (orientation, position) head over pooled features."""

    n_ori_outputs: int = 4
    n_pos_outputs: int = 3
    dropout_rate: float = 0.2
    use_bias: bool = True
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        # Global average pool over H, W (reference: x.mean([2,3]) in NCHW).
        x = jnp.mean(x, axis=(1, 2))
        x = x.astype(jnp.float32)  # head math in fp32 for stable logits
        ori = nn.Dropout(self.dropout_rate, deterministic=not train, name="ori_dropout")(x)
        ori = nn.Dense(self.n_ori_outputs, use_bias=self.use_bias,
                       kernel_init=dense_init, name="ori_fc")(ori)
        pos = nn.Dense(self.n_pos_outputs, use_bias=self.use_bias,
                       kernel_init=dense_init, name="pos_fc")(x)
        return ori, pos


class KeypointRegressionHead(nn.Module):
    """Single-linear keypoint regressor over flattened features."""

    n_outputs: int = 24
    dropout_rate: float = 0.2
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        x = nn.Dropout(self.dropout_rate, deterministic=not train, name="dropout")(x)
        x = nn.Dense(self.n_outputs, use_bias=self.use_bias,
                     kernel_init=dense_init, name="fc")(x)
        return x


class KeypointHeatmapHead(nn.Module):
    """Integral (soft-argmax) keypoint head — the TPU-first alternative to
    the reference's flatten->FC regressor.

    1x1 conv -> K spatial heatmaps -> per-keypoint spatial softmax ->
    expected (x, y) over pixel-center grids, i.e. fully differentiable
    integral regression (Sun et al., "Integral Human Pose Regression") —
    everything batched matmuls/softmax on the MXU/VPU, no flatten-sized FC.

    The head returns LOGITS of the normalized coordinates so the pipeline's
    standard keypoints activation (sigmoid, reference parity with
    `head/keypoints.py`) reconstructs the coordinates exactly:
    ``sigmoid(logit(p)) == p``.  No plumbing changes anywhere — training
    loss, facade activation, EPnP decode, serving, and export all see the
    same contract as the regression head.  Like the reference's
    sigmoid-bounded regressor, predictions live in (0, 1): keypoints
    projecting outside the frame saturate at the border for both heads.
    """

    n_outputs: int = 24  # 2 * (K keypoints incl. the prepended origin)
    temperature: float = 1.0  # heatmap softmax sharpness
    upsample: int = 2  # resize+conv refinement stages (4x heatmap resolution)
    refine_ch: int = 128  # channels in the upsampling convs

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert self.n_outputs % 2 == 0
        k = self.n_outputs // 2
        x = x.astype(jnp.float32)
        # Backbone stride leaves the feature map coarse (8x12 at 240x384);
        # resize+conv stages sharpen localization like the simple-baselines
        # deconv stack, but resize+conv avoids checkerboard artifacts and
        # lowers to plain XLA convs on the MXU.
        for i in range(self.upsample):
            b_, h_, w_, _ = x.shape
            x = jax.image.resize(x, (b_, 2 * h_, 2 * w_, x.shape[-1]), "nearest")
            x = nn.Conv(self.refine_ch, (3, 3), use_bias=False,
                        name=f"up{i}_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"up{i}_bn")(x)
            x = nn.relu(x)
        b, h, w, _ = x.shape
        logits = nn.Conv(k, (1, 1), use_bias=True, name="heatmap_conv")(x)  # (B,H,W,K)
        flat = logits.reshape(b, h * w, k) / self.temperature
        p = jax.nn.softmax(flat, axis=1).reshape(b, h, w, k)
        # Pixel-center coordinate grids in [0, 1].
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        ex = jnp.einsum("bhwk,w->bk", p, xs)
        ey = jnp.einsum("bhwk,h->bk", p, ys)
        coords = jnp.stack([ex, ey], axis=-1).reshape(b, self.n_outputs)
        eps = 1e-6
        coords = jnp.clip(coords, eps, 1.0 - eps)
        return jnp.log(coords / (1.0 - coords))  # logit: downstream sigmoid inverts
