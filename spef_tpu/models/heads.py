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
    upsample: int = 2  # upsample+conv refinement stages (4x heatmap resolution)
    refine_ch: int = 128  # channels in the upsampling convs
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert self.n_outputs % 2 == 0
        k = self.n_outputs // 2
        x = x.astype(self.compute_dtype)

        def conv_bn_relu(y, ch, ksize, name):
            y = nn.Conv(ch, (ksize, ksize), use_bias=False,
                        dtype=self.compute_dtype, param_dtype=jnp.float32,
                        name=f"{name}_conv")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=jnp.float32, param_dtype=jnp.float32,
                             name=f"{name}_bn")(y)
            return nn.relu(y.astype(self.compute_dtype))

        # Squeeze the 1280-ch backbone map to refine_ch BEFORE upsampling:
        # the 3x3 refinement convs then run on narrow maps (MXU-cheap).
        x = conv_bn_relu(x, self.refine_ch, 1, "squeeze")
        # Backbone stride leaves the feature map coarse (8x12 at 240x384);
        # upsample+conv stages sharpen localization like the simple-baselines
        # deconv stack.  The 2x nearest upsample is a broadcast+reshape — NOT
        # jax.image.resize, whose gather lowering runs ~1000x below peak on
        # TPU (measured; see PERFORMANCE.md "device-side yaw warp").
        for i in range(self.upsample):
            b_, h_, w_, c_ = x.shape
            x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (b_, h_, 2, w_, 2, c_)).reshape(
                                     b_, 2 * h_, 2 * w_, c_)
            x = conv_bn_relu(x, self.refine_ch, 3, f"up{i}")
        b, h, w, _ = x.shape
        logits = nn.Conv(k, (1, 1), use_bias=True, param_dtype=jnp.float32,
                         dtype=jnp.float32, name="heatmap_conv")(
                             x.astype(jnp.float32))  # (B,H,W,K)
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
