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

__all__ = ["URSONetHead", "KeypointRegressionHead"]


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
