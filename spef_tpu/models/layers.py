"""Core NN layers — Flax linen, NHWC layout (TPU-native).

Counterparts of the reference's torch layer library
(`/root/reference/src/modeling/common/pytorch_layers.py:35-98`): ConvBnAct
and InvertedResidual with ReLU (the reference deliberately replaces ReLU6
with ReLU for fusion friendliness — we keep that choice, it also fuses
better in XLA).

TPU-first choices:
  * NHWC activations / HWIO kernels — the native TPU convolution layout.
  * Optional ``compute_dtype`` (default bfloat16) for MXU-friendly math;
    parameters stay float32.
  * Kaiming-normal(fan_out) conv init and normal(0.01) dense init matching
    the reference's ``ModelWrapper`` init (`pytorch_layers.py:16-27`).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ConvBnAct", "InvertedResidual", "kaiming_normal_fan_out", "dense_init"]

# Reference init: nn.init.kaiming_normal_(m.weight, mode='fan_out') for convs.
kaiming_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# Reference init: nn.init.normal_(m.weight, 0, 0.01) for linear layers.
dense_init = nn.initializers.normal(stddev=0.01)


class ConvBnAct(nn.Module):
    """Conv2D + optional BatchNorm + optional ReLU.

    Mirrors `pytorch_layers.py:35-62` (padding = (k-1)//2 * dilation when
    unspecified; bias off when BN is used).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    batchnorm: bool = True
    activation: bool = True
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = self.padding
        if pad is None:
            pad = (self.kernel_size - 1) // 2 * self.dilation
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias and not self.batchnorm,
            kernel_init=kaiming_normal_fan_out,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.batchnorm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                name="bn",
            )(x)
            x = x.astype(self.compute_dtype)
        if self.activation:
            x = nn.relu(x)
        return x


class InvertedResidual(nn.Module):
    """MobileNet-V2 inverted residual block (`pytorch_layers.py:65-98`).

    expand 1x1 (if t != 1) -> depthwise 3x3 (stride) -> project 1x1 (linear),
    with identity skip when stride==1 and channels match.
    """

    features: int
    stride: int
    expand_ratio: int
    batchnorm: bool = True
    residual: bool = True
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert self.stride in (1, 2)
        in_ch = x.shape[-1]
        use_residual = self.stride == 1 and in_ch == self.features and self.residual
        hidden = int(round(in_ch * self.expand_ratio))

        y = x
        if self.expand_ratio != 1:
            y = ConvBnAct(
                hidden, kernel_size=1, batchnorm=self.batchnorm,
                compute_dtype=self.compute_dtype, name="expand",
            )(y, train)
        y = ConvBnAct(
            hidden, kernel_size=3, stride=self.stride, groups=hidden,
            batchnorm=self.batchnorm, compute_dtype=self.compute_dtype, name="depthwise",
        )(y, train)
        y = ConvBnAct(
            self.features, kernel_size=1, batchnorm=self.batchnorm, activation=False,
            compute_dtype=self.compute_dtype, name="project",
        )(y, train)
        if use_residual:
            y = x + y
        return y
