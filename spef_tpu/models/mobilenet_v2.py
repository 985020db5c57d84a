"""MobileNet-V2 backbone — Flax, NHWC, bfloat16 compute.

Counterpart of the reference FP32 backbone
(`/root/reference/src/modeling/backbone/mobilenet_v2.py:232-271`): the same
(t, c, n, s) inverted-residual table, first conv 3x3 stride-2 to 32ch, last
1x1 conv to ``out_features`` (1280), ReLU activations.

A ``SmallMobile`` (2-block) and ``SmallBackbone`` debug variant mirror the
reference's FINN-debug models (`mobilenet_v2.py:12-116`,
`backbone/small.py:10-53`) — here they serve as fast-compile test vehicles.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from spef_tpu.models.layers import ConvBnAct, InvertedResidual

__all__ = ["MobileNetV2", "SmallMobile", "SmallBackbone", "MOBILENET_V2_SETTINGS"]

# (expand_ratio t, out_channels c, repeats n, first-stride s)
MOBILENET_V2_SETTINGS: Tuple[Tuple[int, int, int, int], ...] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

SMALL_MOBILE_SETTINGS: Tuple[Tuple[int, int, int, int], ...] = (
    (6, 32, 1, 1),
    (6, 32, 1, 2),
)


class MobileNetV2(nn.Module):
    """MobileNet-V2 feature extractor. Input NHWC, output NHWC feature map."""

    out_features: int = 1280
    batchnorm: bool = True
    residual: bool = True
    settings: Sequence[Tuple[int, int, int, int]] = MOBILENET_V2_SETTINGS
    width_mult: float = 1.0
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.compute_dtype)
        input_channel = int(32 * self.width_mult)
        x = ConvBnAct(
            input_channel, kernel_size=3, stride=2, padding=1,
            batchnorm=self.batchnorm, compute_dtype=self.compute_dtype, name="stem",
        )(x, train)
        block = 0
        for t, c, n, s in self.settings:
            c = int(c * self.width_mult)
            for i in range(n):
                stride = s if i == 0 else 1
                x = InvertedResidual(
                    features=c, stride=stride, expand_ratio=t,
                    batchnorm=self.batchnorm, residual=self.residual,
                    compute_dtype=self.compute_dtype, name=f"block_{block}",
                )(x, train)
                block += 1
        x = ConvBnAct(
            self.out_features, kernel_size=1, batchnorm=self.batchnorm,
            compute_dtype=self.compute_dtype, name="head_conv",
        )(x, train)
        return x


class SmallMobile(MobileNetV2):
    """Two-block MobileNet variant (reference `QSmallMobile`), 64 features."""

    out_features: int = 64
    settings: Sequence[Tuple[int, int, int, int]] = SMALL_MOBILE_SETTINGS


class SmallBackbone(nn.Module):
    """Tiny 2-conv + 1 inverted-residual debug net (reference
    `backbone/small.py:10-53` — 'ideal to understand and debug the build flow')."""

    out_features: int = 32
    batchnorm: bool = True
    residual: bool = True
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.compute_dtype)
        x = ConvBnAct(16, kernel_size=3, stride=2, batchnorm=self.batchnorm,
                      compute_dtype=self.compute_dtype, name="conv0")(x, train)
        x = InvertedResidual(16, stride=1, expand_ratio=2, batchnorm=self.batchnorm,
                             residual=self.residual, compute_dtype=self.compute_dtype,
                             name="block_0")(x, train)
        x = ConvBnAct(self.out_features, kernel_size=1, batchnorm=self.batchnorm,
                      compute_dtype=self.compute_dtype, name="conv1")(x, train)
        return x
