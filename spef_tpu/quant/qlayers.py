"""QAT layer library — flax counterparts of the Brevitas layer library.

Mirrors `/root/reference/src/modeling/common/brevitas_layers.py`:

  * :class:`QConvBnAct` — QuantConv2d (per-channel weight fake-quant) + BN +
    QuantReLU (learned-scale unsigned act fake-quant);
  * :class:`QInvertedResidual` — expansion/depthwise/projection with
    per-conv bit widths from the block's bit-width triple, and the
    **shared signed activation quantizer** applied to both the block input
    and the projection output before the residual add so both addends share
    one scale (`brevitas_layers.py:119-135`).

QAT math runs in float32 (fake-quant grids don't survive bf16 rounding).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from spef_tpu.models.layers import kaiming_normal_fan_out
from spef_tpu.quant.fake_quant import FakeQuantAct, quantize_weight

__all__ = ["QConv", "QConvBnAct", "QInvertedResidual"]


class QConv(nn.Module):
    """Conv2D with fake-quantized weights (per-out-channel scales)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    groups: int = 1
    use_bias: bool = False
    weight_bits: Optional[int] = 8
    quantization: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.padding if self.padding is not None else (self.kernel_size - 1) // 2
        in_ch = x.shape[-1] // self.groups
        kernel = self.param(
            "kernel",
            kaiming_normal_fan_out,
            (self.kernel_size, self.kernel_size, in_ch, self.features),
            jnp.float32,
        )
        if self.quantization:
            kernel = quantize_weight(kernel, self.weight_bits, per_channel=True)
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, kernel, (self.stride, self.stride), [(pad, pad), (pad, pad)],
            dimension_numbers=dn, feature_group_count=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias
        return y


class QConvBnAct(nn.Module):
    """Quantized Conv + BN + quantized ReLU (`brevitas_layers.py:10-54`)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    groups: int = 1
    batchnorm: bool = True
    activation: bool = True
    weight_bits: Optional[int] = 8
    act_bits: Optional[int] = 8
    quantization: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = QConv(
            self.features, self.kernel_size, self.stride, self.padding, self.groups,
            weight_bits=self.weight_bits, quantization=self.quantization, name="conv",
        )(x)
        if self.batchnorm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name="bn",
            )(x)
        if self.activation:
            x = nn.relu(x)
            if self.quantization:
                x = FakeQuantAct(bits=self.act_bits, signed=False, name="act_quant")(x)
        return x


class QInvertedResidual(nn.Module):
    """Quantized inverted residual with shared-scale residual add
    (`brevitas_layers.py:57-136`).

    ``bit_width`` is the block triple [(c1_w, c1_a), (c2_w, c2_a), (c3_w,)].
    ``input_quant`` applies the shared quantizer to the block input;
    ``use_residual`` additionally applies it to the conv output so both
    operands of the add share one scale.
    """

    features: int
    stride: int
    expand_ratio: int
    bit_width: Tuple
    shared_act_bits: int = 4
    batchnorm: bool = True
    quantization: bool = True
    use_residual: bool = False
    input_quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert self.stride in (1, 2)
        (c1_w, c1_a), (c2_w, c2_a), (c3_w,) = self.bit_width
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))

        shared = (
            FakeQuantAct(bits=self.shared_act_bits, signed=True, name="shared_quant")
            if self.quantization and (self.input_quant or self.use_residual)
            else None
        )
        if shared is not None:
            x = shared(x)

        residual = x
        y = x
        if self.expand_ratio != 1:
            y = QConvBnAct(hidden, kernel_size=1, batchnorm=self.batchnorm,
                           weight_bits=c1_w, act_bits=c1_a,
                           quantization=self.quantization, name="expand")(y, train)
        y = QConvBnAct(hidden, kernel_size=3, stride=self.stride, groups=hidden,
                       batchnorm=self.batchnorm, weight_bits=c2_w, act_bits=c2_a,
                       quantization=self.quantization, name="depthwise")(y, train)
        y = QConvBnAct(self.features, kernel_size=1, batchnorm=self.batchnorm,
                       activation=False, weight_bits=c3_w,
                       quantization=self.quantization, name="project")(y, train)

        if self.use_residual:
            if shared is not None:
                y = shared(y)  # same module instance -> same learned scale
            y = y + residual
        return y
