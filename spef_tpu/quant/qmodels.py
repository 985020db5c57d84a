"""Quantized model family — flax counterparts of the Brevitas backbones/heads.

Mirrors `/root/reference/src/modeling/backbone/mobilenet_v2.py` (QMobileNetV2,
QSmallMobile), `backbone/small.py` (QSmallBackbone) and
`head/ursonet.py:36-86` (QURSONetHead), including:

  * the input-quant placement rule per block: with residual connections, a
    block's input is quantized iff it uses a residual, the previous block
    used one, or it is block #1 (`mobilenet_v2.py:199-202`);
  * the final shared QuantIdentity after the last (activation-less)
    inverted-residual block before the last 1x1 conv;
  * bit-width dict schema identical to the reference
    (:mod:`spef_tpu.quant.bitwidth`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from spef_tpu.models.layers import dense_init
from spef_tpu.models.mobilenet_v2 import MOBILENET_V2_SETTINGS, SMALL_MOBILE_SETTINGS
from spef_tpu.quant.bitwidth import default_bit_width
from spef_tpu.quant.fake_quant import FakeQuantAct, quantize_input_image, quantize_weight
from spef_tpu.quant.qlayers import QConvBnAct, QInvertedResidual

__all__ = [
    "QMobileNetV2",
    "QSmallMobile",
    "QSmallBackbone",
    "QURSONetHead",
    "build_quant_backbone",
    "build_quant_head",
]


class QMobileNetV2(nn.Module):
    """Quantized MobileNet-V2 feature extractor (`mobilenet_v2.py:119-229`)."""

    out_features: int = 1280
    batchnorm: bool = True
    residual: bool = True
    quantization: bool = True
    bit_width: Optional[dict] = None
    settings: Sequence[Tuple[int, int, int, int]] = MOBILENET_V2_SETTINGS

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n_blocks = sum(n for _, _, n, _ in self.settings)
        bw = self.bit_width or default_bit_width(n_blocks)
        x = x.astype(jnp.float32)

        if self.quantization:
            x = quantize_input_image(x, bw["image"])

        x = QConvBnAct(
            32, kernel_size=3, stride=2, padding=1, batchnorm=self.batchnorm,
            weight_bits=bw["first_conv"][0], act_bits=bw["first_conv"][1],
            quantization=self.quantization, name="stem",
        )(x, train)

        in_ch = 32
        prev_used_residual = False
        block = 0
        for t, c, n, s in self.settings:
            for i in range(n):
                stride = s if i == 0 else 1
                use_residual = stride == 1 and in_ch == c and self.residual
                # Input-quant placement rule (`mobilenet_v2.py:199-202`).
                if self.residual:
                    input_quant = use_residual or prev_used_residual or (block == 1 and i == 0)
                else:
                    input_quant = not (block == 0 and i == 0)
                x = QInvertedResidual(
                    features=c, stride=stride, expand_ratio=t,
                    bit_width=tuple(map(tuple, bw["inverted_residual"][block])),
                    shared_act_bits=bw["shared_act"], batchnorm=self.batchnorm,
                    quantization=self.quantization, use_residual=use_residual,
                    input_quant=input_quant, name=f"block_{block}",
                )(x, train)
                in_ch = c
                prev_used_residual = use_residual
                block += 1

        # Shared QuantIdentity after the activation-less residual outputs
        # (`mobilenet_v2.py:214-217`).
        if self.quantization:
            x = FakeQuantAct(bits=bw["shared_act"], signed=True, name="final_shared_quant")(x)

        x = QConvBnAct(
            self.out_features, kernel_size=1, batchnorm=self.batchnorm,
            weight_bits=bw["last_conv"][0], act_bits=bw["last_conv"][1],
            quantization=self.quantization, name="head_conv",
        )(x, train)
        return x


class QSmallMobile(QMobileNetV2):
    """Two-block quantized MobileNet (`mobilenet_v2.py:12-116`)."""

    out_features: int = 64
    settings: Sequence[Tuple[int, int, int, int]] = SMALL_MOBILE_SETTINGS


class QSmallBackbone(nn.Module):
    """Tiny quantized debug backbone (`backbone/small.py:10-53`)."""

    out_features: int = 32
    batchnorm: bool = True
    residual: bool = True
    quantization: bool = True
    bit_width: Optional[dict] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bw = self.bit_width or default_bit_width(1)
        x = x.astype(jnp.float32)
        if self.quantization:
            x = quantize_input_image(x, bw["image"])
        x = QConvBnAct(16, kernel_size=3, stride=2, batchnorm=self.batchnorm,
                       weight_bits=bw["first_conv"][0], act_bits=bw["first_conv"][1],
                       quantization=self.quantization, name="conv0")(x, train)
        x = QInvertedResidual(
            16, stride=1, expand_ratio=2,
            bit_width=tuple(map(tuple, bw["inverted_residual"][0])),
            shared_act_bits=bw["shared_act"], batchnorm=self.batchnorm,
            quantization=self.quantization, use_residual=self.residual,
            input_quant=True, name="block_0",
        )(x, train)
        if self.quantization:
            x = FakeQuantAct(bits=bw["shared_act"], signed=True, name="final_shared_quant")(x)
        x = QConvBnAct(self.out_features, kernel_size=1, batchnorm=self.batchnorm,
                       weight_bits=bw["last_conv"][0], act_bits=bw["last_conv"][1],
                       quantization=self.quantization, name="conv1")(x, train)
        return x


class QURSONetHead(nn.Module):
    """Quantized URSONet head (`head/ursonet.py:36-86`): quantized average
    pool (8-bit trunc) + quantized FC branches with quantized bias."""

    n_ori_outputs: int = 4
    n_pos_outputs: int = 3
    dropout_rate: float = 0.2
    use_bias: bool = True
    quantization: bool = True
    bit_width: Optional[dict] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        bw = self.bit_width or {}
        fc_w_bits, fc_b_bits = bw.get("fully_connected", (8, 8))
        pool_bits = bw.get("pooling", 8)

        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        if self.quantization:
            # QuantAvgPool2d truncation to pool_bits (TruncTo8bit counterpart).
            x = FakeQuantAct(bits=pool_bits, signed=True, name="pool_quant")(x)

        def qdense(h, n_out, name):
            in_f = h.shape[-1]
            kernel = self.param(f"{name}_kernel", dense_init, (in_f, n_out), jnp.float32)
            if self.quantization:
                kernel = quantize_weight(kernel, fc_w_bits, per_channel=True)
            y = h @ kernel
            if self.use_bias:
                bias = self.param(f"{name}_bias", nn.initializers.zeros, (n_out,), jnp.float32)
                if self.quantization:
                    bias = quantize_weight(bias, fc_b_bits, per_channel=False)
                y = y + bias
            return y

        ori_in = nn.Dropout(self.dropout_rate, deterministic=not train, name="ori_dropout")(x)
        ori = qdense(ori_in, self.n_ori_outputs, "ori_fc")
        pos = qdense(x, self.n_pos_outputs, "pos_fc")
        return ori, pos


def build_quant_backbone(name: str, cfg: dict, bit_width: Optional[dict], quantization: bool):
    """Factory used by the model wrapper for ``*_q`` backbone names."""
    common = dict(
        batchnorm=cfg["batchnorm"], residual=cfg["residual"],
        quantization=quantization, bit_width=bit_width,
    )
    if name == "mobilenet_v2_q":
        return QMobileNetV2(out_features=1280, **common)
    if name == "small_mobile_q":
        return QSmallMobile(**common)
    if name == "small_q":
        return QSmallBackbone(**common)
    raise ValueError(f"Quantized backbone {name} does not exist")


def build_quant_head(name: str, n_ori: int, n_pos: int, bit_width: Optional[dict], quantization: bool):
    if name == "ursonet_q":
        return QURSONetHead(
            n_ori_outputs=n_ori, n_pos_outputs=n_pos,
            quantization=quantization, bit_width=bit_width,
        )
    raise ValueError(f"Quantized head {name} does not exist")
