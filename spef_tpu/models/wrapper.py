"""Model assembly: backbone + head composition, factory, save/load.

Counterpart of `/root/reference/src/modeling/model.py` (``ModelWrapper``,
``import_model``, ``save_model``, ``load_bit_width``/``save_bit_width``).

Differences, by design:
  * A model here is the (module, variables) pair — flax functional style.
  * Checkpoints are flax msgpack files (``parameters.msgpack``), not torch
    state dicts; the ``bit_width.json`` schema is kept compatible with the
    reference (stringified-tuple values, see :mod:`spef_tpu.quant.bitwidth`).
  * No dummy-forward-before-load dance: JAX params are materialized by
    ``init`` and quant scales are ordinary variables.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import serialization

from spef_tpu.models.heads import (
    KeypointHeatmapHead, KeypointRegressionHead, URSONetHead)
from spef_tpu.models.mobilenet_v2 import MobileNetV2, SmallBackbone, SmallMobile

__all__ = ["ModelWrapper", "SPEModel", "import_model", "save_model", "load_model_params"]

PARAMS_FILE = "parameters.msgpack"


class ModelWrapper(nn.Module):
    """features + head composition (`model.py` / `pytorch_layers.py:9-32`)."""

    backbone: nn.Module
    head: nn.Module

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        x = self.backbone(x, train)
        return self.head(x, train)


@dataclasses.dataclass
class SPEModel:
    """A bound model: module + variables + metadata."""

    module: nn.Module
    variables: Dict[str, Any]
    backbone_name: str
    head_name: str
    bit_width: Optional[dict] = None

    @property
    def params(self):
        return self.variables["params"]

    def apply(self, images: jax.Array, train: bool = False, rngs=None, mutable=False):
        return self.module.apply(self.variables, images, train, rngs=rngs, mutable=mutable)


_BACKBONES = {
    "mobilenet_v2": lambda cfg: MobileNetV2(
        out_features=1280, batchnorm=cfg["batchnorm"], residual=cfg["residual"]
    ),
    "small_mobile": lambda cfg: SmallMobile(batchnorm=cfg["batchnorm"], residual=cfg["residual"]),
    "small": lambda cfg: SmallBackbone(batchnorm=cfg["batchnorm"], residual=cfg["residual"]),
}

# Reference-name aliases (torch/brevitas naming) for config compatibility.
_BACKBONE_ALIASES = {
    "mobilenet_v2_pytorch": "mobilenet_v2",
    "mobilenet_v2_brevitas": "mobilenet_v2_q",
    "small_brevitas": "small_q",
    "small_mobile_brevitas": "small_mobile_q",
}
_HEAD_ALIASES = {
    "ursonet_pytorch": "ursonet",
    "ursonet_brevitas": "ursonet_q",
    "keypoints_regression_pytorch": "keypoints_regression",
}


def resolve_names(backbone_name: str, head_name: str) -> Tuple[str, str]:
    return (
        _BACKBONE_ALIASES.get(backbone_name, backbone_name),
        _HEAD_ALIASES.get(head_name, head_name),
    )


def import_model(
    backbone_name: str = "mobilenet_v2",
    head_name: str = "ursonet",
    img_size: Tuple[int, int] = (240, 384),
    params_path: Optional[str] = None,
    bit_width: Optional[dict] = None,
    batchnorm: bool = True,
    residual: bool = True,
    quantization: bool = True,
    ori_mode: str = "classification",
    n_ori_bins: Optional[int] = None,
    pos_mode: str = "regression",
    n_pos_bins: Optional[int] = None,
    n_keypoint_outputs: int = 24,
    seed: int = 1001,
    pretrained_path: Optional[str] = None,
) -> SPEModel:
    """Build (and optionally load) a model.

    Mirrors the decision table of the reference factory
    (`src/modeling/model.py:122-279`): head sizes 4/n_ori_bins and
    3/n_pos_bins, quantized variants selected by name suffix ``_q`` (the
    reference uses ``_brevitas``; aliases accepted).
    """
    backbone_name, head_name = resolve_names(backbone_name, head_name)
    cfg = {"batchnorm": batchnorm, "residual": residual}

    quantized = backbone_name.endswith("_q") or head_name.endswith("_q")
    if quantized:
        # Deferred import: quant stack is optional at model-build time.
        from spef_tpu.quant.qmodels import build_quant_backbone, build_quant_head

        backbone = build_quant_backbone(backbone_name, cfg, bit_width, quantization)
    else:
        assert backbone_name in _BACKBONES, f"Backbone {backbone_name} does not exist"
        backbone = _BACKBONES[backbone_name](cfg)

    if ori_mode == "keypoints":
        if head_name == "keypoints_heatmap":
            head: nn.Module = KeypointHeatmapHead(n_outputs=n_keypoint_outputs)
        else:
            head = KeypointRegressionHead(n_outputs=n_keypoint_outputs)
    else:
        n_ori = 4 if ori_mode == "regression" else int(n_ori_bins)
        n_pos = 3 if pos_mode == "regression" else int(n_pos_bins)
        if head_name.endswith("_q"):
            from spef_tpu.quant.qmodels import build_quant_head

            head = build_quant_head(head_name, n_ori, n_pos, bit_width, quantization)
        else:
            head = URSONetHead(n_ori_outputs=n_ori, n_pos_outputs=n_pos)

    module = ModelWrapper(backbone=backbone, head=head)
    dummy = jnp.zeros((1, img_size[0], img_size[1], 3), jnp.float32)
    variables = module.init({"params": jax.random.PRNGKey(seed)}, dummy, False)
    variables = jax.tree_util.tree_map(np.asarray, variables)  # host-side init

    model = SPEModel(
        module=module,
        variables=dict(variables),
        backbone_name=backbone_name,
        head_name=head_name,
        bit_width=bit_width,
    )
    if pretrained_path is not None:
        # ImageNet warm-start of the backbone, like the reference's
        # torchvision ingestion (`src/modeling/model.py:268-277`).
        from spef_tpu.models.pretrained import load_pretrained_backbone

        assert os.path.isfile(pretrained_path), f"Pretrained weights not found {pretrained_path}"
        model.variables = load_pretrained_backbone(pretrained_path, model.variables)
    if params_path is not None:
        assert os.path.isfile(params_path), f"Parameters not found {params_path}"
        model.variables = load_model_params(params_path, model.variables)
    return model


def save_model(save_folder: str, model: SPEModel, bit_width: Optional[dict] = None) -> str:
    """Serialize variables (+ optional bit-width json) into ``save_folder``."""
    os.makedirs(save_folder, exist_ok=True)
    path = os.path.join(save_folder, PARAMS_FILE)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(model.variables))
    bw = bit_width if bit_width is not None else model.bit_width
    if bw is not None:
        from spef_tpu.quant.bitwidth import save_bit_width

        save_bit_width(save_folder, bw)
    return path


def load_model_params(path: str, template_variables: Dict[str, Any]) -> Dict[str, Any]:
    """Load a msgpack checkpoint against a template variable tree."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template_variables, f.read())
