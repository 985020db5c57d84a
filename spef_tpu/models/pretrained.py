"""ImageNet-pretrained backbone ingestion (torchvision MobileNetV2).

Counterpart of the reference's pretrained initialization
(`/root/reference/src/modeling/model.py:268-277`), which warm-starts
``model.features`` from ``torchvision.models.mobilenet_v2(pretrained=True)``
via a key-order ``copy_state_dict`` (`model.py:92-119`).

This environment has no network egress and no bundled weights, so instead of
downloading we *ingest*: given a torchvision-format MobileNetV2 checkpoint on
disk (either a ``.npz`` of numpy arrays or a torch ``state_dict`` file, both
keyed by the standard ``features.*`` names), map every backbone tensor onto
the flax parameter tree by *structured name mapping* — more robust than the
reference's order-copy because a missing or extra tensor is a hard error,
not a silent shift.

Layout transforms applied:
  * conv kernels  (O, I, kH, kW)  -> HWIO (kH, kW, I, O)
  * depthwise kernels (C, 1, kH, kW) -> (kH, kW, 1, C)  (same transpose)
  * BN weight/bias -> scale/bias (params); running_mean/var -> batch_stats.

Usage: ``import_model(..., pretrained_path="mobilenet_v2_imagenet.npz")`` or
``apps.train --pretrained-backbone <file>``. The head is always left at its
fresh init, exactly like the reference (only ``features`` is pretrained).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Tuple

import numpy as np

__all__ = [
    "load_pretrained_backbone",
    "torchvision_key_map",
    "load_state_dict_file",
]

# MobileNetV2 (t, c, n, s) table — must match models.mobilenet_v2 settings.
_SETTINGS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
             (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


def torchvision_key_map() -> List[Tuple[str, str, str]]:
    """(torchvision prefix, flax module path, kind) triples for MobileNetV2.

    kind is ``conv`` (a bare conv weight) or ``convbn`` (ConvBNReLU: conv at
    ``.0``, BN at ``.1``). Flax paths are relative to the backbone module.
    """
    table: List[Tuple[str, str, str]] = [("features.0", "stem", "convbn")]
    block = 0
    for t, _c, n, _s in _SETTINGS:
        for _ in range(n):
            tv = f"features.{block + 1}.conv"
            fx = f"block_{block}"
            if t == 1:
                # torchvision: conv.0 = ConvBNReLU(dw), conv.1 = proj conv,
                # conv.2 = proj BN
                table.append((f"{tv}.0", f"{fx}/depthwise", "convbn"))
                table.append((f"{tv}.1", f"{fx}/project/conv", "conv"))
                table.append((f"{tv}.2", f"{fx}/project/bn", "bn"))
            else:
                table.append((f"{tv}.0", f"{fx}/expand", "convbn"))
                table.append((f"{tv}.1", f"{fx}/depthwise", "convbn"))
                table.append((f"{tv}.2", f"{fx}/project/conv", "conv"))
                table.append((f"{tv}.3", f"{fx}/project/bn", "bn"))
            block += 1
    table.append((f"features.{block + 1}", "head_conv", "convbn"))
    return table


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Load a torchvision-style state dict from .npz or a torch file."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: np.asarray(z[k]) for k in z.files}
    import torch  # torch(cpu) is baked into the environment

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    # torch OIHW (depthwise: (C,1,kH,kW)) -> flax HWIO ((kH,kW,1,C) for dw).
    return np.transpose(w, (2, 3, 1, 0))


def load_pretrained_backbone(
    path_or_state: Any,
    variables: Dict[str, Any],
    backbone_scope: str = "backbone",
) -> Dict[str, Any]:
    """Return ``variables`` with the backbone initialized from a torchvision
    MobileNetV2 checkpoint. Head params and everything else are untouched.

    Raises ``KeyError`` on a missing source tensor and ``ValueError`` on any
    shape mismatch — ingestion is all-or-nothing.
    """
    state = (load_state_dict_file(path_or_state)
             if isinstance(path_or_state, (str, os.PathLike)) else dict(path_or_state))

    params = _to_mutable(variables.get("params", {}))
    stats = _to_mutable(variables.get("batch_stats", {}))

    def assign(tree, rel_path: str, value: np.ndarray):
        keys = rel_path.split("/")
        node = tree[backbone_scope]
        for k in keys[:-1]:
            node = node[k]
        old = node[keys[-1]]
        if tuple(np.shape(old)) != value.shape:
            raise ValueError(
                f"pretrained shape mismatch at {backbone_scope}/{rel_path}: "
                f"checkpoint {value.shape} vs model {tuple(np.shape(old))}")
        node[keys[-1]] = value.astype(np.asarray(old).dtype)

    n_assigned = 0
    for tv, fx, kind in torchvision_key_map():
        if kind in ("conv", "convbn"):
            conv_key = f"{tv}.weight" if kind == "conv" else f"{tv}.0.weight"
            conv_path = fx if kind == "conv" else f"{fx}/conv"
            assign(params, f"{conv_path}/kernel", _conv_kernel(state[conv_key]))
            n_assigned += 1
        if kind in ("bn", "convbn"):
            bn_key = tv if kind == "bn" else f"{tv}.1"
            bn_path = fx if kind == "bn" else f"{fx}/bn"
            assign(params, f"{bn_path}/scale", state[f"{bn_key}.weight"])
            assign(params, f"{bn_path}/bias", state[f"{bn_key}.bias"])
            assign(stats, f"{bn_path}/mean", state[f"{bn_key}.running_mean"])
            assign(stats, f"{bn_path}/var", state[f"{bn_key}.running_var"])
            n_assigned += 4

    assert n_assigned > 0
    out = dict(variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    if hasattr(tree, "items"):  # FrozenDict
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree
