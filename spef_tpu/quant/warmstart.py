"""FP32 -> QAT warm-start parameter copy.

Counterpart of the reference's ``copy_state_dict``
(`/root/reference/src/modeling/model.py:92-119`): float and quantized
models have differently-named parameter trees, so weights are copied by
*category + order* (convolution kernels in definition order, BN
scale/bias/mean/var, dense kernels/biases) rather than by exact key.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np

__all__ = ["copy_params"]

# Leaf-name categories, mirroring the reference's key list
# ["weight", "bias", "running_mean", "running_var"].
_CATEGORIES = ("kernel", "scale", "bias", "mean", "var")


def _flatten_by_category(tree) -> Dict[str, List[Tuple[str, np.ndarray]]]:
    out: Dict[str, List[Tuple[str, np.ndarray]]] = {c: [] for c in _CATEGORIES}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        keys = [str(getattr(k, "key", k)) for k in path]
        name = keys[-1]
        if name == "log2_scale":  # quantizer parameter, no float counterpart
            continue
        full = "/".join(keys)
        for cat in _CATEGORIES:
            if name == cat or name.endswith("_" + cat):
                out[cat].append((full, np.asarray(leaf)))
                break
    return out


def copy_params(src_variables: Any, dst_variables: Any, strict_shapes: bool = True) -> Any:
    """Copy src leaves into dst by category order; returns updated dst tree.

    Leaves whose shapes disagree are skipped with a note (unless
    ``strict_shapes``, which raises) — e.g. a float head with different
    output bins.
    """
    src_cats = _flatten_by_category(src_variables)
    dst_cats = _flatten_by_category(dst_variables)

    replacements: Dict[str, np.ndarray] = {}
    for cat in _CATEGORIES:
        src_list = src_cats[cat]
        dst_list = dst_cats[cat]
        for i, (dst_name, dst_leaf) in enumerate(dst_list):
            if i >= len(src_list):
                break
            src_name, src_leaf = src_list[i]
            if src_leaf.shape != dst_leaf.shape:
                msg = (f"shape mismatch copying {src_name} {src_leaf.shape} -> "
                       f"{dst_name} {dst_leaf.shape}")
                if strict_shapes:
                    raise ValueError(msg)
                continue
            replacements[dst_name] = src_leaf

    def rebuild(path, leaf):
        full = "/".join(str(getattr(k, "key", k)) for k in path)
        if full in replacements:
            return jax.numpy.asarray(replacements[full], dtype=leaf.dtype if hasattr(leaf, "dtype") else None)
        return leaf

    return jax.tree_util.tree_map_with_path(rebuild, dst_variables)
