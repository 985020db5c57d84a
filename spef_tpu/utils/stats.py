"""Per-layer model statistics: shapes, parameters, MACs.

Counterpart of `/root/reference/nn_stats.py:16-152`
(``detailed_model_summary``): hook-based per-layer input/output shapes,
parameter counts and MAC counts with per-type and total summaries.  Here
the "hooks" are flax ``capture_intermediates`` under ``jax.eval_shape`` —
no real compute, shapes only.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["detailed_model_summary", "print_model_summary"]


def _conv_macs(kernel_shape, out_shape, groups: int = 1) -> int:
    """kh*kw*cin_per_group*cout * out_h*out_w (per sample)."""
    kh, kw, cin_g, cout = kernel_shape
    _, oh, ow, _ = out_shape
    return int(kh * kw * cin_g * cout * oh * ow)


def _dense_macs(kernel_shape) -> int:
    return int(np.prod(kernel_shape))


def detailed_model_summary(model, img_size: Tuple[int, int]) -> List[Dict[str, Any]]:
    """Shape-infer a model and emit one row per parametric layer.

    Rows: {name, type, kernel_shape, out_shape, params, macs}.
    """
    dummy = jnp.zeros((1, img_size[0], img_size[1], 3), jnp.float32)

    # Capture every submodule's output shape.
    def run(variables):
        out, inter = model.module.apply(
            variables, dummy, False,
            capture_intermediates=lambda mdl, method: True,
            mutable=["intermediates"],
        )
        return inter["intermediates"]

    inter_shapes = jax.eval_shape(run, model.variables)

    # Flatten intermediates: path -> output shape of that module call.
    out_shapes: Dict[str, Tuple[int, ...]] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(inter_shapes):
        keys = [str(getattr(k, "key", k)) for k in path]
        # Path ends with '__call__' / index; module path is the prefix.
        mod_path = "/".join(
            k for k in keys
            if k != "__call__" and not k.isdigit() and not (k.startswith("[") and k.endswith("]"))
        )
        if hasattr(leaf, "shape"):
            out_shapes[mod_path] = tuple(leaf.shape)

    rows: List[Dict[str, Any]] = []
    params = model.variables["params"]
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = [str(getattr(k, "key", k)) for k in path]
        name = "/".join(keys)
        leaf_name = keys[-1]
        if leaf_name == "kernel" or leaf_name.endswith("_kernel"):
            mod_path = "/".join(keys[:-1])
            shape = tuple(np.shape(leaf))
            if len(shape) == 4:  # conv HWIO
                out_shape = out_shapes.get(mod_path) or out_shapes.get(
                    "/".join(keys[:-2])
                )
                macs = _conv_macs(shape, out_shape) if out_shape else 0
                layer_type = "Conv2D"
            else:  # dense
                out_shape = out_shapes.get(mod_path)
                macs = _dense_macs(shape)
                layer_type = "Dense"
            rows.append(
                {
                    "name": name.rsplit("/", 1)[0] if leaf_name == "kernel" else name,
                    "type": layer_type,
                    "kernel_shape": shape,
                    "out_shape": out_shape,
                    "params": int(np.prod(shape)),
                    "macs": macs,
                }
            )
        elif leaf_name in ("bias", "scale") or leaf_name.endswith("_bias"):
            rows.append(
                {
                    "name": name,
                    "type": "BatchNorm" if "bn" in keys else "Bias",
                    "kernel_shape": tuple(np.shape(leaf)),
                    "out_shape": None,
                    "params": int(np.prod(np.shape(leaf))),
                    "macs": 0,
                }
            )
    return rows


def print_model_summary(model, img_size: Tuple[int, int]) -> Dict[str, Any]:
    """Print the per-layer table + per-type and total summary
    (reference `nn_stats.py:107-152` output shape)."""
    rows = detailed_model_summary(model, img_size)
    by_type: Dict[str, Dict[str, int]] = {}
    print(f"{'layer':60s} {'type':10s} {'params':>10s} {'MACs':>14s}  out_shape")
    for r in rows:
        if r["type"] in ("Conv2D", "Dense"):
            print(
                f"{r['name']:60s} {r['type']:10s} {r['params']:>10,d} {r['macs']:>14,d}  "
                f"{r['out_shape']}"
            )
        agg = by_type.setdefault(r["type"], {"params": 0, "macs": 0, "count": 0})
        agg["params"] += r["params"]
        agg["macs"] += r["macs"]
        agg["count"] += 1

    total_params = sum(v["params"] for v in by_type.values())
    total_macs = sum(v["macs"] for v in by_type.values())
    print("-" * 110)
    for t, agg in sorted(by_type.items()):
        print(f"{t:20s} x{agg['count']:<4d} params={agg['params']:>12,d} MACs={agg['macs']:>16,d}")
    print(f"{'TOTAL':20s}       params={total_params:>12,d} MACs={total_macs:>16,d}")
    return {"rows": rows, "by_type": by_type, "total_params": total_params, "total_macs": total_macs}
