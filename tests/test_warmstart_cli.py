"""Cross-head warm start (`apps.train --warm-start`): seed a new head's
experiment from any trained checkpoint of the same backbone — the in-env
equivalent of the reference's ImageNet initialization
(`src/modeling/model.py:268-277`)."""

import numpy as np
from flax import serialization

from spef_tpu.models.wrapper import import_model
from spef_tpu.quant.warmstart import copy_params


def _leaf(tree, substr):
    import jax

    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if substr in name:
            return name, np.asarray(leaf)
    raise AssertionError(f"no leaf matching {substr!r}")


def test_warm_start_across_heads():
    src = import_model(
        backbone_name="small_mobile", head_name="ursonet", img_size=(64, 96),
        ori_mode="classification", n_ori_bins=64, pos_mode="regression", seed=1,
    )
    dst = import_model(
        backbone_name="small_mobile", head_name="keypoints_regression",
        img_size=(64, 96), ori_mode="keypoints", pos_mode="keypoints",
        n_keypoint_outputs=24, seed=2,
    )
    # Round-trip through msgpack WITHOUT a target template (the checkpoint's
    # head does not match the destination model) — the --warm-start path.
    src_vars = serialization.msgpack_restore(serialization.to_bytes(src.variables))

    name, before_head = _leaf(dst.variables["params"], "head")
    new_vars = copy_params(src_vars, dst.variables, strict_shapes=False)

    # Backbone leaves copied exactly...
    src_name, src_k = _leaf(src.variables["params"], "kernel")
    dst_name, dst_k = _leaf(new_vars["params"], "kernel")
    assert src_k.shape == dst_k.shape, (src_name, dst_name)
    np.testing.assert_array_equal(src_k, dst_k)
    # ...while the shape-mismatched head keeps its fresh init.
    _, after_head = _leaf(new_vars["params"], "head")
    np.testing.assert_array_equal(before_head, after_head)
