"""ESA pose-estimation scoring — batched, pure JAX.

Counterpart of ``SPEUtils.get_score`` in the reference
(`/root/reference/src/spe/spe_utils.py:103-159`).  The score is

    ESA score = mean orientation error (rad) + mean normalized position error

with orientation error ``2 * arccos(|<q_pred, q_true>|)``.

Edge-case semantics preserved from the reference:
  * ``|<q,q>| > 1`` is clipped to 1 (numerical overflow tolerance);
  * ``|<q,q>| > 1.01`` indicates a genuinely broken prediction — the
    reference raises ``ValueError``.  Inside ``jit`` we cannot raise, so
    :func:`score_batch` also returns an ``invalid`` flag counting such
    entries; the host-side wrapper :func:`get_score` raises to match.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

__all__ = ["pose_errors", "score_batch", "get_score"]


def pose_errors(
    ori_true: jax.Array,
    pos_true: jax.Array,
    ori_pred: jax.Array,
    pos_pred: jax.Array,
) -> Dict[str, jax.Array]:
    """Per-sample errors (no reduction). All inputs are ``(B, ...)``.

    Returns per-sample: ``pos_error`` (m), ``norm_pos_error``, ``ori_error``
    (rad) and the count of ``invalid`` orientation dot products (> 1.01).
    """
    pos_error = jnp.linalg.norm(pos_true - pos_pred, axis=-1)
    norm_pos_error = pos_error / jnp.linalg.norm(pos_true, axis=-1)
    inter_sum = jnp.abs(jnp.sum(ori_pred * ori_true, axis=-1))
    invalid = jnp.sum(inter_sum > 1.01)
    inter_sum = jnp.minimum(inter_sum, 1.0)
    ori_error = 2.0 * jnp.arccos(inter_sum)
    return {
        "pos_error": pos_error,
        "norm_pos_error": norm_pos_error,
        "ori_error": ori_error,
        "invalid": invalid,
    }


def score_batch(
    ori_true: jax.Array,
    pos_true: jax.Array,
    ori_pred: jax.Array,
    pos_pred: jax.Array,
) -> Dict[str, jax.Array]:
    """Batch-mean metrics, jit-friendly.

    Keys match the reference's ``eval_metrics`` dict
    (`src/spe/spe_utils.py:151-157`): ``esa_score``, ``ori_score`` (rad),
    ``pos_score`` (normalized), ``ori_error`` (deg), ``pos_error`` (m) —
    plus ``invalid`` (count of out-of-range orientation dots).
    """
    e = pose_errors(ori_true, pos_true, ori_pred, pos_pred)
    mean_ori = jnp.mean(e["ori_error"])
    mean_norm_pos = jnp.mean(e["norm_pos_error"])
    return {
        "esa_score": mean_ori + mean_norm_pos,
        "ori_score": mean_ori,
        "pos_score": mean_norm_pos,
        "ori_error": jnp.rad2deg(mean_ori),
        "pos_error": jnp.mean(e["pos_error"]),
        "invalid": e["invalid"],
    }


def get_score(true_pose: dict, pred_pose: dict) -> Dict[str, float]:
    """Host-side scoring facade with the reference's error semantics.

    Raises ``ValueError`` when any orientation dot product exceeds 1.01,
    exactly like `src/spe/spe_utils.py:137-143`.
    """
    metrics = score_batch(
        jnp.asarray(true_pose["ori"]),
        jnp.asarray(true_pose["pos"]),
        jnp.asarray(pred_pose["ori"]),
        jnp.asarray(pred_pose["pos"]),
    )
    metrics = {k: float(v) for k, v in metrics.items()}
    if metrics.pop("invalid") > 0:
        raise ValueError("Intermediate sum issue due to error in model prediction (orientation)")
    return metrics
