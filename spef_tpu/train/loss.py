"""Pose-estimation losses — pure JAX, differentiable, jit-friendly.

Counterpart of `/root/reference/src/solver/loss.py`.  Reference semantics
preserved exactly, including two quirks worth noting:

  * ``PosRegLoss`` takes the *Frobenius* norm over the whole batch matrix
    (``torch.linalg.norm(pred - target)`` with no dim argument,
    `loss.py:35-38`), optionally normalized by the Frobenius norm of the
    target batch.
  * ``OriRegLoss`` zeroes dot products > 1 before ``arccos`` (`loss.py:77`),
    unlike the scoring path which clips them to 1 — we keep both behaviors
    where the reference has them.

The reference raises on NaN / >1.01 overflow; inside jit we cannot, so the
training loop checks the returned loss on host (see
:mod:`spef_tpu.train.trainer`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

MODES = ("regression", "classification", "keypoints")

__all__ = ["pos_reg_loss", "ori_reg_loss", "soft_class_loss", "keypoints_loss", "SPELoss"]


def pos_reg_loss(pred: jax.Array, target: jax.Array, norm_distance: bool = True) -> jax.Array:
    """Position regression loss (`loss.py:10-38`)."""
    loss = jnp.linalg.norm(pred - target)  # Frobenius over the batch
    if norm_distance:
        loss = loss / jnp.linalg.norm(target)
    return loss


def ori_reg_loss(
    pred: jax.Array, target: jax.Array, target_pos: jax.Array = None, norm_distance: bool = True
) -> jax.Array:
    """Orientation regression loss (`loss.py:41-81`)."""
    inter_sum = jnp.abs(jnp.sum(pred * target, axis=-1, keepdims=True))
    # Reference zeroes values just above 1 (numerical overflow tolerance).
    inter_sum = jnp.where(inter_sum > 1.0, 0.0, inter_sum)
    loss = jnp.arccos(inter_sum)
    if norm_distance:
        loss = loss / jnp.linalg.norm(target_pos, axis=-1, keepdims=True)
    return jnp.mean(loss)


def soft_class_loss(pred: jax.Array, target: jax.Array, eps: float = 0.0) -> jax.Array:
    """Cross-entropy with soft targets (`loss.py:84-112`).

    ``pred`` must already be softmax probabilities (matching the reference,
    which applies softmax in the training loop before the loss).  ``eps``
    guards log(0) when requested; default 0 matches the reference.
    """
    return jnp.mean(jnp.sum(-(target * jnp.log(pred + eps)), axis=-1))


def keypoints_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """MSE keypoint loss (`loss.py:133,146-147`)."""
    return jnp.mean((pred - target) ** 2)


@dataclasses.dataclass(frozen=True)
class SPELoss:
    """Dispatching loss: total = beta * ori + pos (`loss.py:115-157`)."""

    ori_mode: str
    pos_mode: str
    beta: float = 1.0
    norm_distance: bool = True

    def __post_init__(self):
        assert self.ori_mode in MODES and self.pos_mode in MODES

    def compute_loss(self, prediction: Dict[str, jax.Array], target: Dict[str, jax.Array]) -> jax.Array:
        if self.ori_mode == "keypoints" and self.pos_mode == "keypoints":
            return keypoints_loss(prediction["keypoints"], target["keypoints"])

        if self.ori_mode == "regression":
            ori = ori_reg_loss(prediction["ori"], target["ori"], target["pos"], self.norm_distance)
        else:
            ori = soft_class_loss(prediction["ori_soft"], target["ori_soft"])

        if self.pos_mode == "regression":
            pos = pos_reg_loss(prediction["pos"], target["pos"], self.norm_distance)
        else:
            pos = soft_class_loss(prediction["pos_soft"], target["pos_soft"])

        return self.beta * ori + pos

    __call__ = compute_loss
