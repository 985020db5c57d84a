"""Jitted train / eval steps with data-parallel sharding over a mesh.

Replaces the reference's per-batch torch loop body
(`/root/reference/src/tools/training.py:97-155`): forward, last activation,
loss, backward, SGD step, optional BatchNorm weight clamp — all one XLA
program.  Scaling strategy per SURVEY.md §2.3: batch-sharded data
parallelism via ``jax.sharding`` (params replicated, batch split over the
``data`` mesh axis); XLA inserts the gradient ``psum`` automatically.

The reference's AMP/GradScaler has no TPU counterpart needed: bfloat16 has
fp32-range exponents, so the forward runs in bf16 with fp32 master weights
and no loss scaling.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from spef_tpu.codec.facade import SPEUtils
from spef_tpu.train.loss import SPELoss

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_eval_step"]


class TrainState(struct.PyTreeNode):
    """Pure pytree training state (params + BN stats + optimizer state)."""

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def create_train_state(model, tx: optax.GradientTransformation) -> TrainState:
    params = model.variables["params"]
    batch_stats = model.variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.module.apply,
    )


def _apply_last_activation(spe_utils: SPEUtils, pred) -> Dict[str, jax.Array]:
    """In-graph final activation (reference `training.py:113-124`)."""
    if spe_utils.ori_mode == "keypoints" and spe_utils.pos_mode == "keypoints":
        out = pred[0] if isinstance(pred, tuple) else pred
        return {"keypoints": jax.nn.sigmoid(out)}
    pose: Dict[str, jax.Array] = {}
    if spe_utils.ori_mode == "regression":
        pose["ori"] = pred[0] / jnp.linalg.norm(pred[0], axis=-1, keepdims=True)
    else:
        pose["ori_soft"] = jax.nn.softmax(pred[0], axis=-1)
    if spe_utils.pos_mode == "classification":
        pose["pos_soft"] = jax.nn.softmax(pred[1], axis=-1)
    else:
        pose["pos"] = pred[1]
    return pose


def make_train_step(
    spe_utils: SPEUtils,
    spe_loss: SPELoss,
    clip_batchnorm: bool = False,
    compute_metrics: bool = True,
):
    """Build the jittable train step.

    Signature: ``step(state, images, targets, rng) -> (state, metrics)``.
    ``targets`` must already contain encoded soft targets / keypoints (the
    device-side ``SPEUtils.encode_targets``).
    """

    def train_step(state: TrainState, images, targets, rng):
        def _loss(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            pred, new_state = state.apply_fn(
                variables, images, True, rngs={"dropout": rng}, mutable=["batch_stats"]
            )
            pose = _apply_last_activation(spe_utils, pred)
            loss = spe_loss.compute_loss(pose, targets)
            return loss, (new_state.get("batch_stats", state.batch_stats), pose)

        (loss, (new_batch_stats, pose)), grads = jax.value_and_grad(_loss, has_aux=True)(
            state.params
        )
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        if clip_batchnorm:
            # Clamp BN scale to [0, 1] (reference `training.py:138-144`, a
            # FINN constraint kept for checkpoint-compatible QAT).
            def clamp(path, p):
                names = [getattr(k, "key", "") for k in path]
                if "bn" in names and names[-1] == "scale":
                    return jnp.clip(p, 0.0, 1.0)
                return p

            new_params = jax.tree_util.tree_map_with_path(clamp, new_params)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        metrics = {"loss": loss}
        if compute_metrics:
            decoded = spe_utils.decode(pose)
            metrics.update(spe_utils.score_batch(targets, decoded))
        return new_state, metrics

    return train_step


def make_eval_step(spe_utils: SPEUtils, spe_loss: Optional[SPELoss] = None):
    """Jittable eval step: forward (eval mode) + activation + decode + score."""

    def eval_step(state: TrainState, images, targets):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        pred = state.apply_fn(variables, images, False)
        pose = _apply_last_activation(spe_utils, pred)
        metrics = {}
        if spe_loss is not None:
            metrics["loss"] = spe_loss.compute_loss(pose, targets)
        decoded = spe_utils.decode(pose)
        metrics.update(spe_utils.score_batch(targets, decoded))
        return metrics, decoded

    return eval_step
