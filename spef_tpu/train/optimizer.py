"""Optimizer / LR-schedule factory — optax.

Counterpart of `/root/reference/src/solver/optimizer.py:10-75`: SGD (with
momentum) or Adam, scheduled by MultiStepLR (piecewise-constant decay at
epoch milestones) or ReduceLROnPlateau.

MultiStepLR is expressed as an optax ``piecewise_constant_schedule`` over
*epochs*; the trainer passes the epoch count as the schedule step so the
semantics match torch's per-epoch ``scheduler.step()``.  Plateau mode keeps
a small host-side state (best loss + patience counter) mirrored from
torch's ReduceLROnPlateau.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import optax

__all__ = ["import_optimizer", "PlateauScheduler", "MultiStepScheduler"]


@dataclasses.dataclass
class MultiStepScheduler:
    """lr(epoch) = lr0 * gamma^(#milestones passed)."""

    base_lr: float
    milestones: Sequence[int]
    gamma: float
    lr: float = None  # type: ignore[assignment]

    def __post_init__(self):
        self.lr = self.base_lr

    def step(self, epoch: int, metric: Optional[float] = None) -> float:
        passed = sum(1 for m in self.milestones if epoch >= m)
        self.lr = self.base_lr * (self.gamma**passed)
        return self.lr


@dataclasses.dataclass
class PlateauScheduler:
    """ReduceLROnPlateau(min): decay lr by gamma after `patience` epochs
    without improvement."""

    base_lr: float
    patience: int
    gamma: float
    best: float = float("inf")
    bad_epochs: int = 0
    lr: float = None  # type: ignore[assignment]

    def __post_init__(self):
        self.lr = self.base_lr

    def step(self, epoch: int, metric: Optional[float] = None) -> float:
        if metric is None:
            return self.lr
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = self.lr * self.gamma
                self.bad_epochs = 0
        return self.lr


def import_optimizer(
    learning_rate: float = 0.01,
    optimizer: str = "SGD",
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    scheduler: str = "MultiStepLR",
    milestones: Tuple[int, ...] = (5, 15),
    gamma: float = 0.1,
):
    """Build (optax optimizer driven by a mutable lr, scheduler object).

    The returned optax transform reads its learning rate from
    ``inject_hyperparams`` state so the host-side scheduler can update it
    between epochs (matching torch scheduler semantics).
    """
    assert optimizer in ("SGD", "Adam")
    assert scheduler in ("OnPlateau", "MultiStepLR")

    if optimizer == "SGD":
        base = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
                optax.sgd(learning_rate, momentum=momentum),
            )
        )(learning_rate=learning_rate)
    else:
        base = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
                optax.adam(learning_rate),
            )
        )(learning_rate=learning_rate)

    if scheduler == "MultiStepLR":
        sched = MultiStepScheduler(base_lr=learning_rate, milestones=milestones, gamma=gamma)
    else:
        sched = PlateauScheduler(base_lr=learning_rate, patience=milestones[0], gamma=gamma)

    return base, sched


def set_learning_rate(opt_state, lr: float):
    """Write a new learning rate into an inject_hyperparams optimizer state."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state
