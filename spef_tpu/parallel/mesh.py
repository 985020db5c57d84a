"""Device mesh + sharding helpers.

The reference is single-device (SURVEY.md §2.3); its only "distribution" is
SSH/RPC/TCP to embedded boards.  The TPU-native equivalent is a
``jax.sharding.Mesh`` over the slice with implicit XLA collectives:

  * training: batch-sharded data parallelism (params replicated, gradient
    ``psum`` over ICI inserted by XLA);
  * throughput eval / serving: the same batch sharding fans frames out over
    all chips.

These helpers centralize mesh creation and the shardings used by the train
and predict paths so CPU-emulated meshes (tests, ``dryrun_multichip``) and
real slices share code.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch", "DATA_AXIS"]

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over (up to) all local devices."""
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, f"need {n_devices} devices, have {len(devices)}"
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Batch-dimension sharding (leading axis split over the mesh)."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any, axis_name: str = DATA_AXIS) -> Any:
    """Device-put a host batch with its leading axis sharded over the mesh."""
    sharding = data_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
