"""Serving runtime: multi-chip batched pose inference.

The reference deploys to embedded boards over ad-hoc transports — paramiko
SSH/SFTP (`/root/reference/src/finn/finn_deploy.py:10-180`), a TVM RPC
tracker (`src/tvm/rpc_handler.py:14-153`), and a 4-byte length-prefixed
pickle TCP protocol to a Jetson server
(`src/nvidia/{ssh_deploy,jetson_inference_server}.py`).  On a TPU slice
none of that transport machinery exists: deployment IS the compiled
program, and scale-out is the mesh (SURVEY.md §2.3).

This module is the serving-side runtime:

  * :class:`PoseServer` — owns a jitted predict program sharded over all
    local chips (batch split over the ``data`` mesh axis), with a
    fixed-size batch window (pad+mask) so one compiled program serves any
    request size, double-buffered host->device feeding, and latency stats;
  * :func:`serve_stream` — pipelined streaming inference over an iterator
    of frame batches (dispatch ahead, block late) — the pattern that hits
    device-throughput numbers instead of host-RTT numbers.
"""

from __future__ import annotations

import collections
import time
from typing import Callable, Dict, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spef_tpu.parallel.mesh import data_sharding, make_mesh, replicated

__all__ = ["PoseServer", "serve_stream"]


class PoseServer:
    """Batched pose-inference server over the local device mesh."""

    def __init__(
        self,
        predict_fn: Callable,  # images (B, H, W, C) -> pose dict
        img_shape: Tuple[int, int, int],
        max_batch: int = 256,
        mesh=None,
    ):
        self.mesh = mesh or make_mesh()
        self.max_batch = max_batch
        self.img_shape = tuple(img_shape)
        self._in_sharding = data_sharding(self.mesh)
        self._out_sharding = data_sharding(self.mesh)

        self._predict = jax.jit(
            predict_fn,
            in_shardings=self._in_sharding,
            out_shardings=self._out_sharding,
        )
        self._latencies = collections.deque(maxlen=1000)

    def warmup(self) -> float:
        """Compile the serving program; returns compile seconds."""
        dummy = np.zeros((self.max_batch, *self.img_shape), np.uint8)
        t0 = time.perf_counter()
        jax.block_until_ready(self._predict(jnp.asarray(dummy)))
        return time.perf_counter() - t0

    def predict(self, images: np.ndarray) -> Tuple[Dict[str, np.ndarray], float]:
        """Serve one request (any batch size <= max_batch); pads to the
        compiled window, returns host numpy results + latency ms."""
        n = images.shape[0]
        assert n <= self.max_batch, f"batch {n} > serving window {self.max_batch}"
        if n < self.max_batch:
            pad = np.zeros((self.max_batch - n, *self.img_shape), images.dtype)
            images = np.concatenate([images, pad])
        t0 = time.perf_counter()
        out = self._predict(jnp.asarray(images))
        out = jax.block_until_ready(out)
        latency_ms = (time.perf_counter() - t0) * 1e3
        self._latencies.append(latency_ms)
        return {k: np.asarray(v)[:n] for k, v in out.items()}, latency_ms

    def stats(self) -> Dict[str, float]:
        lat = np.asarray(self._latencies) if self._latencies else np.zeros(1)
        return {
            "p50_ms": float(np.percentile(lat, 50)),
            "p95_ms": float(np.percentile(lat, 95)),
            "mean_ms": float(lat.mean()),
            "requests": len(self._latencies),
            "devices": len(self.mesh.devices.flatten()),
        }


def serve_stream(
    predict_fn: Callable,
    batches: Iterable[np.ndarray],
    depth: int = 2,
) -> Iterator[Dict[str, jax.Array]]:
    """Pipelined streaming inference: keep ``depth`` batches in flight.

    Dispatch is async; results are yielded in order once ready.  This
    overlaps host feeding (and any host<->device tunnel latency) with
    device execution — the throughput-serving pattern.
    """
    fn = jax.jit(predict_fn)
    queue: collections.deque = collections.deque()
    for batch in batches:
        queue.append(fn(jnp.asarray(batch)))
        if len(queue) >= depth:
            yield jax.block_until_ready(queue.popleft())
    while queue:
        yield jax.block_until_ready(queue.popleft())
