"""AOT deployment artifacts: serialize the compiled inference program.

The reference's build toolchains all end in a deployable compiled
artifact — the FINN bitfile + PYNQ driver package
(`/root/reference/build_finn.py:185-213`), TVM's `lib.tar`
(`build_tvm.py:211`, `src/tvm/tvm_compiler.py:119-121`) and the
TorchScript/TensorRT engine (`build_nvidia.py:311-325`).  The TPU-native
equivalent is a **serialized StableHLO program** (``jax.export``): the
whole predict pipeline — uint8 preprocess -> CNN (float or int8 executor)
-> final activation -> on-device decode — exported as one portable,
version-checked artifact that loads and runs WITHOUT the Python model
definition, the weight files, or re-tracing the source graph.  Exporting
for ``platforms=("tpu", "cpu")`` produces a single artifact that serves on
the chip and still executes (slowly) on a CPU host for parity checks.

Artifact layout (a single ``.spef`` zip):

    program.stablehlo   jax.export serialization (weights embedded)
    meta.json           batch/img_size/dtype/platforms/outputs/jax version
"""

from __future__ import annotations

import json
import time
import zipfile
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

__all__ = ["export_predict", "load_exported", "ExportedEngine"]

_PROGRAM = "program.stablehlo"
_META = "meta.json"


def export_predict(
    predict_fn: Callable,
    batch: int,
    img_size: Tuple[int, int],
    out_path: str,
    platforms: Sequence[str] = ("tpu", "cpu"),
    dtype=jnp.uint8,
    extra_meta: Optional[Dict] = None,
) -> Dict:
    """Export ``predict_fn(images) -> pose dict`` to a ``.spef`` artifact.

    ``predict_fn`` is any jittable pipeline (``engine.build_predict_fn``
    output, or an int8 executor wrapped by it).  Shapes are static:
    ``(batch, *img_size, 3)`` — the loader pads smaller requests, the same
    fixed-window contract as :class:`spef_tpu.serving.PoseServer`.
    """
    spec = jax.ShapeDtypeStruct((batch, *img_size, 3), dtype)
    exported = jax_export.export(jax.jit(predict_fn), platforms=tuple(platforms))(spec)
    blob = exported.serialize()

    probe = jax.eval_shape(predict_fn, spec)
    meta = {
        "format": "spef-export-v1",
        "batch": int(batch),
        "img_size": [int(img_size[0]), int(img_size[1])],
        "dtype": np.dtype(dtype).name,
        "platforms": list(platforms),
        "outputs": {k: [int(d) for d in v.shape] for k, v in probe.items()},
        "jax_version": jax.__version__,
        "created": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    if extra_meta:
        meta.update(extra_meta)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_PROGRAM, blob)
        zf.writestr(_META, json.dumps(meta, indent=2))
    return meta


class ExportedEngine:
    """Duck-types ``SPEJax.predict`` over a loaded ``.spef`` artifact.

    ``predict(images) -> (pose dict, latency ms)`` for any request with
    ``n <= batch`` images: the request is zero-padded to the exported
    window and outputs are trimmed back (reference serving contract,
    `jetson_inference_server.py:50-154`).
    """

    def __init__(self, exported, meta: Dict):
        self._exported = exported
        self.meta = meta
        # NOTE: exported.call is already a compiled-program invocation —
        # wrapping it in jax.jit re-traces the whole deserialized module
        # and segfaults XLA:CPU on full-size programs (observed at
        # 8x240x384; fine at toy sizes).  Call it directly.
        self._call = exported.call

    @property
    def batch(self) -> int:
        return self.meta["batch"]

    def predict(self, images) -> Tuple[Dict[str, jax.Array], float]:
        images = np.asarray(images)
        n = images.shape[0]
        b = self.meta["batch"]
        if n > b:
            raise ValueError(f"request batch {n} > exported window {b}")
        if n < b:
            pad = np.zeros((b - n, *images.shape[1:]), images.dtype)
            images = np.concatenate([images, pad])
        start = time.perf_counter()
        pose = self._call(jnp.asarray(images))
        pose = jax.block_until_ready(pose)
        latency_ms = (time.perf_counter() - start) * 1000.0
        if n < b:
            pose = {k: v[:n] for k, v in pose.items()}
        return pose, latency_ms


def load_exported(path: str) -> ExportedEngine:
    """Load a ``.spef`` artifact into a runnable engine."""
    with zipfile.ZipFile(path) as zf:
        blob = zf.read(_PROGRAM)
        meta = json.loads(zf.read(_META))
    # jaxlib registers the LAPACK custom-call (FFI) handlers lazily when a
    # linalg op is first TRACED in the process.  A deserialized program is
    # never traced, so on CPU the decode stage's eigh custom call would hit
    # an unregistered handler and segfault (reproduced: any artifact with
    # decode=True, fresh process, jax 0.9).  Trace one tiny eigh to force
    # the registration before the program runs.
    jax.block_until_ready(jnp.linalg.eigh(jnp.eye(2, dtype=jnp.float32)))
    exported = jax_export.deserialize(blob)
    return ExportedEngine(exported, meta)
