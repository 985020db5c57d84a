"""SPEJax — the unified on-TPU inference engine.

The reference duck-types one engine per deployment target, all exposing
``predict(images) -> (pose, latency_ms)``:
``SPETorch`` (`/root/reference/src/spe/spe_torch.py:41-76`), ``SPETVMARM``
(`src/tvm/spe_tvm.py:45-86`), ``SPEFinn`` (`src/finn/spe_finn.py:48-165`)
and ``SPEJetson`` (`src/nvidia/spe_nvidia.py:105-137`).  On TPU a single
engine subsumes all of them: the whole pipeline

    uint8 image -> normalize -> CNN -> last activation -> decode -> pose

is one XLA program.  The float path runs the flax model in bfloat16; the
int8 path (see :mod:`spef_tpu.quant`) swaps in the quantized forward.
Decoding (soft-class eigendecomposition / EPnP) stays on device — no
per-batch host round-trip like the reference's numpy decode.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from spef_tpu.codec.facade import SPEUtils
from spef_tpu.models.wrapper import SPEModel

__all__ = ["SPEJax", "SPECropRefine", "build_predict_fn"]


def _raw_to_pose(spe_utils: SPEUtils, pred) -> Dict[str, jax.Array]:
    """Map raw network outputs to the pose dict keys used everywhere.

    Mirrors `spe_torch.py:63-71`: tuple outputs map to (ori|ori_soft,
    pos|pos_soft); single output maps to keypoints.
    """
    if spe_utils.ori_mode == "keypoints" and spe_utils.pos_mode == "keypoints":
        return {"keypoints": pred if not isinstance(pred, tuple) else pred[0]}
    out: Dict[str, jax.Array] = {}
    ori_key = "ori" if spe_utils.ori_mode == "regression" else "ori_soft"
    pos_key = "pos" if spe_utils.pos_mode == "regression" else "pos_soft"
    out[ori_key] = pred[0]
    out[pos_key] = pred[1]
    return out


def build_predict_fn(
    model: SPEModel,
    spe_utils: SPEUtils,
    decode: bool = True,
    forward_fn: Optional[Callable] = None,
) -> Callable[[jax.Array], Dict[str, jax.Array]]:
    """Build the fused (preprocess -> forward -> activ -> decode) function.

    ``forward_fn(images) -> raw outputs`` defaults to the float model apply;
    the int8 path passes its own.  The returned function is pure and
    jittable; images are NHWC, either uint8 [0,255] or float [0,1].
    """
    variables = model.variables

    def default_forward(images):
        return model.module.apply(variables, images, False)

    fwd = forward_fn or default_forward

    def predict(images: jax.Array) -> Dict[str, jax.Array]:
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        pred = fwd(images)
        pose = _raw_to_pose(spe_utils, pred)
        pose = spe_utils.last_activ(pose)
        if decode:
            pose = spe_utils.decode(pose)
        return pose

    return predict


class SPEJax:
    """Stateful engine wrapper with the reference's ``predict`` contract."""

    def __init__(
        self,
        model: SPEModel,
        spe_utils: SPEUtils,
        decode: bool = True,
        forward_fn: Optional[Callable] = None,
        donate: bool = False,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — input batches are
        sharded over the leading axis so evaluation/serving throughput fans
        out across all chips (SURVEY.md §2.3's batch-sharded eval)."""
        self.model = model
        self.spe_utils = spe_utils
        self.mesh = mesh
        self._decode = decode
        self._forward_fn = forward_fn
        self._donate = donate
        self._predict = self._compile()

    def _compile(self):
        donate = (0,) if self._donate else ()
        return jax.jit(
            build_predict_fn(self.model, self.spe_utils, self._decode, self._forward_fn),
            donate_argnums=donate,
        )

    def predict(self, images) -> Tuple[Dict[str, jax.Array], float]:
        """Run inference; returns (pose dict, wall latency in ms).

        Matches `spe_torch.py:41-76`: latency covers dispatch + device
        execution (block_until_ready), the pose dict holds device arrays
        (callers convert with np.asarray when needed).
        """
        if self.mesh is not None:
            from spef_tpu.parallel.mesh import shard_batch

            images = shard_batch(self.mesh, jnp.asarray(images))
        else:
            images = jnp.asarray(images)
        start = time.perf_counter()
        pose = self._predict(images)
        pose = jax.block_until_ready(pose)
        latency_ms = (time.perf_counter() - start) * 1000.0
        return pose, latency_ms

    def update_model(self, model: SPEModel, forward_fn: Optional[Callable] = None) -> None:
        """Swap model weights (reference `spe_torch.py:78-97`).

        Preserves the constructor's ``decode``/``donate``/``mesh`` options
        and, unless a replacement ``forward_fn`` is given, the original
        forward path — so swapping weights on an int8 engine does NOT
        silently revert it to the float path.  Engines whose forward closes
        over converted weights (the int8/weight-only paths) must pass the
        rebuilt ``forward_fn`` for the swap to take effect.
        """
        self.model = model
        if forward_fn is not None:
            self._forward_fn = forward_fn
        self._predict = self._compile()


class SPECropRefine:
    """Two-pass crop-refine keypoints engine — same ``predict`` contract.

    Fuses the full two-stage pipeline (coarse full-frame keypoints ->
    robust crop box -> on-device matmul-form crop+resize -> fine pass ->
    back-mapped keypoints -> PnP decode, :mod:`spef_tpu.codec.crop`) into
    ONE jitted XLA program.  Deployment-wise this is the successor of the
    reference's single-pass keypoints engine (`spe_torch.py:41-76` +
    `keypoints_utils.py:112-174`): at SPEED geometry the crop multiplies
    the fine regressor's effective resolution by the zoom factor, which is
    the binding accuracy constraint (ACCURACY.md "Regressor noise vs PnP
    sensitivity").  Serving/GUI/temporal consumers duck-type it like any
    other engine.
    """

    def __init__(
        self,
        coarse: SPEModel,
        fine: SPEModel,
        spe_utils: SPEUtils,
        crop_hw: Optional[Tuple[int, int]] = None,
        margin: float = 1.5,  # see CropRefinePipeline.margin (codec/crop.py)
        gate: Optional[float] = 0.02,  # coarse-consistency fallback (codec/crop.py::gate_keypoints)
        decode: bool = True,
        mesh=None,
    ):
        assert spe_utils.ori_mode == "keypoints" and spe_utils.pos_mode == "keypoints", (
            "crop-refine is a keypoints-mode pipeline")
        from spef_tpu.codec.crop import CropRefinePipeline

        self.coarse = coarse
        self.fine = fine
        self.spe_utils = spe_utils
        self.mesh = mesh

        coarse_vars, fine_vars = coarse.variables, fine.variables

        def coarse_fn(images):
            out = coarse.module.apply(coarse_vars, images, False)
            return out[0] if isinstance(out, tuple) else out

        def fine_fn(images):
            out = fine.module.apply(fine_vars, images, False)
            return out[0] if isinstance(out, tuple) else out

        pipe = CropRefinePipeline(coarse_fn, fine_fn, margin=margin, gate=gate)

        def predict(images):
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 255.0
            if crop_hw is None:
                pipe.crop_hw = images.shape[1:3]
            pose = pipe(images)
            if decode:
                pose.update(spe_utils.keypoints.decode_batch(
                    pose["keypoints"], ransac=spe_utils.keypoints_ransac,
                    border_gate=spe_utils.keypoints_border_gate))
            return pose

        self._predict = jax.jit(predict)

    def predict(self, images) -> Tuple[Dict[str, jax.Array], float]:
        if self.mesh is not None:
            from spef_tpu.parallel.mesh import shard_batch

            images = shard_batch(self.mesh, jnp.asarray(images))
        else:
            images = jnp.asarray(images)
        start = time.perf_counter()
        pose = self._predict(images)
        pose = jax.block_until_ready(pose)
        latency_ms = (time.perf_counter() - start) * 1000.0
        return pose, latency_ms


# ---------------------------------------------------------------------------
# Engine variants from experiment artifacts
# ---------------------------------------------------------------------------

def discover_engine_variants(exp_dir: str):
    """Engine variants available for an experiment directory.

    The reference hot-switches inference targets at runtime
    (`/root/reference/gui.py:470-474`, `src/temporal/inference.py:46-80`);
    here the targets are the float model, the two int8 executors built from
    ``int8_graph.pkl`` (apps.build_int8), and a compiled ``.spef`` export
    (apps.export).
    """
    import os

    variants = ["float"]
    if os.path.isfile(os.path.join(exp_dir, "int8_graph.pkl")):
        variants += ["weight-only", "int8-carry"]
    if os.path.isfile(os.path.join(exp_dir, "model.spef")):
        variants.append("exported")
    # A `crop_refine.json` pointer ({"fine_exp": <dir>}) marks the two-pass
    # pipeline: this experiment is the coarse pass, fine_exp the crop model.
    ptr = os.path.join(exp_dir, "crop_refine.json")
    if os.path.isfile(ptr):
        import json

        try:
            with open(ptr) as f:
                fine = json.load(f).get("fine_exp", "")
            if os.path.isfile(os.path.join(fine, "model", "parameters.msgpack")):
                # Both two-pass variants: float, and weight-only int8 (both
                # pass models' kernels snapped to per-channel int8 grids —
                # quant/weight_only.py; the schema-free quantization mode
                # for the keypoints model family).
                variants += ["crop-refine", "crop-refine-w8"]
        except (OSError, ValueError):
            pass
    return variants


def build_engine_variant(exp_dir: str, model: SPEModel, spe_utils: SPEUtils,
                         variant: str = "float", mesh=None):
    """Build a ``predict``-contract engine for a variant of an experiment.

    ``float`` runs the flax model; ``weight-only``/``int8-carry`` close over
    the experiment's converted ``int8_graph.pkl``; ``exported`` loads the
    precompiled ``model.spef`` artifact (ignores ``model``).
    """
    import os

    if variant == "exported":
        from spef_tpu.deploy import load_exported

        return load_exported(os.path.join(exp_dir, "model.spef"))
    if variant in ("crop-refine", "crop-refine-w8"):
        import json

        from spef_tpu.config.train_config import load_config
        from spef_tpu.models.wrapper import import_model

        with open(os.path.join(exp_dir, "crop_refine.json")) as f:
            reg = json.load(f)
        fine_exp = reg["fine_exp"]
        # Deployed gate tau travels with the registry pointer (tuned on the
        # VALID split by experiments/crop_refine_eval.py --split valid).
        gate = reg.get("gate", 0.02)
        fine_cfg = load_config(os.path.join(fine_exp, "config.yaml"))
        fine_model = import_model(
            backbone_name=fine_cfg.MODEL.BACKBONE.NAME,
            head_name=fine_cfg.MODEL.HEAD.NAME,
            img_size=tuple(fine_cfg.DATA.IMG_SIZE),
            params_path=os.path.join(fine_exp, "model", "parameters.msgpack"),
            residual=fine_cfg.MODEL.BACKBONE.RESIDUAL,
            quantization=fine_cfg.MODEL.QUANTIZATION,
            ori_mode=fine_cfg.MODEL.HEAD.ORI,
            pos_mode=fine_cfg.MODEL.HEAD.POS,
        )
        if variant == "crop-refine-w8":
            import dataclasses

            from spef_tpu.quant.weight_only import quantize_model_weights

            # Copy the coarse model: the caller's float SPEModel (shared
            # with the 'float' variant) must not be mutated.
            model = dataclasses.replace(
                model, variables=quantize_model_weights(model.variables, 8)[0])
            fine_model.variables, _ = quantize_model_weights(
                fine_model.variables, bits=8)
        return SPECropRefine(model, fine_model, spe_utils,
                             crop_hw=tuple(fine_cfg.DATA.IMG_SIZE),
                             gate=gate, mesh=mesh)
    forward_fn = None
    if variant in ("weight-only", "int8-carry"):
        import pickle

        with open(os.path.join(exp_dir, "int8_graph.pkl"), "rb") as f:
            graph = pickle.load(f)
        graph = jax.tree_util.tree_map(
            lambda v: v.item() if getattr(v, "ndim", 1) == 0 else v, graph)
        if variant == "weight-only":
            from spef_tpu.quant.int8_model import build_weight_only_forward

            forward_fn = build_weight_only_forward(graph)
        else:
            from spef_tpu.quant.int8_carry import build_int8_carry_forward

            forward_fn = build_int8_carry_forward(graph)
    elif variant != "float":
        raise KeyError(f"unknown engine variant {variant!r}")
    return SPEJax(model, spe_utils, forward_fn=forward_fn, mesh=mesh)
