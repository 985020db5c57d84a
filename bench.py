"""End-to-end throughput benchmark: uint8 256x256 frames -> 6-DoF pose.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Pipeline measured (the BASELINE.json north-star config): the QUANTIZED
deployment path — the boundary-recipe QAT graph (int8 activations at every
block boundary, real-valued interiors; integer weights on the
bit_width-schema mixed-precision grid) executed by the int8-carry
formulation (`spef_tpu.quant.int8_carry.build_int8_carry_forward`): fused
preprocess (uint8 normalize) + MobileNetV2 + URSONet soft-classification
heads + softmax + histogram decode (batched eigh), one XLA program, one
chip.  vs_baseline is against the 20k fps/chip target from BASELINE.md.

Why boundary-carry: activations cross HBM as int8 on their quantization
grids (half the bf16 bytes on a roofline-bound network) and the arithmetic
is exact integer via bf16 operands + f32 accumulation — this is the
fastest measured mode (30.0k fps r3, benchmarks/bench_paths.py) AND it is
bit-exact with the fused Pallas deployment executor (parity 0.0).  The
weight-only bf16 mode (~29k, the r1/r2 headline) remains the fallback if
the boundary graph cannot build.

Iterations are CHAINED (frame i+1 depends on output i): repeated async
calls on identical inputs get coalesced by this environment's remote
execution relay, so unchained loops overreport (PERFORMANCE.md
"measurement gotcha").
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

try:  # persistent compile cache: repeated driver runs skip the slow compile
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
except Exception:
    pass

TARGET_FPS = 20_000.0
BATCH = 256  # best operating point from the batch sweep (256/512/1024)
IMG = 256
WARMUP = 3
ITERS = 20


def build_predict():
    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.data.camera import SPEED_CAMERA
    from spef_tpu.models.wrapper import import_model
    from spef_tpu.quant.convert import convert_qat_params

    spe_utils = SPEUtils.create(
        SPEED_CAMERA,
        ori_mode="classification",
        pos_mode="classification",
        use_keypoints=False,
    )
    kw = dict(
        backbone_name="mobilenet_v2_q",
        head_name="ursonet_q",
        img_size=(IMG, IMG),
        ori_mode="classification",
        n_ori_bins=spe_utils.orientation.n_bins,
        pos_mode="classification",
        n_pos_bins=spe_utils.position.n_bins,
    )
    try:
        from spef_tpu.quant.bitwidth import boundary_bit_width
        from spef_tpu.quant.int8_carry import build_int8_carry_forward

        graph = convert_qat_params(import_model(bit_width=boundary_bit_width(), **kw))
        forward = build_int8_carry_forward(graph)
        label = "boundary-recipe int8-carry exec"
    except Exception:  # keep the headline alive if the boundary graph breaks
        from spef_tpu.quant.int8_model import build_weight_only_forward

        graph = convert_qat_params(import_model(**kw))
        forward = build_weight_only_forward(graph)
        label = "weight-only bf16 exec (fallback)"

    def predict(frames):
        pred = forward(frames)
        pose = spe_utils.last_activ({"ori_soft": pred[0], "pos_soft": pred[1]})
        out = spe_utils.decode(pose)
        # Data-dependent perturbation chains iterations (a unit-quaternion
        # component is never 2.0 -> dep == 1 always, but the compiler cannot
        # know that), so the relay cannot coalesce repeated calls.
        dep = (out["ori"][0, 0] != 2.0).astype(jnp.uint8)
        return frames + dep, out

    return jax.jit(predict), label


def main():
    predict, label = build_predict()

    rng = np.random.RandomState(1001)
    frames = jnp.asarray(rng.randint(0, 256, (BATCH, IMG, IMG, 3), dtype=np.uint8))

    out = None
    for _ in range(WARMUP):
        frames, out = predict(frames)
    jax.block_until_ready(out)

    start = time.perf_counter()
    for _ in range(ITERS):
        frames, out = predict(frames)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    fps = BATCH * ITERS / elapsed
    print(
        json.dumps(
            {
                "metric": f"frames/sec/chip (preprocess->pose, QAT-quantized, {label})",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / TARGET_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
