"""End-to-end throughput benchmark: uint8 256x256 frames -> 6-DoF pose.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Pipeline measured (the BASELINE.json north-star config): fused
preprocess (uint8 -> float normalize) + MobileNetV2 backbone + URSONet
soft-classification head + softmax + histogram decode (batched eigh), all
one XLA program on a single chip.  vs_baseline is against the 20k fps/chip
target from BASELINE.md.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_FPS = 20_000.0
BATCH = 256  # best operating point from the batch sweep (256/512/1024)
IMG = 256
WARMUP = 3
ITERS = 20


def main():
    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.data.camera import SPEED_CAMERA
    from spef_tpu.engine import build_predict_fn
    from spef_tpu.models.wrapper import import_model

    spe_utils = SPEUtils.create(
        SPEED_CAMERA,
        ori_mode="classification",
        pos_mode="classification",
        use_keypoints=False,
    )
    model = import_model(
        backbone_name="mobilenet_v2",
        head_name="ursonet",
        img_size=(IMG, IMG),
        ori_mode="classification",
        n_ori_bins=spe_utils.orientation.n_bins,
        pos_mode="classification",
        n_pos_bins=spe_utils.position.n_bins,
    )
    predict = jax.jit(build_predict_fn(model, spe_utils))

    rng = np.random.RandomState(1001)
    frames = jnp.asarray(rng.randint(0, 256, (BATCH, IMG, IMG, 3), dtype=np.uint8))

    for _ in range(WARMUP):
        jax.block_until_ready(predict(frames))

    start = time.perf_counter()
    for _ in range(ITERS):
        out = predict(frames)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    fps = BATCH * ITERS / elapsed
    print(
        json.dumps(
            {
                "metric": "frames/sec/chip (preprocess->pose, fp/bf16 float path)",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / TARGET_FPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
