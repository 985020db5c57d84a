"""Regressor-noise vs PnP-sensitivity analysis for keypoints mode.

Separates the two error sources in the keypoints deployment path
(reference role: `src/spe/keypoints_utils.py` decode pipeline):

  1. **Regressor noise** — per-keypoint pixel error of the trained head
     against the ground-truth projections (RMSE / median / P90 + gross-
     outlier rate), measured on the test split.
  2. **PnP sensitivity** — ESA of decoding ground-truth keypoints corrupted
     with synthetic Gaussian pixel noise at sweep sigmas, through plain
     EPnP and RANSAC.

Putting the measured regressor sigma on the sensitivity curve predicts the
ESA the decode *should* produce; comparing with the model's actual ESA says
whether keypoints-mode accuracy is regressor-bound (predicted == actual) or
solver-bound (actual >> predicted).

Usage:
    python experiments/keypoint_noise.py --experiment experiments/train_synth/exp_keypoints_heatmap_synth \
        [--data /tmp/dspeed_syn/still] [--limit 512] [--out experiments/accuracy_suite/keypoint_noise.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_experiment(experiment: str, data_path: str | None):
    import jax.numpy as jnp  # noqa: F401  (jax init before flax)

    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.config.train_config import load_config
    from spef_tpu.data.camera import load_camera
    from spef_tpu.data.dataset import load_dataset
    from spef_tpu.models.wrapper import import_model

    cfg = load_config(os.path.join(experiment, "config.yaml"))
    data_path = data_path or cfg.DATA.PATH
    camera = load_camera(data_path)
    spe_utils = SPEUtils.create(
        camera, ori_mode=cfg.MODEL.HEAD.ORI, pos_mode=cfg.MODEL.HEAD.POS,
        use_keypoints=True,
    )
    data, split = load_dataset(data_path, batch_size=64,
                               img_size=tuple(cfg.DATA.IMG_SIZE))
    model = import_model(
        backbone_name=cfg.MODEL.BACKBONE.NAME,
        head_name=cfg.MODEL.HEAD.NAME,
        img_size=tuple(cfg.DATA.IMG_SIZE),
        params_path=os.path.join(experiment, "model", "parameters.msgpack"),
        residual=cfg.MODEL.BACKBONE.RESIDUAL,
        quantization=cfg.MODEL.QUANTIZATION,
        ori_mode=cfg.MODEL.HEAD.ORI,
        pos_mode=cfg.MODEL.HEAD.POS,
    )
    return spe_utils, model, data


def measure_regressor_noise(spe_utils, model, loader, limit: int):
    """Per-keypoint pixel errors of the head vs ground-truth projections."""
    import jax
    import jax.numpy as jnp

    kp = spe_utils.keypoints
    scale = np.asarray([kp.camera.nu, kp.camera.nv], np.float64)

    @jax.jit
    def predict_kp(images):
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        pred = model.apply(images, False)
        out = pred[0] if isinstance(pred, tuple) else pred
        return jax.nn.sigmoid(out)  # keypoints-mode last activation

    errs = []  # (N, M) per-frame per-point pixel distance
    preds, trues, oris, poss = [], [], [], []
    seen = 0
    for batch in loader:
        n_valid = int(batch["mask"].sum())
        pred = np.asarray(predict_kp(jnp.asarray(batch["images"])))[:n_valid]
        true = np.asarray(spe_utils.keypoints.create_keypoints2d(
            jnp.asarray(batch["ori"][:n_valid]), jnp.asarray(batch["pos"][:n_valid])))
        d = (pred.reshape(len(pred), -1, 2) - true.reshape(len(true), -1, 2)) * scale
        errs.append(np.linalg.norm(d, axis=-1))
        preds.append(pred)
        trues.append(true)
        oris.append(batch["ori"][:n_valid])
        poss.append(batch["pos"][:n_valid])
        seen += n_valid
        if limit and seen >= limit:
            break
    errs = np.concatenate(errs)
    flat = errs.ravel()
    sigma = float(np.sqrt(np.mean(flat**2) / 2.0))  # per-axis Gaussian sigma
    return {
        "frames": int(errs.shape[0]),
        "rmse_px": float(np.sqrt(np.mean(flat**2))),
        "median_px": float(np.median(flat)),
        "p90_px": float(np.percentile(flat, 90)),
        "max_px": float(flat.max()),
        "outlier_rate_3rmse": float(np.mean(flat > 3 * np.sqrt(np.mean(flat**2)))),
        "per_point_rmse_px": [float(v) for v in np.sqrt(np.mean(errs**2, axis=0))],
        "equiv_gaussian_sigma_px": sigma,
    }, (np.concatenate(preds), np.concatenate(trues),
        np.concatenate(oris), np.concatenate(poss))


def pnp_sensitivity(spe_utils, trues, oris, poss, sigmas, seed=0):
    """ESA of decoding ground-truth keypoints + Gaussian pixel noise."""
    import jax.numpy as jnp

    from spef_tpu.pose.score import score_batch

    kp = spe_utils.keypoints
    scale = np.asarray([kp.camera.nu, kp.camera.nv], np.float32)
    rng = np.random.RandomState(seed)
    curve = {}
    for s in sigmas:
        noisy = trues.reshape(len(trues), -1, 2) + \
            rng.normal(0.0, s, trues.reshape(len(trues), -1, 2).shape) / scale
        noisy = noisy.reshape(len(trues), -1).astype(np.float32)
        row = {}
        for mode, ransac in (("epnp", False), ("ransac", True)):
            pose = kp.decode_batch(jnp.asarray(noisy), ransac=ransac)
            sc = score_batch(jnp.asarray(oris), jnp.asarray(poss),
                             pose["ori"], pose["pos"])
            row[mode] = {k: float(v) for k, v in sc.items()}
        curve[f"{s:g}"] = row
        print(f"sigma={s:g}px: epnp esa={row['epnp']['esa_score']:.4f} "
              f"ransac esa={row['ransac']['esa_score']:.4f}")
    return curve


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--experiment", required=True)
    ap.add_argument("--data", default=None)
    ap.add_argument("--split", default="test")
    ap.add_argument("--limit", type=int, default=1024)
    ap.add_argument("--sigmas", type=float, nargs="*",
                    default=[0.5, 1.0, 2.0, 4.0, 8.0, 16.0])
    ap.add_argument("--out", default="experiments/accuracy_suite/keypoint_noise.json")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from spef_tpu.pose.score import score_batch

    spe_utils, model, data = load_experiment(args.experiment, args.data)
    noise, (preds, trues, oris, poss) = measure_regressor_noise(
        spe_utils, model, data[args.split], args.limit)
    print(f"regressor noise ({args.split}, {noise['frames']} frames): "
          f"rmse={noise['rmse_px']:.2f}px median={noise['median_px']:.2f}px "
          f"p90={noise['p90_px']:.2f}px sigma~{noise['equiv_gaussian_sigma_px']:.2f}px "
          f"outliers>{3 * noise['rmse_px']:.0f}px: {noise['outlier_rate_3rmse']:.3%}")

    # Actual model ESA through both decodes on the same frames.
    actual = {}
    for mode, ransac in (("epnp", False), ("ransac", True)):
        pose = spe_utils.keypoints.decode_batch(jnp.asarray(preds), ransac=ransac)
        sc = score_batch(jnp.asarray(oris), jnp.asarray(poss), pose["ori"], pose["pos"])
        actual[mode] = {k: float(v) for k, v in sc.items()}
        print(f"model {mode}: esa={actual[mode]['esa_score']:.4f} "
              f"ori={actual[mode]['ori_error']:.2f}deg pos={actual[mode]['pos_error']:.3f}m")

    curve = pnp_sensitivity(spe_utils, trues, oris, poss, args.sigmas)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    payload = {"experiment": args.experiment, "split": args.split,
               "regressor_noise": noise, "actual": actual,
               "pnp_sensitivity": curve}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
