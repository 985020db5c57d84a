"""Soft-classification codec ablation study.

Counterpart of `/root/reference/soft_class_plot.py` (726 LoC): sweeps
(n_bins_per_dim x smooth_factor) over a pose grid and measures the
encode->decode round-trip error of the orientation and position codecs —
the characterization test of the codec's quantization error — plus the
frame-to-frame PDF L2 distances used to tune the TemporalPDF alpha
(`soft_class_plot.py:426-492`).

TPU-native: each (n_bins, smooth) cell encodes/decodes the whole pose set
as batched matmuls + eigh (the reference parallelizes per-cell with a
ThreadPoolExecutor of python loops).

Usage:
    python -m spef_tpu.apps.soft_class_study --out experiments/soft_class \
        [--n-poses 512] [--ori-bins 8 10 12 16] [--ori-smooth 1 2 3 4 5]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def ori_roundtrip_error(n_bins: int, smooth: float, quats) -> float:
    import jax.numpy as jnp

    from spef_tpu.codec.softclass import OrientationSoftClassification
    from spef_tpu.pose.rotations import quat_angle

    codec = OrientationSoftClassification.create(n_bins, smooth, delete_unused_bins=True)
    dec, _ = codec.decode(codec.encode(quats))
    return float(jnp.rad2deg(jnp.mean(quat_angle(quats, dec))))


def pos_roundtrip_error(n_bins: int, smooth: float, poss) -> float:
    import jax.numpy as jnp

    from spef_tpu.codec.softclass import PositionSoftClassification

    codec = PositionSoftClassification.create(n_bins, smooth)
    dec = codec.decode(codec.encode(poss))
    return float(jnp.mean(jnp.linalg.norm(dec - poss, axis=-1)))


def pdf_frame_distances(n_bins: int, smooth: float, quats_seq) -> np.ndarray:
    """L2 distance between consecutive-frame encodings (alpha tuning)."""
    import jax.numpy as jnp

    from spef_tpu.codec.softclass import OrientationSoftClassification

    codec = OrientationSoftClassification.create(n_bins, smooth, delete_unused_bins=True)
    pdfs = codec.encode(quats_seq)
    return np.asarray(jnp.linalg.norm(pdfs[1:] - pdfs[:-1], axis=-1))


def plot_heatmap(matrix, xs, ys, xlabel, ylabel, title, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    im = ax.imshow(matrix, aspect="auto", origin="lower", cmap="viridis")
    ax.set_xticks(range(len(xs)), [str(x) for x in xs])
    ax.set_yticks(range(len(ys)), [str(y) for y in ys])
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    for i in range(len(ys)):
        for j in range(len(xs)):
            ax.text(j, i, f"{matrix[i, j]:.2f}", ha="center", va="center",
                    color="w", fontsize=8)
    fig.colorbar(im)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from spef_tpu.pose.rotations import euler2quat, generate_orientation, multiply_quaternions

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="experiments/soft_class")
    parser.add_argument("--n-poses", type=int, default=512)
    parser.add_argument("--ori-bins", type=int, nargs="*", default=[8, 10, 12, 16])
    parser.add_argument("--ori-smooth", type=float, nargs="*", default=[1, 2, 3, 4, 5])
    parser.add_argument("--pos-bins", type=int, nargs="*", default=[8, 10, 12, 16])
    parser.add_argument("--pos-smooth", type=float, nargs="*", default=[50, 100, 150, 200])
    parser.add_argument("--seed", type=int, default=1001)
    args = parser.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    quats = generate_orientation(key, args.n_poses)
    rng = np.random.RandomState(args.seed)
    poss = jnp.asarray(
        np.stack([rng.uniform(-8, 8, args.n_poses), rng.uniform(-6, 6, args.n_poses),
                  rng.uniform(3, 33, args.n_poses)], axis=-1).astype(np.float32)
    )

    results = {"ori": {}, "pos": {}}
    ori_mat = np.zeros((len(args.ori_smooth), len(args.ori_bins)))
    for i, s in enumerate(args.ori_smooth):
        for j, b in enumerate(args.ori_bins):
            err = ori_roundtrip_error(b, s, quats)
            ori_mat[i, j] = err
            results["ori"][f"bins={b},smooth={s}"] = err
            print(f"ori bins={b:3d} smooth={s:5.1f}: roundtrip err {err:7.3f} deg")

    pos_mat = np.zeros((len(args.pos_smooth), len(args.pos_bins)))
    for i, s in enumerate(args.pos_smooth):
        for j, b in enumerate(args.pos_bins):
            err = pos_roundtrip_error(b, s, poss)
            pos_mat[i, j] = err
            results["pos"][f"bins={b},smooth={s}"] = err
            print(f"pos bins={b:3d} smooth={s:5.1f}: roundtrip err {err:7.3f} m")

    plot_heatmap(ori_mat, args.ori_bins, args.ori_smooth, "bins/dim", "smooth factor",
                 "Orientation codec round-trip error [deg]",
                 os.path.join(args.out, "ori_roundtrip_heatmap.png"))
    plot_heatmap(pos_mat, args.pos_bins, args.pos_smooth, "bins/dim", "smooth factor",
                 "Position codec round-trip error [m]",
                 os.path.join(args.out, "pos_roundtrip_heatmap.png"))

    # PDF frame-to-frame distance trace for a synthetic tumble (alpha tuning).
    dq = euler2quat(jnp.asarray([0.24, 0.107, 0.215]))
    seq = [jnp.asarray([1.0, 0.0, 0.0, 0.0])]
    for _ in range(199):
        seq.append(multiply_quaternions(seq[-1], dq))
    dist = pdf_frame_distances(12, 3, jnp.stack(seq))
    results["pdf_distance"] = {
        "mean": float(dist.mean()), "std": float(dist.std()),
        "suggested_alpha": float(np.log(2) / max(dist.mean(), 1e-9)),
    }
    print(f"frame-to-frame PDF L2: mean={dist.mean():.4f} std={dist.std():.4f} "
          f"(alpha for w=0.5: {results['pdf_distance']['suggested_alpha']:.2f})")

    with open(os.path.join(args.out, "soft_class_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"Saved results + heatmaps to {args.out}")


if __name__ == "__main__":
    main()
