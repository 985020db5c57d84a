"""Tests for the temporal report suite (reference `temporal.py:297-532`)."""

import glob
import os

import numpy as np

from spef_tpu.temporal.report import (
    compute_statistics,
    sequence_figures,
    sequence_metrics,
    write_workbooks,
)

_FIGS = [
    "ori_error", "ori_error_per_axis", "ori_histogram", "ori_quat_elements",
    "ori_euler_elements", "pos_error", "pos_error_per_axis", "pos_histogram",
    "pos_elements",
]


def _fake_sequence(t=40, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(t, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    dq = q + 0.01 * rng.randn(t, 4)
    dq /= np.linalg.norm(dq, axis=-1, keepdims=True)
    pos = np.stack([rng.randn(t), rng.randn(t), 10 + rng.rand(t) * 5], axis=-1)
    return q.astype(np.float32), pos.astype(np.float32), dq.astype(np.float32), \
        (pos + 0.1 * rng.randn(t, 3)).astype(np.float32)


def test_compute_statistics():
    stats = compute_statistics([1.0, 2.0, 3.0, 4.0])
    assert stats[0] == 1.0 and stats[1] == 4.0
    assert stats[2] == 2.5 and stats[3] == 2.5


def test_sequence_metrics_columns():
    q, p, sq, sp = _fake_sequence()
    still, video, dist = sequence_metrics(
        q, p, sq, sp, video_ori=sq, video_pos=sp,
        ori_distance=np.random.rand(40), pos_distance=np.random.rand(40),
    )
    # Reference column names (`temporal.py:99-141`).
    assert set(still) == {"ori_err", "ori_err_yaw", "ori_err_pitch", "ori_err_roll",
                          "pos_err", "pos_err_x", "pos_err_y", "pos_err_z"}
    assert all(k.endswith("_video") for k in video)
    assert set(dist) == {"ori_distance", "pos_distance"}
    assert all(len(v) == 5 for v in still.values())
    # small perturbation -> small errors
    assert still["ori_err"][3] < 10.0  # mean deg
    assert still["pos_err"][3] < 1.0


def test_sequence_figures_and_workbooks(tmp_path):
    q, p, sq, sp = _fake_sequence()
    kwargs = dict(video_ori=sq, video_pos=sp,
                  ori_distance=np.random.rand(40), pos_distance=np.random.rand(40))
    base = sequence_figures(str(tmp_path), "S", q, p, sq, sp, **kwargs)
    pngs = {os.path.splitext(os.path.basename(f))[0] for f in glob.glob(base + "/*.png")}
    assert pngs == set(_FIGS), pngs  # all nine reference figures

    sm, vm, dm = sequence_metrics(q, p, sq, sp, **kwargs)
    out = write_workbooks(str(tmp_path), {"S": sm}, {"S": vm}, {"S": dm})
    names = {os.path.basename(f) for f in glob.glob(out + "/*.csv")}
    assert {"still_metrics_S.csv", "video_metrics_S.csv", "distances_S.csv"} <= names


def test_figures_without_video(tmp_path):
    q, p, sq, sp = _fake_sequence(seed=1)
    base = sequence_figures(str(tmp_path), "NoV", q, p, sq, sp)
    pngs = glob.glob(base + "/*.png")
    assert len(pngs) == 9
