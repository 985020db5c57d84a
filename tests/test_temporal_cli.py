"""End-to-end test of the temporal_eval CLI (reference `temporal.py:51-546`):
train a tiny classification/classification model, render a synthetic video
sequence, run the CLI, and check the still/video metrics artifact — plus the
--filter-constants override path fed by experiments/tune_temporal.py output."""

import json
import os

import numpy as np
import pytest

from spef_tpu.data.synthetic import create_synthetic_dataset, create_synthetic_video


@pytest.fixture(scope="module")
def video_exp(tmp_path_factory):
    root = tmp_path_factory.mktemp("tv_ds")
    create_synthetic_dataset(str(root), n_train=16, n_valid=8, n_test=8,
                             img_size=(64, 96))
    video_root = create_synthetic_video(str(root), n_frames=24, img_size=(64, 96))

    cfg = tmp_path_factory.mktemp("tv_cfg") / "exp_tvid.yaml"
    cfg.write_text(f"""\
MODEL:
  BACKBONE:
    NAME: small_mobile
  HEAD:
    NAME: ursonet
    ORI: classification
    POS: classification
    N_ORI_BINS_PER_DIM: 4
    N_POS_BINS_PER_DIM: 4
DATA:
  PATH: {root}/still
  BATCH_SIZE: 8
  IMG_SIZE: [64, 96]
  ROT_AUGMENT: false
  OTHER_AUGMENT: false
TRAIN:
  N_EPOCH: 1
  OPTIM: Adam
  LR: 0.005
""")
    from spef_tpu.apps.train import main as train_main

    out = str(tmp_path_factory.mktemp("tv_out"))
    train_main(["--config", str(cfg), "--out", out])
    return os.path.join(out, "exp_tvid"), video_root


def test_temporal_eval_cli(video_exp, tmp_path):
    from spef_tpu.apps.temporal_eval import main as temporal_main

    exp_dir, video_root = video_exp
    out = str(tmp_path / "temporal")
    temporal_main(["--experiment", exp_dir, "--data", video_root, "--out", out])

    with open(os.path.join(out, "temporal_metrics.json")) as f:
        metrics = json.load(f)
    assert "seq_000" in metrics
    for mode in ("still", "video"):
        assert np.isfinite(metrics["seq_000"][mode]["esa_score"])


def test_temporal_eval_cli_filter_constants(video_exp, tmp_path):
    """--filter-constants applies the tuned (n, alpha, metric); an extreme
    alpha (w -> 0: hold the first PDF forever) must visibly change the video
    trajectory, proving the override reaches the scan filter."""
    from spef_tpu.apps.temporal_eval import main as temporal_main

    exp_dir, video_root = video_exp
    tuned = {
        "ori": {"best_metric": "tv", "best": {"n": 1.0, "alpha": 1e6}},
        "pos": {"best_metric": "tv", "best": {"n": 1.0, "alpha": 1e6}},
    }
    const_path = tmp_path / "tuned.json"
    const_path.write_text(json.dumps(tuned))

    out_default = str(tmp_path / "t_default")
    out_tuned = str(tmp_path / "t_tuned")
    temporal_main(["--experiment", exp_dir, "--data", video_root, "--out", out_default])
    temporal_main(["--experiment", exp_dir, "--data", video_root, "--out", out_tuned,
                   "--filter-constants", str(const_path)])

    with open(os.path.join(out_default, "temporal_metrics.json")) as f:
        base = json.load(f)["seq_000"]
    with open(os.path.join(out_tuned, "temporal_metrics.json")) as f:
        over = json.load(f)["seq_000"]
    # Still trajectories identical; video trajectories must differ (the
    # 1-epoch model's PDFs are near-constant across frames so the magnitude
    # is small, but identical constants would be bitwise-equal).
    assert over["still"]["esa_score"] == pytest.approx(base["still"]["esa_score"], abs=1e-6)
    assert abs(over["video"]["esa_score"] - base["video"]["esa_score"]) > 1e-9


def test_batch_sequences_matches_per_sequence(video_exp, tmp_path):
    """--batch-sequences (vmapped multi-sequence program) must produce the
    same still/video metrics as the per-sequence path."""
    from spef_tpu.apps.temporal_eval import main as temporal_main

    exp_dir, video_root = video_exp
    # Second equal-length sequence alongside seq_000.
    root = os.path.dirname(video_root.rstrip("/"))
    create_synthetic_video(root, n_frames=24, img_size=(64, 96), seed=11,
                           seq_name="seq_001")

    out_serial = str(tmp_path / "serial")
    out_batched = str(tmp_path / "batched")
    temporal_main(["--experiment", exp_dir, "--data", video_root, "--out", out_serial])
    temporal_main(["--experiment", exp_dir, "--data", video_root, "--out", out_batched,
                   "--batch-sequences"])

    with open(os.path.join(out_serial, "temporal_metrics.json")) as f:
        serial = json.load(f)
    with open(os.path.join(out_batched, "temporal_metrics.json")) as f:
        batched = json.load(f)
    assert set(serial) == set(batched) == {"seq_000", "seq_001"}
    for seq in serial:
        for mode in ("still", "video"):
            assert batched[seq][mode]["esa_score"] == pytest.approx(
                serial[seq][mode]["esa_score"], rel=1e-4, abs=1e-5)
