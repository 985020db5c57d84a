"""A/B of temporal filters on the 11 D-SPEED video scenarios (VERDICT r3 #5).

The repo carries seven alternative filters (`spef_tpu/temporal/filters.py`,
counterparts of the reference's `src/temporal/{filter,kalman,moving_average}.py`)
that had never been scored against the adaptive PDF filter on the same
sequences.  This script closes that: one table — still / PDF(ref) / PDF(tuned)
/ Kalman / EMA / MA / FIR — on all 11 kinematic scenarios.

Consumes the per-frame PDF dumps written by `experiments/tune_temporal.py
--dump` (SPEF_PDF_DIR, default /tmp/video_pdfs); everything here is
decode+filter math, so it runs on CPU and never touches the chip.

Free parameters of each alternative are chosen on the tune split
(alternating alphabetical, identical to tune_temporal._split) and the
holdout column is the honest comparison — the same protocol that produced
the shipped domain-tuned PDF constants.

Output: experiments/accuracy_suite/filter_ab.json + a markdown table on
stdout (pasted into ACCURACY.md).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PDF_DIR = os.environ.get("SPEF_PDF_DIR", "/tmp/video_pdfs")
OUT_JSON = os.path.join(os.path.dirname(__file__), "accuracy_suite", "filter_ab.json")


def _split(names):
    names = sorted(names)
    return names[0::2], names[1::2]


def _load_sequences():
    seqs = {}
    for path in sorted(glob.glob(os.path.join(PDF_DIR, "*.npz"))):
        name = os.path.splitext(os.path.basename(path))[0]
        with np.load(path) as z:
            seqs[name] = {k: z[k] for k in z.files}
    if not seqs:
        raise SystemExit(
            f"no PDF dumps under {PDF_DIR} — run "
            "`python experiments/tune_temporal.py --dump ...` first (chip stage)")
    return seqs


def _make_spe_utils(experiment: str, data_root: str):
    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.config.train_config import load_config
    from spef_tpu.data.camera import load_camera

    cfg = load_config(os.path.join(experiment, "config.yaml"))
    return SPEUtils.create(
        load_camera(data_root),
        ori_mode=cfg.MODEL.HEAD.ORI,
        n_ori_bins_per_dim=cfg.MODEL.HEAD.N_ORI_BINS_PER_DIM,
        ori_smooth_factor=cfg.DATA.ORI_SMOOTH_FACTOR,
        ori_delete_unused_bins=cfg.MODEL.HEAD.ORI_DELETE_UNUSED_BINS,
        pos_mode=cfg.MODEL.HEAD.POS,
        n_pos_bins_per_dim=cfg.MODEL.HEAD.N_POS_BINS_PER_DIM,
        pos_smooth_factor=cfg.DATA.POS_SMOOTH_FACTOR,
    )


# ------------------------------------------------------------- filters ----

def _decode(spe_utils, ori_soft, pos_soft):
    """PDFs -> (quat trajectory with temporal hemisphere continuity, pos)."""
    import jax.numpy as jnp

    from spef_tpu.temporal.inference import quaternion_continuity_scan

    ori, _ = spe_utils.orientation.decode_batch(jnp.asarray(ori_soft))
    pos = spe_utils.position.decode_batch(jnp.asarray(pos_soft))
    return np.asarray(quaternion_continuity_scan(ori)), np.asarray(pos)


def _pdf_traj(spe_utils, d, n_ori, a_ori, m_ori, n_pos, a_pos, m_pos):
    import jax.numpy as jnp

    from spef_tpu.temporal.pdf_filter import scan_filter

    ori_f, _ = scan_filter(jnp.asarray(d["ori_soft"]), n_ori, a_ori, m_ori)
    pos_f, _ = scan_filter(jnp.asarray(d["pos_soft"]), n_pos, a_pos, m_pos)
    return _decode(spe_utils, ori_f, pos_f)


def _kalman_traj(d_still, pv_ori, mv_ori, pv_pos, mv_pos):
    from spef_tpu.temporal.filters import (
        KalmanFilterPosSimple,
        QuaternionKalmanFilter,
    )

    kq = QuaternionKalmanFilter(process_var=pv_ori, meas_var=mv_ori)
    kp = KalmanFilterPosSimple(process_var=pv_pos, meas_var=mv_pos)
    ori = np.stack([kq.update(q) for q in d_still[0]])
    pos = np.stack([kp.update(p) for p in d_still[1]])
    return ori, pos


def _pdf_ema_traj(spe_utils, d, alpha_ori, alpha_pos):
    from spef_tpu.temporal.filters import ExponentialMovingAverage

    fo, fp = ExponentialMovingAverage(alpha_ori), ExponentialMovingAverage(alpha_pos)
    ori_soft = np.stack([fo.update(x) for x in d["ori_soft"]])
    pos_soft = np.stack([fp.update(x) for x in d["pos_soft"]])
    return _decode(spe_utils, ori_soft, pos_soft)


def _pdf_ma_traj(spe_utils, d, win_ori, win_pos):
    from spef_tpu.temporal.filters import MovingAverage

    fo, fp = MovingAverage(win_ori), MovingAverage(win_pos)
    ori_soft = np.stack([fo.update(x) for x in d["ori_soft"]])
    pos_soft = np.stack([fp.update(x) for x in d["pos_soft"]])
    return _decode(spe_utils, ori_soft, pos_soft)


def _fir_traj(d_still, taps_ori, cut_ori, taps_pos, cut_pos):
    from spef_tpu.temporal.filters import FIRFilter

    fo = FIRFilter(numtaps=taps_ori, cutoff=cut_ori, dim=4)
    fp = FIRFilter(numtaps=taps_pos, cutoff=cut_pos, dim=3)
    ori = np.stack([fo.update(q) for q in d_still[0]])
    ori /= np.linalg.norm(ori, axis=-1, keepdims=True)
    pos = np.stack([fp.update(p) for p in d_still[1]])
    return ori, pos


# ------------------------------------------------------------- scoring ----

def _score(d, ori, pos):
    import jax.numpy as jnp

    from spef_tpu.pose.score import score_batch

    s = score_batch(jnp.asarray(d["ori_true"]), jnp.asarray(d["pos_true"]),
                    jnp.asarray(ori), jnp.asarray(pos))
    return {k: float(v) for k, v in s.items()}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--experiment", default="experiments/train_synth/exp_dspeed_synth")
    p.add_argument("--data", default="/tmp/dspeed_syn/video")
    args = p.parse_args(argv)

    from spef_tpu.temporal.pdf_filter import (
        ORI_FILTER_DEFAULTS,
        POS_FILTER_DEFAULTS,
        filter_defaults,
    )

    spe_utils = _make_spe_utils(args.experiment, args.data)
    seqs = _load_sequences()
    names = sorted(seqs)
    tune_names, holdout_names = _split(names)
    print(f"sequences: {names}\ntune on {tune_names}, hold out {holdout_names}")

    stills = {s: _decode(spe_utils, seqs[s]["ori_soft"], seqs[s]["pos_soft"])
              for s in names}

    def esa_table(traj_fn):
        """Per-sequence ESA for one filter configuration."""
        return {s: _score(seqs[s], *traj_fn(s)) for s in names}

    def tune_mean(scores, key="esa_score"):
        return float(np.mean([scores[s][key] for s in tune_names]))

    results = {}
    results["still"] = {"params": {}, "scores": esa_table(lambda s: stills[s])}

    # Adaptive PDF filter — reference SPEED constants and the shipped
    # domain-tuned D-SPEED defaults (no further fitting here; both are
    # fixed configurations).
    o, q = ORI_FILTER_DEFAULTS, POS_FILTER_DEFAULTS
    results["pdf_ref"] = {
        "params": {"ori": dict(o), "pos": dict(q)},
        "scores": esa_table(lambda s: _pdf_traj(
            spe_utils, seqs[s], o["n"], o["alpha"], o["distance_metric"],
            q["n"], q["alpha"], q["distance_metric"])),
    }
    ot, qt = filter_defaults("dspeed")
    results["pdf_tuned"] = {
        "params": {"ori": dict(ot), "pos": dict(qt)},
        "scores": esa_table(lambda s: _pdf_traj(
            spe_utils, seqs[s], ot["n"], ot["alpha"], ot["distance_metric"],
            qt["n"], qt["alpha"], qt["distance_metric"])),
    }

    # Kalman: grid on the tune split, per head (ori scored by ori_score,
    # pos by pos_score — the heads are independent filters).
    grid = [(pv, mv) for pv in (1e-5, 1e-4, 1e-3) for mv in (1e-3, 1e-2, 1e-1)]
    best_o = min(grid, key=lambda g: tune_mean(
        {s: _score(seqs[s], *_kalman_traj(stills[s], g[0], g[1], 1e-3, 1e-2))
         for s in tune_names}, "ori_score"))
    best_p = min(grid, key=lambda g: tune_mean(
        {s: _score(seqs[s], *_kalman_traj(stills[s], best_o[0], best_o[1], g[0], g[1]))
         for s in tune_names}, "pos_score"))
    results["kalman"] = {
        "params": {"ori": {"process_var": best_o[0], "meas_var": best_o[1]},
                   "pos": {"process_var": best_p[0], "meas_var": best_p[1]}},
        "scores": esa_table(lambda s: _kalman_traj(
            stills[s], best_o[0], best_o[1], best_p[0], best_p[1])),
    }

    # EMA over the PDFs.
    alphas = (0.2, 0.3, 0.5, 0.7, 0.9)
    best_ao = min(alphas, key=lambda a: tune_mean(
        {s: _score(seqs[s], *_pdf_ema_traj(spe_utils, seqs[s], a, 0.5))
         for s in tune_names}, "ori_score"))
    best_ap = min(alphas, key=lambda a: tune_mean(
        {s: _score(seqs[s], *_pdf_ema_traj(spe_utils, seqs[s], best_ao, a))
         for s in tune_names}, "pos_score"))
    results["ema"] = {
        "params": {"alpha_ori": best_ao, "alpha_pos": best_ap},
        "scores": esa_table(lambda s: _pdf_ema_traj(spe_utils, seqs[s], best_ao, best_ap)),
    }

    # Moving average over the PDFs.
    wins = (3, 5, 9, 15)
    best_wo = min(wins, key=lambda w: tune_mean(
        {s: _score(seqs[s], *_pdf_ma_traj(spe_utils, seqs[s], w, 5))
         for s in tune_names}, "ori_score"))
    best_wp = min(wins, key=lambda w: tune_mean(
        {s: _score(seqs[s], *_pdf_ma_traj(spe_utils, seqs[s], best_wo, w))
         for s in tune_names}, "pos_score"))
    results["ma"] = {
        "params": {"window_ori": best_wo, "window_pos": best_wp},
        "scores": esa_table(lambda s: _pdf_ma_traj(spe_utils, seqs[s], best_wo, best_wp)),
    }

    # FIR on the decoded still trajectories.
    fgrid = [(t, c) for t in (7, 15) for c in (0.05, 0.1, 0.3)]
    best_fo = min(fgrid, key=lambda g: tune_mean(
        {s: _score(seqs[s], *_fir_traj(stills[s], g[0], g[1], 15, 0.1))
         for s in tune_names}, "ori_score"))
    best_fp = min(fgrid, key=lambda g: tune_mean(
        {s: _score(seqs[s], *_fir_traj(stills[s], best_fo[0], best_fo[1], g[0], g[1]))
         for s in tune_names}, "pos_score"))
    results["fir"] = {
        "params": {"ori": {"numtaps": best_fo[0], "cutoff": best_fo[1]},
                   "pos": {"numtaps": best_fp[0], "cutoff": best_fp[1]}},
        "scores": esa_table(lambda s: _fir_traj(
            stills[s], best_fo[0], best_fo[1], best_fp[0], best_fp[1])),
    }

    # ------------------------------------------------------- summarize ----
    summary = {}
    for name, entry in results.items():
        sc = entry["scores"]
        summary[name] = {
            "esa_all": float(np.mean([sc[s]["esa_score"] for s in names])),
            "esa_tune": float(np.mean([sc[s]["esa_score"] for s in tune_names])),
            "esa_holdout": float(np.mean([sc[s]["esa_score"] for s in holdout_names])),
            "ori_deg_all": float(np.mean([sc[s]["ori_error"] for s in names])),
            "pos_m_all": float(np.mean([sc[s]["pos_error"] for s in names])),
        }

    os.makedirs(os.path.dirname(OUT_JSON), exist_ok=True)
    with open(OUT_JSON, "w") as f:
        json.dump({"tune_split": tune_names, "holdout_split": holdout_names,
                   "results": results, "summary": summary}, f, indent=2)
    print(f"\nwrote {OUT_JSON}\n")

    print("| filter | params | ESA all-11 | ESA tune | ESA holdout | ori (deg) | pos (m) |")
    print("|---|---|---|---|---|---|---|")
    for name in ("still", "pdf_ref", "pdf_tuned", "kalman", "ema", "ma", "fir"):
        s = summary[name]
        pstr = json.dumps(results[name]["params"]).replace("|", "/")
        print(f"| {name} | {pstr} | {s['esa_all']:.4f} | {s['esa_tune']:.4f} "
              f"| {s['esa_holdout']:.4f} | {s['ori_deg_all']:.2f} | {s['pos_m_all']:.3f} |")


if __name__ == "__main__":
    main()
