"""Measure composed two-block backend-transition costs on chip.

Per-node autotuner timings cannot see what a backend switch costs: the
executor inserts a ``pad_act``/``unpad_act`` HBM pass at every
fused<->XLA boundary, and alternating backends also forfeits XLA's
cross-node fusion (round-3 postmortem: an interleaved 7-fused/10-xla plan
ran 3x slower than either pure path).  This probe times every consecutive
block pair of the network in all four backend combinations — the exact
glue ``int8_fused.build_fused_forward`` would emit — and derives the
per-boundary transition cost:

    trans(i) = (t[fused->xla] + t[xla->fused] - t[fused->fused]
                - t[xla->xla]) / 2

The measured costs are persisted into the autotune tuning table under
``trans:<sig_i>-><sig_j>`` keys; ``plan_backends`` consumes them as
per-boundary switch penalties (falling back to its scalar default where
unmeasured).  This answers VERDICT r3 #3: make the DP transition-aware
with *measured composed segments*.

Usage:  python benchmarks/probe_transition.py [--img 256] [--batch 256]
        [--recipe boundary] [--iters 10]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
except Exception:
    pass

import jax.numpy as jnp
import numpy as np


def build_pair_fn(graph, i, backends, h, w, in_step, unsigned_in=False):
    """Composed program: blocks i and i+1 under ``backends`` (pair of str).

    Input is a plain NHWC int8 tensor on block i's input grid — the same
    contract both executors use at a block boundary; the output is returned
    plain NHWC so every candidate pays identical entry/exit glue and only
    the INTERIOR boundary differs.
    """
    from spef_tpu.ops.pallas.fused_block import fused_mbconv, pad_act, unpad_act
    from spef_tpu.quant.int8_fused import (
        _block_fusable, _consumer_grid, _grid, _xla_block)

    blocks = graph["blocks"]

    def run(y):
        layout = False
        step = in_step
        hh, ww = h, w
        unsigned = unsigned_in
        for k, backend in enumerate(backends):
            blk = blocks[i + k]
            if "shared_step" in blk and (blk["input_quant"] or blk["use_residual"]):
                tgt = blk["shared_step"]
                if abs(step - tgt) > 1e-12 or unsigned:
                    from spef_tpu.quant.int8_pallas import _decode_unsigned_f32

                    ratio = step / tgt
                    qmax = blk["shared_qmax"]
                    yf = (_decode_unsigned_f32(y) if unsigned
                          else y.astype(jnp.float32))
                    y = jnp.clip(jnp.round(yf * ratio),
                                 -qmax - 1, qmax).astype(jnp.int8)
                step, unsigned = tgt, False
            out_grid = _consumer_grid(graph, i + k)
            shared = (_grid(blk["shared_step"], blk["shared_qmax"])
                      if "shared_step" in blk else None)
            stride = blk["depthwise"]["stride"]
            cout = int(blk["project"]["w_int"].shape[-1])
            if backend == "fused":
                assert _block_fusable(blk, hh, ww), f"block {i+k} not fusable"
                if not layout:
                    y = pad_act(y)
                    layout = True
                y = fused_mbconv(y, blk, in_step=step, out_grid=out_grid,
                                 shared_grid=shared, logical_hw=(hh, ww),
                                 in_unsigned=unsigned)
                if blk["use_residual"]:
                    if out_grid is not None and abs(
                            blk["shared_step"] - out_grid["step"]) > 1e-12:
                        step = out_grid["step"]
                    else:
                        step = blk["shared_step"]
                else:
                    step = out_grid["step"]
            else:
                if layout:
                    y = unpad_act(y, ww, int(y_channels(blk)))
                    layout = False
                y, step = _xla_block(y, blk, step, out_grid,
                                     in_unsigned=unsigned)
            unsigned = False
            hh, ww = hh // stride, ww // stride
        if layout:
            y = unpad_act(y, ww, cout)
        return y

    def y_channels(blk):
        d = blk["depthwise"]
        return (blk["expand"]["w_int"].shape[-2] if "expand" in blk
                else d["w_int"].shape[-1])

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--recipe", default="boundary",
                    choices=["default", "boundary"])
    ap.add_argument("--pairs", default="",
                    help="comma-separated first-block indices (default: all "
                         "fusable consecutive pairs)")
    ap.add_argument("--force", action="store_true",
                    help="re-measure pairs already in transition_costs.json")
    args = ap.parse_args()

    from spef_tpu.models.wrapper import import_model
    from spef_tpu.quant.autotune import _time_fn, load_tuning, save_tuning
    from spef_tpu.quant.convert import convert_qat_params
    from spef_tpu.quant.int8_fused import _block_fusable, node_signatures

    bw = None
    if args.recipe == "boundary":
        from spef_tpu.quant.bitwidth import boundary_bit_width

        bw = boundary_bit_width()
    model = import_model(
        backbone_name="mobilenet_v2_q", head_name="ursonet_q",
        img_size=(args.img, args.img), bit_width=bw, quantization=True,
        ori_mode="classification", n_ori_bins=1232,
        pos_mode="classification", n_pos_bins=1000, seed=0,
    )
    graph = convert_qat_params(model, bw)
    blocks = graph["blocks"]
    sigs = node_signatures(graph, (args.img, args.img))  # [stem] + blocks

    # Walk shapes/steps to each block's input.
    h, w = args.img // 2, args.img // 2
    step = graph["stem"]["act_step"]
    unsigned = float(graph["stem"]["act_qmax"]) > 127.0
    entry = []  # (i, h, w, cin, step, unsigned) at block i's input
    from spef_tpu.quant.int8_fused import _consumer_grid

    for i, blk in enumerate(blocks):
        d = blk["depthwise"]
        cin = int(blk["expand"]["w_int"].shape[-2] if "expand" in blk
                  else d["w_int"].shape[-1])
        entry.append((i, h, w, cin, step, unsigned))
        unsigned = False
        if blk["use_residual"]:
            og = _consumer_grid(graph, i)
            step = og["step"] if (og is not None and abs(
                blk["shared_step"] - og["step"]) > 1e-12) else blk["shared_step"]
        else:
            step = _consumer_grid(graph, i)["step"]
        h, w = h // d["stride"], w // d["stride"]

    wanted = ([int(x) for x in args.pairs.split(",") if x]
              if args.pairs else None)
    rng = np.random.RandomState(0)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "transition_costs.json")
    results = {}
    if os.path.exists(out):  # resume: measured pairs survive a killed run
        with open(out) as f:
            results = json.load(f)
    tbl = dict(load_tuning())

    def persist():
        save_tuning(tbl)
        with open(out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)

    for (i, hh, ww, cin, in_step, uns) in entry[:-1]:
        if wanted is not None and i not in wanted:
            continue
        if not (_block_fusable(blocks[i], hh, ww)
                and _block_fusable(blocks[i + 1], hh,
                                   ww // blocks[i]["depthwise"]["stride"])):
            continue
        key = f"trans:{sigs[i + 1]}->{sigs[i + 2]}"
        if key in results and not args.force:
            print(json.dumps({"pair": i, "skipped": "already measured"}),
                  flush=True)
            # Rehydrate with the batch the entry was MEASURED at (stored
            # in the entry since r5); legacy entries without it get no
            # batch stamp rather than the current --batch (ADVICE r4).
            # 'pair' is a results-schema field, not a tuning-table one.
            tbl[key] = {k: v for k, v in results[key].items() if k != "pair"}
            continue
        x = jnp.asarray(rng.randint(-8, 8, (args.batch, hh, ww, cin))
                        .astype(np.int8))
        t = {}
        for combo in (("fused", "fused"), ("fused", "xla"),
                      ("xla", "fused"), ("xla", "xla")):
            fn = build_pair_fn(graph, i, combo, hh, ww, in_step, uns)
            try:
                ms = _time_fn(fn, x, args.iters) * 1e3
            except Exception as exc:
                print(json.dumps({"pair": i, "combo": "->".join(combo),
                                  "failed": type(exc).__name__}), flush=True)
                t = None
                break
            t["->".join(combo)] = round(ms, 4)
            print(json.dumps({"pair": i, "combo": "->".join(combo),
                              "ms": t["->".join(combo)]}), flush=True)
        if not t:
            continue
        trans = (t["fused->xla"] + t["xla->fused"]
                 - t["fused->fused"] - t["xla->xla"]) / 2.0
        results[key] = {"pair": i, "timings_ms": t,
                        "transition_ms": round(trans, 4),
                        "batch": args.batch}
        tbl[key] = {"transition_ms": round(trans, 4), "timings_ms": t,
                    "batch": args.batch}
        print(json.dumps({"pair": i, "transition_ms": round(trans, 4)}),
              flush=True)
        persist()  # a killed/timed-out run keeps every finished pair
    persist()
    print(f"wrote {len(results)} boundary costs -> {out}")


if __name__ == "__main__":
    main()
