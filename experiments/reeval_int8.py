"""Re-evaluate the int8 ladder stage + parity report from a saved build.

Used after the unsigned-grid wrap fix to the int8 executors (int8_model
now carries exact int32; the deployment executors decode uint8
bits-carries / zero-point shifts): the w8a8 ladder's int8 stage had
evaluated at ESA 0.61 vs QAT 0.17 purely from int8 wrap of q>127
activations.  Loads <ladder_exp>/int8_graph.pkl + the saved QAT model,
re-evaluates the int8 stage on the config's eval splits, re-runs the
parity harness, and updates ladder.json / parity_report.json in place.

Usage: python experiments/reeval_int8.py \
           experiments/accuracy_suite/ladder_w8a8/config
"""

import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(exp_dir):
    from spef_tpu.codec.facade import SPEUtils
    from spef_tpu.config.train_config import load_config
    from spef_tpu.data.camera import load_camera
    from spef_tpu.data.dataset import load_dataset
    from spef_tpu.engine import SPEJax
    from spef_tpu.models.wrapper import import_model
    from spef_tpu.quant.bitwidth import load_bit_width
    from spef_tpu.quant.int8_model import build_int8_forward
    from spef_tpu.quant.parity import predict_and_compare
    from spef_tpu.train.trainer import evaluation

    cfg = load_config(os.path.join(exp_dir, "config.yaml"))
    with open(os.path.join(exp_dir, "int8_graph.pkl"), "rb") as f:
        graph = pickle.load(f)
    import jax

    graph = jax.tree_util.tree_map(
        lambda v: v.item() if getattr(v, "ndim", 1) == 0 else v, graph)

    camera = load_camera(cfg.DATA.PATH)
    spe_utils = SPEUtils.create(
        camera, ori_mode=cfg.MODEL.HEAD.ORI,
        n_ori_bins_per_dim=cfg.MODEL.HEAD.N_ORI_BINS_PER_DIM,
        ori_smooth_factor=cfg.DATA.ORI_SMOOTH_FACTOR,
        ori_delete_unused_bins=cfg.MODEL.HEAD.ORI_DELETE_UNUSED_BINS,
        pos_mode=cfg.MODEL.HEAD.POS,
        n_pos_bins_per_dim=cfg.MODEL.HEAD.N_POS_BINS_PER_DIM,
        pos_smooth_factor=cfg.DATA.POS_SMOOTH_FACTOR,
    )
    data, split = load_dataset(cfg.DATA.PATH, cfg.DATA.BATCH_SIZE,
                               tuple(cfg.DATA.IMG_SIZE), cache=True)

    def q_name(name):
        name = name.replace("_pytorch", "").replace("_brevitas", "")
        return name if name.endswith("_q") else name + "_q"

    qat_model = import_model(
        backbone_name=q_name(cfg.MODEL.BACKBONE.NAME),
        head_name=q_name(cfg.MODEL.HEAD.NAME),
        img_size=tuple(cfg.DATA.IMG_SIZE),
        params_path=os.path.join(exp_dir, "model", "parameters.msgpack"),
        bit_width=load_bit_width(os.path.join(exp_dir, "model", "bit_width.json")),
        quantization=True,
        ori_mode=cfg.MODEL.HEAD.ORI, n_ori_bins=spe_utils.orientation.n_bins,
        pos_mode=cfg.MODEL.HEAD.POS, n_pos_bins=spe_utils.position.n_bins,
    )
    int8_fwd = build_int8_forward(graph)
    engine = SPEJax(qat_model, spe_utils, forward_fn=int8_fwd)
    score, err = evaluation(engine, data, spe_utils, split["eval"])

    path = os.path.join(exp_dir, "ladder.json")
    with open(path) as f:
        payload = json.load(f)
    payload["scores"]["int8"] = score
    payload["errors"]["int8"] = err
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, default=float)
    for phase in split["eval"]:
        print(f"[int8/{phase}] esa={score[phase]['esa'][0]:.4f} "
              f"(rewritten in {path})")

    # Refresh the bit-comparison parity harness on the first eval batch
    # (same methodology as apps/build_int8.py:229-233).
    import jax.numpy as jnp

    batch = next(iter(data[split["eval"][0]]))
    report = predict_and_compare(
        lambda imgs: qat_model.apply(imgs, False), int8_fwd,
        jnp.asarray(batch["images"]), spe_utils)
    with open(os.path.join(exp_dir, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=2, default=float)
    print("parity:", json.dumps(report, indent=2, default=float))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "experiments/accuracy_suite/ladder_w8a8/config")
