"""Re-evaluate the weight-only ladder stage from a saved build experiment.

Used after the r2 fix to build_weight_only_forward (learned act-range
clips kept): loads <ladder_exp>/int8_graph.pkl + the saved QAT model,
evaluates weight-only on the config's eval splits, and updates
ladder.json in place.

Usage: python experiments/reeval_weight_only.py \
           experiments/accuracy_suite/ladder_default/config
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
    from spef_tpu.quant.int8_model import build_weight_only_forward
    from spef_tpu.train.trainer import evaluation

    cfg = load_config(os.path.join(exp_dir, "config.yaml"))
    with open(os.path.join(exp_dir, "int8_graph.pkl"), "rb") as f:
        graph = pickle.load(f)
    # The saved graph passed through tree_map(np.asarray), which also wraps
    # python scalars (stride, steps, qmax) as 0-d arrays — conv params must
    # be hashable ints again.
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
    engine = SPEJax(qat_model, spe_utils,
                    forward_fn=build_weight_only_forward(graph))
    score, err = evaluation(engine, data, spe_utils, split["eval"])

    path = os.path.join(exp_dir, "ladder.json")
    with open(path) as f:
        payload = json.load(f)
    payload["scores"]["weight_only"] = score
    payload["errors"]["weight_only"] = err
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, default=float)
    for phase in split["eval"]:
        print(f"[weight_only/{phase}] esa={score[phase]['esa'][0]:.4f} "
              f"(rewritten in {path})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "experiments/accuracy_suite/ladder_default/config")
