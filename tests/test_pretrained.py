"""Pretrained torchvision-MobileNetV2 ingestion round-trip.

The environment has no ImageNet weights, so the test fabricates a
state dict with torchvision's exact key names and OIHW shapes, ingests it
through :mod:`spef_tpu.models.pretrained`, and checks that every backbone
tensor landed (transposed correctly, BN stats into batch_stats) and the
head stayed at its fresh init — the contract of the reference's
pretrained path (`/root/reference/src/modeling/model.py:268-277`).
"""

import numpy as np
import pytest

from spef_tpu.models.pretrained import (
    load_pretrained_backbone, torchvision_key_map)
from spef_tpu.models.wrapper import import_model

_SETTINGS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
             (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


def synthetic_torchvision_state(rng: np.random.Generator):
    """Fabricate a torchvision mobilenet_v2 state dict (features.* only).

    Weights are kaiming-fan-out scaled and BN stats near (0, 1) so the
    fabricated checkpoint is also *runnable* (finite activations through all
    19 stages) — the CLI-drive verification trains one epoch on it.
    """
    sd = {}

    def bn(prefix, cout):
        sd[f"{prefix}.weight"] = (1.0 + 0.1 * rng.standard_normal(cout)).astype(np.float32)
        sd[f"{prefix}.bias"] = (0.1 * rng.standard_normal(cout)).astype(np.float32)
        sd[f"{prefix}.running_mean"] = (0.1 * rng.standard_normal(cout)).astype(np.float32)
        sd[f"{prefix}.running_var"] = (1.0 + 0.1 * rng.random(cout)).astype(np.float32)
        sd[f"{prefix}.num_batches_tracked"] = np.array(42)

    def convbn(prefix, cin, cout, k, groups=1):
        std = np.sqrt(2.0 / (k * k * cout))
        sd[f"{prefix}.0.weight"] = (std * rng.standard_normal(
            (cout, cin // groups, k, k))).astype(np.float32)
        bn(f"{prefix}.1", cout)

    convbn("features.0", 3, 32, 3)
    cin, block = 32, 0
    for t, c, n, s in _SETTINGS:
        for _ in range(n):
            hidden = cin * t
            p = f"features.{block + 1}.conv"
            if t == 1:
                convbn(f"{p}.0", hidden, hidden, 3, groups=hidden)
                proj = f"{p}.1"
                bn_prefix = f"{p}.2"
            else:
                convbn(f"{p}.0", cin, hidden, 1)
                convbn(f"{p}.1", hidden, hidden, 3, groups=hidden)
                proj = f"{p}.2"
                bn_prefix = f"{p}.3"
            std = np.sqrt(2.0 / c)
            sd[f"{proj}.weight"] = (std * rng.standard_normal(
                (c, hidden, 1, 1))).astype(np.float32)
            bn(bn_prefix, c)
            cin = c
            block += 1
    convbn(f"features.{block + 1}", cin, 1280, 1)
    return sd


@pytest.fixture(scope="module")
def model():
    return import_model(img_size=(32, 32), n_ori_bins=16, pos_mode="regression")


def test_key_map_is_exhaustive(model):
    """Every torchvision key (minus num_batches_tracked) is consumed."""
    sd = synthetic_torchvision_state(np.random.default_rng(0))
    consumed = set()
    for tv, _fx, kind in torchvision_key_map():
        if kind == "conv":
            consumed.add(f"{tv}.weight")
        elif kind == "bn":
            consumed.update(f"{tv}.{n}" for n in
                            ("weight", "bias", "running_mean", "running_var"))
        else:
            consumed.add(f"{tv}.0.weight")
            consumed.update(f"{tv}.1.{n}" for n in
                            ("weight", "bias", "running_mean", "running_var"))
    leftovers = {k for k in sd if k not in consumed
                 and not k.endswith("num_batches_tracked")}
    assert not leftovers, leftovers


def test_ingestion_round_trip(model, tmp_path):
    sd = synthetic_torchvision_state(np.random.default_rng(1))
    npz = tmp_path / "mnv2_imagenet.npz"
    np.savez(npz, **sd)

    before = model.variables
    after = load_pretrained_backbone(str(npz), before)

    # Stem conv: OIHW -> HWIO transpose, exact values.
    np.testing.assert_array_equal(
        after["params"]["backbone"]["stem"]["conv"]["kernel"],
        np.transpose(sd["features.0.0.weight"], (2, 3, 1, 0)))
    # Depthwise kernel of the t=1 block 0 (torchvision features.1.conv.0.0).
    np.testing.assert_array_equal(
        after["params"]["backbone"]["block_0"]["depthwise"]["conv"]["kernel"],
        np.transpose(sd["features.1.conv.0.0.weight"], (2, 3, 1, 0)))
    # Project conv + BN of a t=6 block (features.2.conv.{2,3}).
    np.testing.assert_array_equal(
        after["params"]["backbone"]["block_1"]["project"]["conv"]["kernel"],
        np.transpose(sd["features.2.conv.2.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        after["batch_stats"]["backbone"]["block_1"]["project"]["bn"]["var"],
        sd["features.2.conv.3.running_var"])
    # Final 1x1 conv (features.18).
    np.testing.assert_array_equal(
        after["params"]["backbone"]["head_conv"]["conv"]["kernel"],
        np.transpose(sd["features.18.0.weight"], (2, 3, 1, 0)))

    # Head untouched.
    for k in after["params"]["head"]:
        np.testing.assert_array_equal(
            np.asarray(after["params"]["head"][k]["kernel"]),
            np.asarray(before["params"]["head"][k]["kernel"]))

    # Every backbone param leaf changed (synthetic values are random, so a
    # leaf equal to its fresh init means the mapping skipped it).
    import jax

    flat_b = jax.tree_util.tree_leaves_with_path(before["params"]["backbone"])
    flat_a = dict(jax.tree_util.tree_leaves_with_path(after["params"]["backbone"]))
    # tree_leaves_with_path on dicts yields matching orders; compare by path.
    changed = 0
    for path, leaf in flat_b:
        if not np.array_equal(np.asarray(leaf), np.asarray(flat_a[path])):
            changed += 1
    assert changed == len(flat_b), f"only {changed}/{len(flat_b)} leaves ingested"


def test_shape_mismatch_is_fatal(model, tmp_path):
    sd = synthetic_torchvision_state(np.random.default_rng(2))
    sd["features.0.0.weight"] = sd["features.0.0.weight"][:16]  # wrong O dim
    npz = tmp_path / "bad.npz"
    np.savez(npz, **sd)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_pretrained_backbone(str(npz), model.variables)


def test_torch_state_dict_file(model, tmp_path):
    torch = pytest.importorskip("torch")
    sd = synthetic_torchvision_state(np.random.default_rng(3))
    pt = tmp_path / "mnv2.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, pt)
    after = load_pretrained_backbone(str(pt), model.variables)
    np.testing.assert_array_equal(
        after["params"]["backbone"]["stem"]["conv"]["kernel"],
        np.transpose(sd["features.0.0.weight"], (2, 3, 1, 0)))


def test_import_model_kwarg(tmp_path):
    sd = synthetic_torchvision_state(np.random.default_rng(4))
    npz = tmp_path / "mnv2.npz"
    np.savez(npz, **sd)
    m = import_model(img_size=(32, 32), n_ori_bins=16, pos_mode="regression",
                     pretrained_path=str(npz))
    np.testing.assert_array_equal(
        np.asarray(m.variables["params"]["backbone"]["stem"]["conv"]["kernel"]),
        np.transpose(sd["features.0.0.weight"], (2, 3, 1, 0)))
