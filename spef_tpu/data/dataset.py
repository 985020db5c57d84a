"""Dataset manifests + host-side batch pipeline.

Counterpart of the reference's torch Dataset/DataLoader stack
(`/root/reference/src/data/utils.py:171-257`,
`src/data/datasets/{speed,speed_plus,dspeed}.py`,
`src/data/import_dataset.py:13-84`).  Same JSON label schemas (quaternion
key aliases ``q`` / ``q_vbs2tango`` / ``q_vbs2tango_true``; position ``t`` /
``r_Vo2To_vbs_true``), same numeric-filename sort for video order, same
split structure per dataset.

TPU-first differences:
  * the loader yields **uint8 NHWC device-ready batches** (resize happens on
    host with PIL; everything after — normalize, augment, encode —
    is device-side and fused into the train step);
  * the last partial batch is **padded to full batch size with a validity
    mask** so the jitted step compiles exactly once per shape;
  * target soft-encoding is done on device (``SPEUtils.encode_targets``),
    not in ``__getitem__``.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from spef_tpu.data.camera import Camera, load_camera

__all__ = ["PoseRecord", "Manifest", "BatchLoader", "CachedBatchLoader",
           "load_dataset", "detect_dataset"]

_ORI_KEYS = ("q", "q_vbs2tango", "q_vbs2tango_true")
_POS_KEYS = ("t", "r_Vo2To_vbs_true")


def _image_number(path: str) -> int:
    digits = re.sub(r"[^0-9]", "", os.path.basename(path))
    return int(digits) if digits else 0


@dataclasses.dataclass
class PoseRecord:
    image_path: str
    ori: np.ndarray  # (4,)
    pos: np.ndarray  # (3,)
    # Optional crop window [cx, cy, s] (normalized full-frame coords) for
    # crop-refine datasets: the stored image is this window of the sensor
    # frame, and keypoint labels must be mapped into it (codec/crop.py).
    crop: Optional[np.ndarray] = None


@dataclasses.dataclass
class Manifest:
    """A sorted list of (image, pose) records loaded from a labels JSON."""

    records: List[PoseRecord]

    @classmethod
    def from_json(cls, labels_path: str, images_path: str) -> "Manifest":
        with open(labels_path) as f:
            targets = json.load(f)
        ori_key = next((k for k in _ORI_KEYS if k in targets[0]), None)
        pos_key = next((k for k in _POS_KEYS if k in targets[0]), None)
        assert ori_key and pos_key, f"Unrecognized label schema in {labels_path}"
        records = [
            PoseRecord(
                image_path=os.path.join(images_path, t["filename"]),
                ori=np.asarray(t[ori_key], np.float32),
                pos=np.asarray(t[pos_key], np.float32),
                crop=(np.asarray(t["crop"], np.float32) if "crop" in t else None),
            )
            for t in targets
        ]
        # Numeric-filename sort for video frame order (`data/utils.py:206`).
        records.sort(key=lambda r: _image_number(r.image_path))
        return cls(records)

    def __len__(self) -> int:
        return len(self.records)


def _load_image(path: str, img_size: Tuple[int, int]) -> np.ndarray:
    """Load + resize to (H, W) -> uint8 (H, W, 3)."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((img_size[1], img_size[0]), Image.BILINEAR)
        return np.asarray(im, np.uint8)


def _native_loader():
    """The C++ threaded decode+resize pipeline (spef_tpu.native), if built."""
    try:
        from spef_tpu import native

        if native.available():
            return native.load_batch
    except Exception:
        pass
    return None


class BatchLoader:
    """Host-side batch iterator yielding padded, masked uint8 batches.

    Yields dicts: ``images`` (B,H,W,3) uint8, ``ori`` (B,4), ``pos`` (B,3),
    ``mask`` (B,) float32 (0 for padding rows of the final batch).
    """

    def __init__(
        self,
        manifest: Manifest,
        batch_size: int,
        img_size: Tuple[int, int] = (240, 384),
        shuffle: bool = False,
        seed: int = 1001,
        n_workers: int = 16,
        drop_remainder: bool = False,
        rot_augment=None,  # optional HostRotationAugment (train loaders)
    ):
        self.manifest = manifest
        self.batch_size = batch_size
        self.img_size = tuple(img_size)
        self.shuffle = shuffle
        self.seed = seed
        self.n_workers = n_workers
        self.drop_remainder = drop_remainder
        self.rot_augment = rot_augment
        self._epoch = 0
        if (rot_augment is not None and manifest.records
                and manifest.records[0].crop is not None):
            # Host-side yaw warp moves the target in-frame but the stored
            # crop window cannot follow the warped pose, so the keypoint
            # targets would be encoded into a stale window — the same
            # silent label corruption the trainer guards against on the
            # device-augment path (ADVICE r4).
            raise ValueError(
                "crop-refine manifests (records carry a crop window) are "
                "incompatible with host-side rotation augmentation; set "
                "DATA.ROT_AUGMENT: false for crop-mode training")

    def __len__(self) -> int:
        n = len(self.manifest)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def n_samples(self) -> int:
        return len(self.manifest)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.manifest))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1

        bs = self.batch_size
        native_load = _native_loader()
        with ThreadPoolExecutor(max_workers=self.n_workers) as pool:
            for start in range(0, len(order), bs):
                idx = order[start : start + bs]
                if len(idx) < bs and self.drop_remainder:
                    break
                recs = [self.manifest.records[i] for i in idx]
                if native_load is not None:
                    try:
                        batch_imgs = native_load(
                            [r.image_path for r in recs], self.img_size[0], self.img_size[1],
                            self.n_workers,
                        )
                        images = list(batch_imgs)
                    except IOError:
                        images = list(
                            pool.map(lambda r: _load_image(r.image_path, self.img_size), recs)
                        )
                else:
                    images = list(
                        pool.map(lambda r: _load_image(r.image_path, self.img_size), recs)
                    )
                n_valid = len(recs)
                oris = [r.ori for r in recs]
                poss = [r.pos for r in recs]
                crops = [r.crop for r in recs] if recs[0].crop is not None else None
                if self.rot_augment is not None:
                    # Host-side yaw warp with pose update (reference
                    # CustomRotation placement, `data/utils.py:212-217`).
                    for i in range(n_valid):
                        images[i], oris[i], poss[i] = self.rot_augment(
                            images[i], oris[i], poss[i]
                        )
                if n_valid < bs:  # pad to full batch, mask invalid rows
                    pad = bs - n_valid
                    images += [np.zeros_like(images[0])] * pad
                    oris += [oris[-1]] * pad
                    poss += [poss[-1]] * pad
                    if crops is not None:
                        crops += [crops[-1]] * pad
                batch = {
                    "images": np.stack(images),
                    "ori": np.stack(oris),
                    "pos": np.stack(poss),
                    "mask": np.concatenate(
                        [np.ones(n_valid, np.float32), np.zeros(bs - n_valid, np.float32)]
                    ),
                }
                if crops is not None:
                    batch["crop"] = np.stack(crops)
                yield batch


class CachedBatchLoader(BatchLoader):
    """BatchLoader that decodes the whole split ONCE and serves later epochs
    from a RAM-resident uint8 array.

    On a single-core host the PNG decode path caps training at ~200 img/s
    while the device step sustains ~1,900 img/s (PERFORMANCE.md); caching
    makes multi-epoch training device-bound.  Memory: N * H * W * 3 bytes
    (a 20k-image 240x384 split is ~5.5 GB).  Same batch contract as
    BatchLoader (padded last batch + mask); host-side rot augmentation is
    applied per epoch on the cached copies so randomness is preserved.

    ``device_resident=True`` additionally uploads the decoded split to the
    accelerator ONCE and serves every epoch as an on-device gather, so no
    image bytes cross host<->device again.  On a tunneled/remote device a
    64-image 240x384 batch costs ~2 s of transfer per step (measured r2:
    ~10 min/epoch at 20k images) — device residency makes epochs pure
    device time.  A 24k-frame dataset is ~6.4 GB of HBM alongside a ~5M-
    parameter model: comfortably within one chip.  Incompatible with
    host-side rot augmentation (use the trainer's on-device augment).
    """

    _cache: Optional[np.ndarray] = None
    device_resident: bool = False
    _dev_cache = None

    def _cache_path(self) -> Optional[str]:
        """Sidecar file for the decoded split: decoding 20k JPEGs costs
        ~20 min on a single-core host, so the decoded uint8 tensor is
        persisted next to the images and memmapped on later runs (restarts
        under checkpoint/resume then start in seconds).

        The filename carries a split identity — a short hash over the
        ordered image basenames — so two splits sharing one images dir
        (the SPEED-style flat layout) with equal record counts can never
        load each other's tensor (ADVICE r2)."""
        if not self.manifest.records:
            return None
        import hashlib

        img_dir = os.path.dirname(self.manifest.records[0].image_path)
        h, w = self.img_size
        ident = hashlib.sha1("\n".join(
            os.path.basename(r.image_path) for r in self.manifest.records
        ).encode()).hexdigest()[:10]
        return os.path.join(
            img_dir, f".decoded_{h}x{w}_{len(self.manifest)}_{ident}.npy")

    def _materialize(self) -> None:
        path = self._cache_path()
        if path and os.path.isfile(path):
            arr = np.load(path, mmap_mode="r")
            expect = (len(self.manifest),) + tuple(self.img_size) + (3,)
            if arr.shape == expect and arr.dtype == np.uint8:
                # Guard against images regenerated in place (same names,
                # same count): re-decode one sample and compare — through
                # the SAME decode path the cache was built with (the native
                # loader's resize is not bit-identical to PIL's).
                first = self.manifest.records[0].image_path
                native_load = _native_loader()
                probe = None
                if native_load is not None:
                    try:
                        probe = np.asarray(native_load(
                            [first], self.img_size[0], self.img_size[1], 1)[0])
                    except IOError:
                        pass
                if probe is None:
                    probe = _load_image(first, self.img_size)
                if np.array_equal(np.asarray(arr[0]), probe):
                    self._cache = arr
                    return
        base = BatchLoader(self.manifest, self.batch_size, self.img_size,
                           shuffle=False, n_workers=self.n_workers,
                           drop_remainder=False)
        chunks = []
        for batch in base:
            n_valid = int(batch["mask"].sum())
            chunks.append(batch["images"][:n_valid])
        self._cache = np.concatenate(chunks) if chunks else np.zeros(
            (0,) + tuple(self.img_size) + (3,), np.uint8)
        if path:
            try:  # best-effort: read-only dataset dirs fall back to RAM-only
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    np.save(f, self._cache)
                os.replace(tmp, path)
            except OSError:
                pass

    def _device_batch(self, idx: np.ndarray, n_valid: int):
        """Gather one batch on-device; zero padded rows (batch contract)."""
        import jax
        import jax.numpy as jnp

        if self._dev_cache is None:
            self._dev_cache = jax.device_put(np.asarray(self._cache))
            self._dev_gather = jax.jit(
                lambda data, i, m: jnp.take(data, i, axis=0)
                * m[:, None, None, None].astype(jnp.uint8))
        bs = self.batch_size
        idx_p = np.concatenate([idx, np.zeros(bs - n_valid, idx.dtype)])
        mask = np.concatenate(
            [np.ones(n_valid, np.float32), np.zeros(bs - n_valid, np.float32)])
        return self._dev_gather(self._dev_cache, jnp.asarray(idx_p),
                                jnp.asarray(mask)), mask

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self._cache is None:
            self._materialize()
        order = np.arange(len(self.manifest))
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        bs = self.batch_size
        oris = np.stack([r.ori for r in self.manifest.records])
        poss = np.stack([r.pos for r in self.manifest.records])
        crops = (np.stack([r.crop for r in self.manifest.records])
                 if self.manifest.records and self.manifest.records[0].crop is not None
                 else None)
        if self.device_resident:
            assert self.rot_augment is None, (
                "device-resident data cannot use host-side augmentation; "
                "use the trainer's on-device augment")
            for start in range(0, len(order), bs):
                idx = order[start:start + bs]
                n_valid = len(idx)
                if n_valid < bs and self.drop_remainder:
                    break
                images, mask = self._device_batch(idx, n_valid)
                idx_p = np.concatenate([idx, np.repeat(idx[-1:], bs - n_valid)])
                batch = {
                    "images": images,
                    "ori": oris[idx_p].astype(np.float32),
                    "pos": poss[idx_p].astype(np.float32),
                    "mask": mask,
                }
                if crops is not None:
                    batch["crop"] = crops[idx_p].astype(np.float32)
                yield batch
            return
        for start in range(0, len(order), bs):
            idx = order[start:start + bs]
            if len(idx) < bs and self.drop_remainder:
                break
            images = self._cache[idx]
            ori = oris[idx]
            pos = poss[idx]
            if self.rot_augment is not None:
                images = images.copy()
                ori, pos = ori.copy(), pos.copy()
                for i in range(len(idx)):
                    images[i], ori[i], pos[i] = self.rot_augment(images[i], ori[i], pos[i])
            crop = crops[idx] if crops is not None else None
            n_valid = len(idx)
            if n_valid < bs:
                pad = bs - n_valid
                images = np.concatenate([images, np.zeros((pad,) + images.shape[1:], np.uint8)])
                ori = np.concatenate([ori, np.repeat(ori[-1:], pad, 0)])
                pos = np.concatenate([pos, np.repeat(pos[-1:], pad, 0)])
                if crop is not None:
                    crop = np.concatenate([crop, np.repeat(crop[-1:], pad, 0)])
            batch = {
                "images": images,
                "ori": ori.astype(np.float32),
                "pos": pos.astype(np.float32),
                "mask": np.concatenate(
                    [np.ones(n_valid, np.float32), np.zeros(bs - n_valid, np.float32)]
                ),
            }
            if crop is not None:
                batch["crop"] = crop.astype(np.float32)
            yield batch


# ---------------------------------------------------------------------------
# Per-dataset importers (reference `src/data/datasets/*.py`).
# ---------------------------------------------------------------------------


def _make_loaders(
    splits: Dict[str, Tuple[str, str]],
    batch_size: int,
    img_size,
    shuffle: bool,
    seed: int,
    n_workers: int,
    shuffle_only_train: bool = True,
    rot_augment=None,
    cache: bool = False,
) -> Dict[str, BatchLoader]:
    loader_cls = CachedBatchLoader if cache else BatchLoader
    loaders = {}
    for name, (images_path, labels_path) in splits.items():
        if not os.path.isfile(labels_path):
            continue
        manifest = Manifest.from_json(labels_path, images_path)
        loaders[name] = loader_cls(
            manifest,
            batch_size,
            img_size,
            shuffle=shuffle and (name == "train" or not shuffle_only_train),
            seed=seed,
            n_workers=n_workers,
            rot_augment=rot_augment if name == "train" else None,
        )
        if cache == "device":
            loaders[name].device_resident = True
    return loaders


#: Bundled reference train/valid split of SPEED (10,200 / 1,800 entries) —
#: verbatim dataset metadata from the reference's
#: `src/data/datasets/speed_split/{train_no_valid,valid}.json`, vendored so
#: SPEED-score comparisons against the published baselines use the exact
#: same images (reference `datasets/speed.py:89-96`).
SPEED_SPLIT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "speed_split")


def _speed_split_file(path: str, name: str) -> str:
    """Per-dataset split override if present, else the bundled reference split."""
    local = os.path.join(path, name)
    return local if os.path.isfile(local) else os.path.join(SPEED_SPLIT_DIR, name)


def import_speed(path, batch_size, img_size, shuffle=False, seed=1001, rot_augment=None, cache=False):
    """SPEED splits: train/valid/real (`datasets/speed.py:35-118`)."""
    splits = {
        "train": (os.path.join(path, "images", "train"),
                  _speed_split_file(path, "train_no_valid.json")),
        "valid": (os.path.join(path, "images", "train"),
                  _speed_split_file(path, "valid.json")),
        "real": (os.path.join(path, "images", "real"), os.path.join(path, "real.json")),
    }
    data = _make_loaders(splits, batch_size, img_size, shuffle, seed, n_workers=16,
                         rot_augment=rot_augment, cache=cache)
    split = {"train": tuple(k for k in ("train", "valid", "real") if k in data),
             "eval": tuple(k for k in ("valid", "real") if k in data)}
    return data, split


def import_speed_plus(path, batch_size, img_size, shuffle=False, seed=1001, rot_augment=None, cache=False):
    """SPEED+ splits: train/valid/sunlamp/lightbox (`datasets/speed_plus.py:100-109`)."""
    sy = os.path.join(path, "synthetic")
    splits = {
        "train": (os.path.join(sy, "images"), os.path.join(sy, "train.json")),
        "valid": (os.path.join(sy, "images"), os.path.join(sy, "validation.json")),
        "sunlamp": (os.path.join(path, "sunlamp", "images"), os.path.join(path, "sunlamp", "test.json")),
        "lightbox": (os.path.join(path, "lightbox", "images"), os.path.join(path, "lightbox", "test.json")),
    }
    data = _make_loaders(splits, batch_size, img_size, shuffle, seed, n_workers=16,
                         rot_augment=rot_augment, cache=cache)
    split = {
        "train": tuple(k for k in ("train", "valid", "sunlamp", "lightbox") if k in data),
        "eval": tuple(k for k in ("valid", "sunlamp", "lightbox") if k in data),
    }
    return data, split


def import_dspeed(path, batch_size, img_size, shuffle=False, seed=1001, rot_augment=None, cache=False):
    """D-SPEED still splits: train/valid/test (`datasets/dspeed.py:88-116`)."""
    splits = {
        name: (os.path.join(path, name, "images"), os.path.join(path, name, "pose.json"))
        for name in ("train", "valid", "test")
    }
    data = _make_loaders(splits, batch_size, img_size, shuffle, seed, n_workers=64,
                         rot_augment=rot_augment, cache=cache)
    split = {"train": tuple(k for k in ("train", "valid", "test") if k in data),
             "eval": tuple(k for k in ("valid", "test") if k in data)}
    return data, split


def import_dspeed_video(path, batch_size, img_size):
    """D-SPEED video: one ordered loader per sequence dir
    (`datasets/dspeed.py:119-161`)."""
    data = {}
    for seq in sorted(os.listdir(path)):
        seq_dir = os.path.join(path, seq)
        labels = os.path.join(seq_dir, "pose.json")
        if not os.path.isfile(labels):
            continue
        manifest = Manifest.from_json(labels, os.path.join(seq_dir, "images"))
        data[seq] = BatchLoader(manifest, batch_size, img_size, shuffle=False, n_workers=8)
    split = {"eval": tuple(data.keys())}
    return data, split


def load_dataset(
    path: str,
    batch_size: int = 1,
    img_size: Tuple[int, int] = (240, 384),
    shuffle: bool = False,
    seed: int = 1001,
    rot_augment=None,
    cache: bool = False,
):
    """Dataset dispatch by path (reference `import_dataset.py:13-57`).

    ``rot_augment``: optional HostRotationAugment applied to the train split
    (host-side yaw warp with pose update; see data/augment_host.py).
    ``cache``: decode each split once and serve epochs from RAM
    (:class:`CachedBatchLoader`) — for multi-epoch training on few-core hosts.
    """
    kind = detect_dataset(path)
    if kind == "speed":
        return import_speed(path, batch_size, img_size, shuffle, seed, rot_augment, cache)
    if kind == "speed_plus":
        return import_speed_plus(path, batch_size, img_size, shuffle, seed, rot_augment, cache)
    if kind == "dspeed":
        return import_dspeed(path, batch_size, img_size, shuffle, seed, rot_augment, cache)
    return import_dspeed_video(path, batch_size, img_size)


def detect_dataset(path: str) -> str:
    """Dataset family from the path/layout: speed / speed_plus / dspeed /
    dspeed_video (reference keys this off the path name,
    `import_dataset.py:13-57`); raises for unrecognized layouts."""
    assert os.path.exists(path), f"Dataset path {path} does not exist"
    name = os.path.split(path.rstrip("/"))[-1]
    if name in ("speed", "speed_plus"):
        return name
    if "dspeed" in path and name == "still":
        return "dspeed"
    if name == "video":
        return "dspeed_video"
    # Fallback: any directory holding a train/ pose.json split behaves like
    # dspeed-still; otherwise per-sequence dirs each with their own pose.json
    # (the video layout) dispatch to the video importer, however the root is
    # named.
    if os.path.isdir(os.path.join(path, "train")):
        return "dspeed"
    if _looks_like_video_root(path):
        return "dspeed_video"
    raise ValueError(f"Dataset {name} not implemented")


def _looks_like_video_root(path: str) -> bool:
    """True if ``path`` holds per-sequence dirs each with its own pose.json
    (the D-SPEED video layout), regardless of how the root is named."""
    subdirs = [d for d in sorted(os.listdir(path))
               if os.path.isdir(os.path.join(path, d))]
    return bool(subdirs) and all(
        os.path.isfile(os.path.join(path, d, "pose.json")) for d in subdirs
    )
