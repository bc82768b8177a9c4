"""Dataset readers matching the reference's on-disk contracts exactly.

Contracts (reference code/dataset.py):
  * `{root}/{split}/cropped_images/*.png|jpg` — 512² crops from the
    preprocessing pipeline.
  * `{root}/.../cropped_images/test.json` — {"labels": [[fname, [25
    floats]], ...]} 25-dim camera labels (camera2label.py:22-24), raw
    cameras.json (OpenCV) convention.
  * `{root}/transforms_{split}.json` — NeRF-style frames with
    "expression" vectors (dataset.py:307-316) / "img_id"+"aud_id"
    (dataset.py:405-409).
  * `{root}/aud.npy` — (N, 16, 29) DeepSpeech features.

Convention hygiene: the reference flips label columns here
(dataset.py:200) and flips them back inside every model forward
(headnerf.py:108) — a net no-op. These readers return RAW labels and the
models consume `label_convention="opencv"`; behavior is identical with
one flip function instead of two hidden mutations.

Images are float32 NHWC in [-1, 1] (transforms.Normalize(0.5, 0.5),
train_rgb.py:78-81).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterator

import numpy as np
from PIL import Image

from scipy.ndimage import gaussian_filter1d


def load_image(path: str, size: int | None = None) -> np.ndarray:
    """PNG/JPG → float32 (H, W, 3) in [-1, 1], optional bilinear resize."""
    img = Image.open(path).convert("RGB")
    if size is not None and img.size != (size, size):
        img = img.resize((size, size), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return (arr - 0.5) / 0.5


def _load_labels(label_path: str) -> dict[str, np.ndarray]:
    with open(label_path, "rb") as f:
        labels = json.load(f)["labels"]
    return {k: np.asarray(v, dtype=np.float32) for k, v in dict(labels).items()}


def _label_key(frame_path: str) -> str:
    # labels are keyed by '<stem>.png' regardless of the frame suffix
    # (dataset.py:206,440)
    return os.path.basename(frame_path).rsplit(".", 1)[0] + ".png"


class HeadData:
    """RGB training dataset (reference dataset.py:171-217)."""

    def __init__(self, split: str, size: int = 256,
                 root: str = "./datasets/nerface_dataset",
                 person: str = "person_3", ds_path: str | None = None,
                 suffix: str = ".png", sort: bool | None = None):
        if ds_path is None:
            sub = {"train": "train", "test": "test2",
                   "val": "test"}.get(split, split)
            ds_path = os.path.join(root, person, sub, "cropped_images")
        self.ds_path = ds_path
        self.size = size
        self.labels = _load_labels(os.path.join(ds_path, "test.json"))
        self.frames = glob.glob(os.path.join(ds_path, "*" + suffix))
        if sort if sort is not None else (split != "train"):
            self.frames = sorted(self.frames)
        if not self.frames:
            raise FileNotFoundError(f"no frames in {ds_path}")

    def __len__(self) -> int:
        return len(self.frames)

    def get_label(self, idx: int) -> np.ndarray:
        return self.labels[_label_key(self.frames[idx])]

    def __getitem__(self, idx: int):
        return (load_image(self.frames[idx], self.size),
                self.get_label(idx))

    def rotate_labels(self, yaw_deg: float = 30.0,
                      pitch_deg: float = 0.0) -> None:
        """Apply a fixed extra rotation to every pose — reference
        rotate_labels (dataset.py:319-337), used for novel-view demos."""
        from scipy.spatial.transform import Rotation as R
        rot = (R.from_rotvec([0, yaw_deg * np.pi / 180.0, 0])
               * R.from_rotvec([pitch_deg * np.pi / 180.0, 0, 0]))
        intr = np.array([4.2647, 0, 0.5, 0, 4.2647, 0.5, 0, 0, 1],
                        dtype=np.float32)
        for k, label in self.labels.items():
            m = label[:-9].reshape(4, 4).copy()
            m[:3, :] = rot.as_matrix() @ m[:3, :]
            self.labels[k] = np.concatenate(
                [m.reshape(-1), intr]).astype(np.float32)



class HeadDataTest(HeadData):
    """Sorted inference dataset with optional temporal label smoothing and
    label rotation (reference dataset.py:222-337)."""

    def __init__(self, *args, smooth_sigma: float | None = None, **kw):
        kw.setdefault("sort", True)
        super().__init__(*args, **kw)
        if smooth_sigma:
            self.labels = self._smooth_labels(smooth_sigma)

    def _smooth_labels(self, sigma: float) -> dict[str, np.ndarray]:
        keys = [_label_key(f) for f in self.frames]
        arr = np.stack([self.labels[k] for k in keys])
        arr = gaussian_filter1d(arr, sigma, axis=0)
        return {k: arr[i] for i, k in enumerate(keys)}


class HeadData3DMM(HeadData):
    """Adds per-frame 3DMM expression vectors (dataset.py:285-373)."""

    def __init__(self, split: str, size: int = 256,
                 root: str = "./datasets/nerface_dataset",
                 person: str = "person_3", ds_path: str | None = None,
                 **kw):
        super().__init__(split, size, root, person, ds_path, **kw)
        with open(os.path.join(root, person,
                               f"transforms_{split}.json")) as fp:
            metas = json.load(fp)
        self.expressions = {}
        for frame in metas["frames"]:
            fname = frame["file_path"].split("/")[-1] + ".png"
            self.expressions[fname] = np.asarray(frame["expression"],
                                                 dtype=np.float32)

    def __getitem__(self, idx: int):
        img, label = super().__getitem__(idx)
        return img, label, self.expressions[_label_key(self.frames[idx])]


class HeadDataAudio(HeadData):
    """Adds DeepSpeech audio windows (dataset.py:378-453). Frames are
    .jpg named by integer index; aud.npy is (N, 16, 29)."""

    def __init__(self, split: str, size: int = 256,
                 root: str = "./datasets/ad_dataset",
                 person: str = "obama", ds_path: str | None = None,
                 smo_size: int = 8, **kw):
        kw.setdefault("suffix", ".jpg")
        if ds_path is None:
            sub = {"train": "train", "val": "test"}.get(split, split)
            ds_path = os.path.join(root, person, sub, "cropped_images")
        super().__init__(split, size, root, person, ds_path, **kw)
        if split != "train":
            self.frames = sorted(
                self.frames,
                key=lambda x: int(os.path.basename(x).split(".")[0]))
        self.smo_size = smo_size
        self.aud_features = np.load(
            os.path.join(os.path.dirname(os.path.dirname(ds_path)),
                         "aud.npy")).astype(np.float32)
        with open(os.path.join(root, person,
                               f"transforms_{split}.json")) as fp:
            metas = json.load(fp)
        self.aud_ids = {}
        for frame in metas["frames"]:
            fname = str(frame["img_id"]) + ".jpg"
            self.aud_ids[fname] = min(frame["aud_id"],
                                      self.aud_features.shape[0] - 1)

    def frame_index(self, idx: int) -> int:
        return int(os.path.basename(self.frames[idx]).split(".")[0])

    def get_audio(self, idx: int) -> np.ndarray:
        fname = os.path.basename(self.frames[idx])
        return self.aud_features[self.aud_ids[fname]]

    def get_audio_window(self, idx: int) -> np.ndarray:
        """Zero-padded smo_size window around the frame — the reference's
        auds[i-4:i+4] slice (trainer_audio.py:67-84), moved host-side so
        the jitted step sees static shapes."""
        img_i = self.frame_index(idx)
        half = self.smo_size // 2
        n = len(self)
        win = np.zeros((self.smo_size, *self.aud_features.shape[1:]),
                       dtype=np.float32)
        for j, i in enumerate(range(img_i - half, img_i + half)):
            if 0 <= i < min(n, self.aud_features.shape[0]):
                win[j] = self.aud_features[i]
        return win

    def __getitem__(self, idx: int):
        img, label = super().__getitem__(idx)
        return img, label, self.get_audio(idx), self.frame_index(idx)


class BatchIterator:
    """Shuffled epoch batcher → stacked numpy arrays.

    The DistributedSampler equivalent (utils_distributed_sampler.py:11-126):
    the index permutation is seed-synced, so every process draws the SAME
    global batch order; with num_shards > 1 each process then loads ONLY
    its own `batch_size/num_shards` rows of every global batch (the
    reference's per-rank reader contract — no host ever decodes the full
    global batch) and parallel.shard_batch assembles the global array from
    the per-process slices."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True,
                 collate=None, num_shards: int = 1, shard_index: int = 0):
        assert batch_size % num_shards == 0, \
            f"global batch {batch_size} must divide shard count {num_shards}"
        assert 0 <= shard_index < num_shards
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.collate = collate
        self.num_shards = num_shards
        self.shard_index = shard_index

    def __iter__(self) -> Iterator:
        n = len(self.dataset)
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        bs = self.batch_size
        end = (n // bs) * bs if self.drop_last else n
        local = bs // self.num_shards
        for i in range(0, end, bs):
            idxs = order[i:i + bs]
            if self.num_shards > 1:
                # this process's rows of the global batch — the slice
                # parallel.mesh.process_local_batch would take, loaded
                # directly instead of after a full global decode
                idxs = idxs[self.shard_index * local:
                            (self.shard_index + 1) * local]
            items = [self.dataset[int(j)] for j in idxs]
            if self.collate is not None:
                yield self.collate(items)
            else:
                yield tuple(np.stack(col) for col in zip(*items))

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)


def process_sharded(dataset, batch_size: int, **kw) -> "BatchIterator":
    """BatchIterator that loads only this jax process's slice of every
    global batch (identity on single-process runs)."""
    import jax
    return BatchIterator(dataset, batch_size,
                         num_shards=jax.process_count(),
                         shard_index=jax.process_index(), **kw)


def infinite_batches(loader: BatchIterator) -> Iterator:
    """`sample_data` equivalent (train_rgb.py:24-27)."""
    while True:
        yield from loader


class EpochSeededBatches:
    """Stateless, resumable batch stream: batch t is a PURE FUNCTION of
    (seed, t) — the permutation is reseeded per epoch exactly like the
    reference's DistributedSampler.set_epoch contract
    (utils_distributed_sampler.py:63-71), so a run checkpointed at step k
    and restarted with start_batch=k replays the identical data order
    with no batches re-read. Per-process sharding as in BatchIterator:
    every process sees the same global permutation but loads only its
    own batch_size/num_shards rows."""

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 num_shards: int = 1, shard_index: int = 0,
                 start_batch: int = 0):
        assert batch_size % num_shards == 0
        assert 0 <= shard_index < num_shards
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.start_batch = start_batch
        self._bpe = max(len(dataset) // batch_size, 1)
        self._cached_epoch = None
        self._order = None

    def batch_indices(self, t: int) -> np.ndarray:
        """Global (then shard-sliced) dataset indices of batch t."""
        epoch, off = divmod(t, self._bpe)
        if epoch != self._cached_epoch:
            self._order = np.random.default_rng(
                [self.seed, epoch]).permutation(len(self.dataset))
            self._cached_epoch = epoch
        bs = self.batch_size
        idxs = self._order[off * bs:(off + 1) * bs]
        if len(idxs) < bs:          # tail epoch smaller than one batch
            idxs = np.resize(idxs, bs)
        local = bs // self.num_shards
        return idxs[self.shard_index * local:
                    (self.shard_index + 1) * local]

    def load(self, t: int):
        items = [self.dataset[int(j)] for j in self.batch_indices(t)]
        return tuple(np.stack(col) for col in zip(*items))

    def __iter__(self) -> Iterator:
        t = self.start_batch
        while True:
            yield self.load(t)
            t += 1
