"""ArrayRecord-backed training container — the TPU-native analog of the
reference's MXNet RecordIO face dataset (arcface_torch/dataset.py:19-48:
.rec/.idx packs of (jpeg bytes, label)).

Record format: 4-byte little-endian int32 label + encoded image bytes.
Random access via the array_record index; decoding via the native C++
loader when present, PIL otherwise.
"""

from __future__ import annotations

import io
import struct

import numpy as np


def write_record_dataset(path: str, images: list[bytes],
                         labels: list[int]) -> None:
    """Pack encoded image bytes + labels into one .array_record file."""
    from array_record.python.array_record_module import ArrayRecordWriter
    w = ArrayRecordWriter(path, "group_size:1")
    try:
        for img, lab in zip(images, labels):
            w.write(struct.pack("<i", int(lab)) + img)
    finally:
        w.close()


class RecordFaceDataset:
    """Random-access (image, label) dataset over an ArrayRecord pack
    (MXFaceDataset equivalent). Images come back float32 (size, size, 3)
    in [-1, 1]."""

    def __init__(self, path: str, size: int = 112):
        from array_record.python.array_record_module import \
            ArrayRecordReader
        self._reader = ArrayRecordReader(path)
        self.size = size
        self._n = self._reader.num_records()

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, idx: int):
        rec = self._reader.read([int(idx)])[0]
        label = struct.unpack("<i", rec[:4])[0]
        img = self._decode(rec[4:])
        return img, np.int32(label)

    def _decode(self, data: bytes) -> np.ndarray:
        from PIL import Image
        img = Image.open(io.BytesIO(data)).convert("RGB")
        if img.size != (self.size, self.size):
            img = img.resize((self.size, self.size), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0
        return (arr - 0.5) / 0.5


class SyntheticFaceDataset:
    """Random tensors + fixed label — the reference's SyntheticDataset
    (arcface_torch/dataset.py:32-34), used for speed benchmarking without
    data."""

    def __init__(self, size: int = 112, length: int = 1_000_000,
                 seed: int = 0):
        self.size = size
        self._n = length
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, idx: int):
        img = self._rng.standard_normal(
            (self.size, self.size, 3)).astype(np.float32)
        return img, np.int32(1)
