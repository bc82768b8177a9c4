"""Synthetic on-disk dataset fixtures matching the reference's contracts
(the SyntheticDataset trick of arcface's speed benchmark, SURVEY.md §4:
exercise the full pipeline without real data)."""

import json
import os

import numpy as np
from PIL import Image


def make_avatar_dataset(root: str, person: str = "person_3",
                        n_train: int = 6, n_test: int = 4,
                        size: int = 64, audio: bool = False,
                        seed: int = 0) -> str:
    """Create {root}/{person}/{train,test2|test}/cropped_images with pngs
    (or jpgs for audio), test.json labels, transforms_*.json, aud.npy."""
    rng = np.random.default_rng(seed)
    suffix = ".jpg" if audio else ".png"
    splits = {"train": n_train, ("test" if audio else "test2"): n_test}
    intr = [4.2647, 0, 0.5, 0, 4.2647, 0.5, 0, 0, 1]

    for split, n in splits.items():
        d = os.path.join(root, person, split, "cropped_images")
        os.makedirs(d, exist_ok=True)
        labels = []
        for i in range(n):
            if audio:
                fname = f"{i}{suffix}"
            else:
                fname = f"f_{i:04d}{suffix}"
            img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            Image.fromarray(img, "RGB").save(os.path.join(d, fname))
            pose = np.eye(4)
            pose[:3, 3] = [0.1 * i, 0, 2.7]
            label = pose.reshape(-1).tolist() + intr
            labels.append([fname.rsplit(".", 1)[0] + ".png", label])
        with open(os.path.join(d, "test.json"), "w") as f:
            json.dump({"labels": labels}, f)

    # transforms_{split}.json with expressions / audio ids
    for split, n in (("train", n_train),
                     (("val" if audio else "test"), n_test)):
        frames = []
        for i in range(n):
            fr = {"transform_matrix": np.eye(4).tolist()}
            if audio:
                fr["img_id"] = i
                fr["aud_id"] = i
            else:
                fr["file_path"] = f"./images/f_{i:04d}"
                fr["expression"] = rng.standard_normal(76).tolist()
            frames.append(fr)
        with open(os.path.join(root, person,
                               f"transforms_{split}.json"), "w") as f:
            json.dump({"frames": frames}, f)

    if audio:
        auds = rng.standard_normal(
            (n_train + n_test, 16, 29)).astype(np.float32)
        np.save(os.path.join(root, person, "aud.npy"), auds)
    return os.path.join(root, person)
