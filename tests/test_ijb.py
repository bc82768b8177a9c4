"""IJB protocol evaluator e2e on a tiny synthetic fixture (VERDICT r4
missing #3): builds the insightface meta layout (face_tid_mid,
template_pair_label, name_5pts_score, loose_crop/) for 3 subjects ×
2 templates × 2 media, runs `cli/eval_ijb.py` end-to-end with random
backbone weights, and checks the protocol separates same-subject
template pairs (images of one subject are near-identical crops, so any
deterministic embedding scores them above cross-subject pairs).
Reference surface: arcface_torch/eval_ijbc.py."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from hfa_gp_tpu.preprocess.warp import ARCFACE_5PTS


def _make_fixture(root: str, n_subjects: int = 3):
    from PIL import Image
    meta = os.path.join(root, "meta")
    crop = os.path.join(root, "loose_crop")
    os.makedirs(meta)
    os.makedirs(crop)
    rng = np.random.default_rng(0)
    h, w = 130, 120                       # non-square loose crops
    bases = rng.integers(0, 255, (n_subjects, h, w, 3)).astype(np.uint8)
    # landmarks at the canonical points (shifted by the crop offset) so
    # the similarity solve is a near-identity translation
    lm = ARCFACE_5PTS + np.array([4.0, 9.0], np.float32)

    tid_mid, name_pts = [], []
    tid_subject = {}
    tid = 0
    for s in range(n_subjects):
        for t in range(2):                # 2 templates per subject
            tid_subject[tid] = s
            for m in range(2):            # 2 media per template
                name = f"s{s}_t{t}_m{m}.png"
                img = bases[s].astype(np.int16) + rng.integers(
                    -4, 5, bases[s].shape, dtype=np.int16)
                Image.fromarray(
                    np.clip(img, 0, 255).astype(np.uint8)).save(
                        os.path.join(crop, name))
                tid_mid.append(f"{name} {tid} {m}")
                pts = " ".join(f"{v:.2f}" for v in lm.reshape(-1))
                name_pts.append(f"{name} {pts} 0.99")
            tid += 1

    pairs = []
    tids = sorted(tid_subject)
    for i in range(len(tids)):
        for j in range(i + 1, len(tids)):
            same = int(tid_subject[tids[i]] == tid_subject[tids[j]])
            pairs.append(f"{tids[i]} {tids[j]} {same}")

    with open(os.path.join(meta, "ijbc_face_tid_mid.txt"), "w") as f:
        f.write("\n".join(tid_mid))
    with open(os.path.join(meta, "ijbc_template_pair_label.txt"),
              "w") as f:
        f.write("\n".join(pairs))
    with open(os.path.join(meta, "ijbc_name_5pts_score.txt"), "w") as f:
        f.write("\n".join(name_pts))
    # 1:N: gallery = template 0 of each subject, probe = template 1
    with open(os.path.join(meta, "ijbc_1N_gallery.txt"), "w") as f:
        f.write("\n".join(f"{t} {s}" for t, s in tid_subject.items()
                          if t % 2 == 0))
    with open(os.path.join(meta, "ijbc_1N_probe.txt"), "w") as f:
        f.write("\n".join(f"{t} {s}" for t, s in tid_subject.items()
                          if t % 2 == 1))
    return root


@pytest.mark.smoke
def test_eval_ijb_cli(tmp_path):
    from hfa_gp_tpu.cli import eval_ijb

    root = _make_fixture(str(tmp_path / "ijb"))
    out = str(tmp_path / "res")
    args = eval_ijb.build_argparser().parse_args([
        "--image_path", root, "--network", "iresnet18",
        "--batch_size", "4", "--canvas", "160", "--result_dir", out,
        "--job", "t"])
    metrics = eval_ijb.main(args)

    scores = np.load(os.path.join(out, "t_scores.npy"))
    assert len(scores) == 15              # C(6,2) template pairs
    with open(os.path.join(out, "t_metrics.json")) as f:
        saved = json.load(f)
    assert saved["tar_at_far"] == metrics["tar_at_far"]
    # near-identical same-subject crops must separate cleanly even
    # under random weights: every TAR@FAR=0.1 accepts all positives
    assert metrics["tar_at_far"]["1e-01"] == 1.0
    # 1:N: probe template t1 of each subject must retrieve its own
    # subject's gallery template at rank 1
    assert metrics["rank_k"]["1"] == 1.0
