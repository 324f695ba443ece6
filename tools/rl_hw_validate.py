#!/usr/bin/env python
"""RL workload end-to-end hardware validation (VERDICT r2 item 5).

Mirrors the detector's synthetic-data real-chip cycle for the RL branch —
the repo owner's actual contribution (SURVEY.md intro): generate detections
with a SYSTEMATIC localization error, build ΔIoU labels, train the policy
net on the device, evaluate with `move_from_act`, re-score with `cocoval`,
and require post-move mAP ≥ pre-move. A constant box shift makes specific
move actions consistently IoU-improving, so a working end-to-end stack must
learn them (reference eval-loop semantics: trainval_net.py:175-261, repaired
per SURVEY §2.7).

Run on the TPU:   python tools/rl_hw_validate.py [--epochs N]
Run on CPU (CI):  RLOD_FORCE_CPU=1 JAX_PLATFORMS=cpu python tools/rl_hw_validate.py

Prints ONE JSON line: {"pre_map": ..., "post_map": ..., "delta": ...,
"preck": ..., "ok": true}.
"""

import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

import numpy as np


def build_fixture(root, num_images=16, image_size=(240, 320), shift=(7.0, -5.0)):
    """Synthetic COCO + detections whose boxes are gt shifted by a constant
    (dx, dy) — learnable: the inverse move fixes every detection."""
    from rlobjectdetection_tpu.data.synthetic import make_coco_dataset

    ann = make_coco_dataset(root, num_images=num_images, split="val",
                            year="2014", image_size=image_size)
    with open(ann) as f:
        gt = json.load(f)
    h, w = image_size
    dets = []
    for a in gt["annotations"]:
        x, y, bw, bh = a["bbox"]
        x = min(max(x + shift[0], 0.0), w - bw - 1)
        y = min(max(y + shift[1], 0.0), h - bh - 1)
        dets.append({"image_id": a["image_id"], "category_id": a["category_id"],
                     "bbox": [float(x), float(y), float(bw), float(bh)],
                     "score": 0.9})
    dt_file = os.path.join(root, "dets.json")
    with open(dt_file, "w") as f:
        json.dump(dets, f)
    img_dir = os.path.join(root, "coco", "images", "val2014")
    return ann, dt_file, img_dir


def run_cli(args, timeout=3600):
    r = subprocess.run([sys.executable] + args, cwd=REPO,
                       capture_output=True, text=True, timeout=timeout)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-4000:])
        raise SystemExit(f"subcommand failed: {' '.join(args)}")
    return r.stdout + r.stderr


def main():
    from rlobjectdetection_tpu.data.coco_eval import cocoval

    epochs = 3
    if "--epochs" in sys.argv:
        epochs = int(sys.argv[sys.argv.index("--epochs") + 1])

    root = tempfile.mkdtemp(prefix="rl_hw_")
    ann, dt_file, img_dir = build_fixture(root)

    print("== pre-move mAP (shifted detections) ==", flush=True)
    pre = cocoval(ann, dt_file)

    save_dir = os.path.join(root, "rl_models")
    common = ["--ann_file", ann, "--dt_file", dt_file, "--data_dir", img_dir,
              "--save_dir", save_dir, "--img_short", "224", "--img_size", "320",
              "--layers", "50", "--batch_size", "4", "--lr", "0.01"]
    run_cli(["tools/trainval_rl.py", "--epochs", str(epochs)] + common)
    out = run_cli(["tools/trainval_rl.py", "-e",
                   "--resume", os.path.join(save_dir, f"rl_epoch_{epochs}"),
                   "--maxk", "1"] + common)
    m = re.search(r"precision@1: ([0-9.]+)%", out)
    preck = float(m.group(1)) if m else -1.0

    print("== post-move mAP (policy-refined detections) ==", flush=True)
    post = cocoval(ann, os.path.join(save_dir, "rl_results.json"))

    rec = {"metric": "rl_e2e_hw_validation",
           "pre_map50": round(float(pre[1]), 4),
           "post_map50": round(float(post[1]), 4),
           "pre_map": round(float(pre[0]), 4),
           "post_map": round(float(post[0]), 4),
           "delta_map": round(float(post[0] - pre[0]), 4),
           "preck": preck,
           "ok": bool(post[0] >= pre[0])}
    print(json.dumps(rec))
    assert rec["ok"], "post-move mAP regressed vs pre-move"


if __name__ == "__main__":
    main()
