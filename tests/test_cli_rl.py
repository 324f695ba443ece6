"""RL refinement CLI end-to-end: train an epoch on synthetic COCO + detections,
then evaluate (Preck + COCO rescoring) — the path that crashes in the committed
reference (SURVEY.md §2.7)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def rl_cli_env(tmp_path_factory):
    from rlobjectdetection_tpu.data.synthetic import make_coco_dataset

    root = tmp_path_factory.mktemp("rl_cli")
    ann = make_coco_dataset(str(root), num_images=3, split="val", year="2014",
                            image_size=(120, 160))
    with open(ann) as f:
        gt = json.load(f)
    rng = np.random.RandomState(0)
    dets = []
    for a in gt["annotations"]:
        b = list(a["bbox"])
        b[0] += float(rng.randn() * 2)
        dets.append({"image_id": a["image_id"], "category_id": a["category_id"],
                     "bbox": [float(x) for x in b], "score": 0.8})
    dt_file = os.path.join(str(root), "dets.json")
    with open(dt_file, "w") as f:
        json.dump(dets, f)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["RLOD_FORCE_CPU"] = "1"
    img_dir = os.path.join(str(root), "coco", "images", "val2014")
    return env, str(root), ann, dt_file, img_dir


def _run(args, env, timeout=560):
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


def test_rl_train_then_eval_cli(rl_cli_env):
    env, root, ann, dt_file, img_dir = rl_cli_env
    save_dir = os.path.join(root, "rl_models")
    common = ["--ann_file", ann, "--dt_file", dt_file, "--data_dir", img_dir,
              "--save_dir", save_dir, "--img_short", "96", "--img_size", "160",
              "--layers", "50", "--batch_size", "1"]
    r = _run(["tools/trainval_rl.py", "--epochs", "1"] + common, env)
    assert r.returncode == 0, r.stderr[-3000:]
    ckpt = os.path.join(save_dir, "rl_epoch_1")
    assert os.path.isdir(ckpt)

    r2 = _run(["tools/trainval_rl.py", "-e", "--resume", ckpt, "--maxk", "1"]
              + common, env)
    assert r2.returncode == 0, r2.stderr[-3000:]
    combined = r2.stdout + r2.stderr
    assert "Preck" in combined
    # COCO rescoring produced the standard summary
    assert "Average Precision" in combined
    assert os.path.exists(os.path.join(save_dir, "rl_results.json"))
