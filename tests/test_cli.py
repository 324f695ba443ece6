"""CLI entry-point smoke tests — train → eval → demo as subprocesses on a
synthetic VOC devkit (stock 20-class names so the stock pascal_voc imdb works
unmodified)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

TINY_SET = [
    "TRAIN.RPN_PRE_NMS_TOP_N", "256", "TRAIN.RPN_POST_NMS_TOP_N", "64",
    "TRAIN.BATCH_SIZE", "32", "TRAIN.SCALES", "[128]", "TRAIN.USE_FLIPPED", "False",
    "TEST.RPN_PRE_NMS_TOP_N", "128", "TEST.RPN_POST_NMS_TOP_N", "32",
    "TEST.SCALES", "[128]", "TEST.MAX_DETS_PER_IMAGE", "10",
    "ANCHOR_SCALES", "(2,3,5)", "DTYPE", "float32", "NMS_TILE", "64",
]


def _run(args, env, timeout=600):
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    from rlobjectdetection_tpu.data.synthetic import make_voc_devkit

    root = tmp_path_factory.mktemp("cli")
    make_voc_devkit(
        str(root), num_images=4, image_size=(128, 160),
        classes=("aeroplane", "bicycle", "bird"),
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["RLOD_DATA_DIR"] = str(root)
    env["RLOD_FORCE_CPU"] = "1"
    env["SAVE_DIR"] = str(root / "models")
    return env, str(root)


def test_trainval_then_testnet_cli(cli_env):
    env, root = cli_env
    save_dir = os.path.join(root, "models")
    r = _run(
        ["tools/trainval_net.py", "--dataset", "pascal_voc", "--net", "tiny",
         "--epochs", "1", "--bs", "2", "--lr", "0.002", "--disp_interval", "1",
         "--save_dir", save_dir, "--set"] + TINY_SET,
        env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    ckpt = os.path.join(save_dir, "tiny", "pascal_voc", "faster_rcnn_1_1")
    assert os.path.isdir(ckpt), os.listdir(save_dir)

    # eval the checkpoint; VOC test split exists in the synthetic devkit
    r2 = _run(
        ["tools/test_net.py", "--dataset", "pascal_voc", "--net", "tiny",
         "--load_dir", save_dir, "--checkepoch", "1", "--set"] + TINY_SET,
        env,
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "Mean AP" in r2.stdout

    # bucketed batched eval must produce the same AP table (test_net --batch)
    r3 = _run(
        ["tools/test_net.py", "--dataset", "pascal_voc", "--net", "tiny",
         "--load_dir", save_dir, "--checkepoch", "1", "--batch", "2",
         "--set"] + TINY_SET,
        env,
    )
    assert r3.returncode == 0, r3.stderr[-3000:]
    ap = lambda out: [l for l in out.stdout.splitlines() if "Mean AP" in l]
    assert ap(r3) == ap(r2), (ap(r2), ap(r3))


def test_demo_cli(cli_env, tmp_path):
    env, root = cli_env
    img_dir = os.path.join(
        root, "VOCdevkit2007", "VOC2007", "JPEGImages"
    )
    r = _run(
        ["tools/demo.py", "--net", "tiny", "--image_dir", img_dir,
         "--set"] + TINY_SET,
        env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    outs = [f for f in os.listdir(img_dir) if f.endswith("_det.jpg")]
    assert outs, "no _det.jpg outputs written"
