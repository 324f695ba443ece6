"""Checkpoint-resume bitwise-equality validation.

Proves the failure-recovery contract end-to-end through the REAL trainer CLI:
training E epochs in one process produces the same final state — bit for bit —
as training to epoch k, killing the process, and resuming (`--r`) in a fresh
one. Three mechanisms make this hold (each individually tested on CPU):

  * epoch-keyed batch plans (`RoiBatchLoader.set_epoch`) — a resumed process
    replays the interrupted run's exact data order, unlike the reference,
    whose sampler draws from one global torch stream
    (/root/reference/RCNN_bases/trainval_net.py:123-146) and therefore
    restarts the permutation sequence on resume;
  * step keys `fold_in(key, global_step)` with `global_step` restored from
    the checkpoint (tools/trainval_net.py);
  * the orbax checkpoint round-trip restoring params/opt_state/step exactly
    (engine/checkpoint.py).

Run on the real chip it additionally pins XLA:TPU execution determinism for
the full train step (conv autotuning or nondeterministic reductions would
break equality). Usage:

    python tools/resume_validate.py [--net tiny|res50] [--epochs 2]

Prints one JSON line {"metric": "resume_bitwise_equality", ...}.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

TINY_SET = [
    "TRAIN.RPN_PRE_NMS_TOP_N", "256", "TRAIN.RPN_POST_NMS_TOP_N", "64",
    "TRAIN.BATCH_SIZE", "32", "TRAIN.SCALES", "[128]",
    "TRAIN.USE_FLIPPED", "False",
    "ANCHOR_SCALES", "(2,3,5)", "DTYPE", "float32", "NMS_TILE", "64",
]


def _train(save_dir, env, net, epochs, resume_epoch=None):
    args = [
        sys.executable, "tools/trainval_net.py", "--dataset", "pascal_voc",
        "--net", net, "--epochs", str(epochs), "--bs", "2", "--lr", "0.002",
        "--disp_interval", "1", "--save_dir", save_dir,
    ]
    if resume_epoch is not None:
        args += ["--r", "--checkepoch", str(resume_epoch)]
    args += ["--set"] + TINY_SET
    r = subprocess.run(args, cwd=REPO, env=env, capture_output=True,
                       text=True, timeout=1800)
    if r.returncode != 0:
        raise SystemExit(f"trainer failed:\n{r.stderr[-4000:]}")


def _leaves(ckpt):
    from rlobjectdetection_tpu.engine.checkpoint import load_checkpoint

    tree, _ = load_checkpoint(ckpt)
    import jax

    return {jax.tree_util.keystr(k): np.asarray(v) for k, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def main():
    from tools._env import setup_platform

    setup_platform()
    p = argparse.ArgumentParser()
    p.add_argument("--net", default="tiny")
    p.add_argument("--epochs", default=2, type=int)
    p.add_argument("--work_dir", default=None)
    args = p.parse_args()
    assert args.epochs >= 2, "need at least one epoch on each side of the cut"

    work = args.work_dir or tempfile.mkdtemp(prefix="resume_val_")
    from rlobjectdetection_tpu.data.synthetic import make_voc_devkit

    devkit = os.path.join(work, "devkit")
    if not os.path.isdir(devkit):
        make_voc_devkit(devkit, num_images=8, image_size=(128, 160),
                        classes=("aeroplane", "bicycle", "bird"))
    env = dict(os.environ)
    env["RLOD_DATA_DIR"] = devkit

    dir_a = os.path.join(work, "uninterrupted")
    dir_b = os.path.join(work, "resumed")
    # A: straight through.  B: stop after epoch 1, resume in a new process.
    _train(dir_a, env, args.net, args.epochs)
    _train(dir_b, env, args.net, 1)
    _train(dir_b, env, args.net, args.epochs, resume_epoch=1)

    tail = f"{args.net}/pascal_voc/faster_rcnn_1_{args.epochs}"
    la = _leaves(os.path.join(dir_a, tail))
    lb = _leaves(os.path.join(dir_b, tail))
    assert la.keys() == lb.keys(), "checkpoint trees differ in structure"
    max_delta = 0.0
    for k in la:
        if la[k].dtype.kind in "fiu":
            max_delta = max(max_delta,
                            float(np.max(np.abs(la[k].astype(np.float64)
                                                - lb[k].astype(np.float64)))))
        else:
            assert np.array_equal(la[k], lb[k]), k

    import jax

    ok = max_delta == 0.0
    print(json.dumps({
        "metric": "resume_bitwise_equality",
        "net": args.net, "epochs": args.epochs,
        "backend": jax.default_backend(),
        "n_leaves": len(la), "max_abs_delta": max_delta, "ok": ok,
    }))
    if args.work_dir is None:
        shutil.rmtree(work, ignore_errors=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
