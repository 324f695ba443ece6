"""RL-trainer checkpoint-resume bitwise-equality validation.

The RL twin of tools/resume_validate.py: proves that training the RL
refinement net E epochs in one process produces the same final state — bit for
bit — as training to epoch k, killing the process, and resuming (`--resume`)
in a fresh one, through the REAL trainer CLI (tools/trainval_rl.py).

Three mechanisms make this hold:

  * epoch-keyed batch plans + per-item transform rng
    (data/rl_coco.py::COCODataLoader.set_epoch): batch order and every random
    resize/flip draw are pure functions of (seed, epoch, index), so a resumed
    process replays the interrupted run's exact stream. The reference RL loop
    draws from one global torch stream and cannot replay
    (/root/reference/trainval_net.py:129-133 resume path — repaired by spec);
  * the lr schedule reads the step count restored inside opt_state
    (optax.scale_by_schedule), not wall-clock epoch arithmetic;
  * the orbax checkpoint round-trip restoring params/opt_state/step exactly
    (engine/checkpoint.py).

Usage:  python tools/rl_resume_validate.py [--epochs 2] [--layers 18]
Prints one JSON line {"metric": "rl_resume_bitwise_equality", ...}.
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


def _make_data(work):
    from rlobjectdetection_tpu.data.synthetic import make_coco_dataset

    ann = make_coco_dataset(work, num_images=6, split="val", year="2014")
    with open(ann) as f:
        gt = json.load(f)
    rng = np.random.RandomState(0)
    dets = []
    for a in gt["annotations"]:
        b = list(a["bbox"])
        b[0] += rng.randn() * 2
        b[1] += rng.randn() * 2
        dets.append({"image_id": a["image_id"], "category_id": a["category_id"],
                     "bbox": [float(x) for x in b], "score": 0.8})
    dt_file = os.path.join(work, "dets.json")
    with open(dt_file, "w") as f:
        json.dump(dets, f)
    img_dir = os.path.join(work, "coco", "images", "val2014")
    return ann, dt_file, img_dir


def _train(save_dir, env, data, layers, epochs, resume=None):
    ann, dt_file, img_dir = data
    args = [
        sys.executable, "tools/trainval_rl.py",
        "--ann_file", ann, "--dt_file", dt_file, "--data_dir", img_dir,
        "--save_dir", save_dir, "--batch_size", "2", "--epochs", str(epochs),
        "--layers", str(layers), "--img_short", "96", "--img_size", "160",
        "--max_stat_dets", "64", "--stat_workers", "1",
    ]
    if resume is not None:
        args += ["--resume", resume]
    r = subprocess.run(args, cwd=REPO, env=env, capture_output=True,
                       text=True, timeout=1800)
    if r.returncode != 0:
        raise SystemExit(f"RL trainer failed:\n{r.stderr[-4000:]}")


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
    p.add_argument("--epochs", default=2, type=int)
    p.add_argument("--layers", default=18, type=int)
    p.add_argument("--work_dir", default=None)
    args = p.parse_args()
    assert args.epochs >= 2, "need at least one epoch on each side of the cut"

    work = args.work_dir or tempfile.mkdtemp(prefix="rl_resume_val_")
    data = _make_data(work)
    env = dict(os.environ)

    dir_a = os.path.join(work, "uninterrupted")
    dir_b = os.path.join(work, "resumed")
    # A: straight through.  B: stop after epoch 1, resume in a new process.
    _train(dir_a, env, data, args.layers, args.epochs)
    _train(dir_b, env, data, args.layers, 1)
    _train(dir_b, env, data, args.layers, args.epochs,
           resume=os.path.join(dir_b, "rl_epoch_1"))

    la = _leaves(os.path.join(dir_a, f"rl_epoch_{args.epochs}"))
    lb = _leaves(os.path.join(dir_b, f"rl_epoch_{args.epochs}"))
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
        "metric": "rl_resume_bitwise_equality",
        "layers": args.layers, "epochs": args.epochs,
        "backend": jax.default_backend(),
        "n_leaves": len(la), "max_abs_delta": max_delta, "ok": ok,
    }))
    if args.work_dir is None:
        shutil.rmtree(work, ignore_errors=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
