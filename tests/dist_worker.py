"""Worker process for the 2-process jax.distributed localhost test.

Run: python tests/dist_worker.py RANK NPROCS PORT NDEV_LOCAL OUT_JSON

Each process owns NDEV_LOCAL forced-CPU devices; the global mesh spans
NPROCS × NDEV_LOCAL devices. All processes build the same deterministic global
batch; `shard_global_batch` feeds each host's slice. Rank 0 writes the loss +
per-leaf param checksums after one train step so the launcher can compare runs
with different process topologies (the multi-host wiring of SURVEY.md §2.6).
"""

import json
import os
import sys

rank, nprocs, port, ndev_local = map(int, sys.argv[1:5])
out_path = sys.argv[5]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={ndev_local} "
    + os.environ.get("XLA_FLAGS", "")
)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# The session presets JAX_PLATFORMS=axon and the plugin ignores the env
# override — force CPU through the config (memory: tpu-rebuild-lessons).
jax.config.update("jax_platforms", "cpu")

from rlobjectdetection_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()  # host-fingerprinted: repeat dryruns skip compiles

if nprocs > 1:
    jax.distributed.initialize(f"localhost:{port}", num_processes=nprocs,
                               process_id=rank)

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rlobjectdetection_tpu.config import Config  # noqa: E402
from rlobjectdetection_tpu.engine import build_optimizer, make_train_step  # noqa: E402
from rlobjectdetection_tpu.engine.train import TrainState  # noqa: E402
from rlobjectdetection_tpu.models import FasterRCNN  # noqa: E402
from rlobjectdetection_tpu.parallel import make_hybrid_mesh, replicate  # noqa: E402
from rlobjectdetection_tpu.parallel.distributed import (  # noqa: E402
    fetch_scalar, shard_global_batch,
)


def main():
    assert len(jax.devices()) == nprocs * ndev_local

    cfg = dataclasses.replace(
        Config(), DTYPE="float32", ANCHOR_SCALES=(2, 3, 5), NMS_TILE=64,
        MAX_NUM_GT_BOXES=8,
    )
    cfg = dataclasses.replace(
        cfg,
        TRAIN=dataclasses.replace(
            cfg.TRAIN, RPN_PRE_NMS_TOP_N=256, RPN_POST_NMS_TOP_N=64,
            BATCH_SIZE=32),
    )
    model = FasterRCNN(num_classes=4, backbone="tiny", cfg=cfg)

    rng = np.random.RandomState(0)
    # one image per global device: the global batch is identical for every
    # process topology with the same device total (loss-equality contract)
    b, h, w, g = nprocs * ndev_local, 64, 80, 8
    gt = np.zeros((b, g, 5), np.float32)
    for i in range(b):
        for j in range(4):
            x1, y1 = rng.randint(0, w - 30), rng.randint(0, h - 30)
            gt[i, j] = [x1, y1, x1 + rng.randint(10, 28), y1 + rng.randint(10, 28),
                        1 + rng.randint(3)]
    batch = {
        "data": rng.randn(b, h, w, 3).astype(np.float32) * 5,
        "im_info": np.array([[h, w, 1.0]] * b, np.float32),
        "gt_boxes": gt,
        "num_boxes": np.full((b,), 4, np.int32),
    }

    mesh = make_hybrid_mesh()   # host-contiguous order (ICI-first reduce)
    with mesh:
        key = jax.random.PRNGKey(3)
        params = jax.jit(model.init, static_argnames="train")(
            {"params": key, "sampling": key, "dropout": key},
            jnp.asarray(batch["data"]), jnp.asarray(batch["im_info"]),
            jnp.asarray(batch["gt_boxes"]), jnp.asarray(batch["num_boxes"]),
            train=True,
        )["params"]
        tx, _ = build_optimizer(params, "tiny", 0.01)
        state = TrainState(params, tx.init(params), jnp.int32(0))
        state = state._replace(params=replicate(mesh, state.params),
                               opt_state=replicate(mesh, state.opt_state))
        step = make_train_step(model, tx)
        sharded = shard_global_batch(mesh, batch)
        state, metrics = step(state, sharded, jax.random.PRNGKey(42))

        loss = fetch_scalar(metrics["loss"])
        sums = []
        for leaf in jax.tree_util.tree_leaves(state.params):
            if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
                leaf = leaf.addressable_data(0)
            sums.append(float(np.abs(np.asarray(leaf, np.float64)).sum()))

        # checkpoint roundtrip under this process topology: EVERY process
        # calls save/load (orbax synchronizes all hosts — a rank-0-only call
        # deadlocks, the engine/checkpoint.py contract)
        from rlobjectdetection_tpu.engine.checkpoint import (  # noqa: E402
            load_checkpoint, save_checkpoint,
        )

        ckpt_dir = out_path + f".ckpt{nprocs}"
        save_checkpoint(ckpt_dir, state, session=7, epoch=1)
        fresh = TrainState(params, tx.init(params), jnp.int32(0))
        restored, meta = load_checkpoint(ckpt_dir, fresh)
        assert meta["session"] == 7 and meta["epoch"] == 1, meta
        ck_ok = True
        for a, b2 in zip(jax.tree_util.tree_leaves(state.params),
                         jax.tree_util.tree_leaves(restored.params)):
            if isinstance(a, jax.Array) and not a.is_fully_addressable:
                a = a.addressable_data(0)
            ck_ok &= bool(np.allclose(np.asarray(a), np.asarray(b2)))

    if rank == 0:
        with open(out_path, "w") as f:
            json.dump({"loss": loss, "fg": fetch_scalar(metrics["fg_cnt"]),
                       "bg": fetch_scalar(metrics["bg_cnt"]), "sums": sums,
                       "ckpt_roundtrip": ck_ok}, f)


if __name__ == "__main__":
    main()
