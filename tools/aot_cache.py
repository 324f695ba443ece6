#!/usr/bin/env python
"""AOT executable serialization probe — attack the per-process compile tax.

Every fresh TPU process pays the full train-step compile (~5-7 min on the
tunneled axon backend; the persistent jit cache serves CPU compiles but NOT
axon executables — CLAUDE.md, DESIGN.md). The serving path already proves
`jax.export` round-trips work for the eval step; this tool measures whether
`jax.experimental.serialize_executable` can do the same for the TRAIN step:

  python tools/aot_cache.py save [bs] [path]   # compile + serialize, timed
  python tools/aot_cache.py load [bs] [path]   # deserialize + run ONE step,
                                               # report time-to-first-step

Run `save` in one process and `load` in a second: the load-side wall time is
the answer to "what does a restarted trainer pay?". Results recorded in
DESIGN.md ("Attacking the compile tax").
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _build(batch_size):
    """The bench.py train step at bench shapes (kept in sync with bench.main)."""
    import jax
    import jax.numpy as jnp

    from bench import _gt
    from rlobjectdetection_tpu.config import Config
    from rlobjectdetection_tpu.engine import build_optimizer, make_train_step
    from rlobjectdetection_tpu.engine.train import TrainState
    from rlobjectdetection_tpu.models import FasterRCNN

    cfg = Config(ANCHOR_SCALES=(4, 8, 16, 32), MAX_NUM_GT_BOXES=50,
                 CONV1_FUSED=True, LAYER1_FUSED=True)
    model = FasterRCNN(num_classes=81, backbone="resnet101", cfg=cfg)
    h, w, g = 800, 1216, 50
    rng = np.random.RandomState(3)
    batch = {
        "data": jnp.asarray(rng.randn(batch_size, h, w, 3).astype(np.float32) * 10),
        "im_info": jnp.asarray(np.array([[h, w, 1.0]] * batch_size, dtype=np.float32)),
        "gt_boxes": jnp.asarray(_gt(rng, batch_size, g, h, w)),
        "num_boxes": jnp.asarray(np.full((batch_size,), 8, dtype=np.int32)),
    }
    ikey = jax.random.PRNGKey(3)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": ikey, "sampling": ikey, "dropout": ikey},
        batch["data"], batch["im_info"], batch["gt_boxes"], batch["num_boxes"],
        train=True,
    )["params"]
    tx, _ = build_optimizer(params, "resnet101", base_lr=0.01)
    state = TrainState(params, tx.init(params), jnp.int32(0))
    step = make_train_step(model, tx)
    return step, state, batch


def main():
    import jax

    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    batch_size = next((int(a) for a in sys.argv[2:] if a.isdigit()), 8)
    path = next((a for a in sys.argv[2:] if not a.isdigit()),
                f"/tmp/aot_train_step_bs{batch_size}.pkl")
    assert mode in ("save", "load"), f"mode must be save|load, got {mode}"

    t_start = time.perf_counter()
    step, state, batch = _build(batch_size)
    key = jax.random.PRNGKey(7)
    print(f"[{mode}] build+init: {time.perf_counter() - t_start:.1f}s",
          flush=True)

    if mode == "save":
        from jax.experimental.serialize_executable import serialize

        t0 = time.perf_counter()
        compiled = step.lower(state, batch, key).compile()
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        payload, in_tree, out_tree = serialize(compiled)
        blob = pickle.dumps((payload, pickle.dumps(in_tree),
                             pickle.dumps(out_tree)))
        with open(path, "wb") as f:
            f.write(blob)
        t_ser = time.perf_counter() - t0
        print(f"[save] compile: {t_compile:.1f}s  serialize+write: {t_ser:.1f}s "
              f"({len(blob) / 1e6:.1f} MB) -> {path}", flush=True)
        # prove the compiled handle still runs
        new_state, metrics = compiled(state, batch, key)
        print(f"[save] step ran, loss={float(metrics['loss']):.4f}", flush=True)
    else:
        from jax.experimental.serialize_executable import deserialize_and_load

        t0 = time.perf_counter()
        with open(path, "rb") as f:
            payload, in_tree_b, out_tree_b = pickle.loads(f.read())
        compiled = deserialize_and_load(payload, pickle.loads(in_tree_b),
                                        pickle.loads(out_tree_b))
        t_load = time.perf_counter() - t0
        t0 = time.perf_counter()
        new_state, metrics = compiled(state, batch, key)
        loss = float(metrics["loss"])
        t_first = time.perf_counter() - t0
        assert np.isfinite(loss), f"non-finite loss {loss}"
        print(f"[load] deserialize: {t_load:.1f}s  first step: {t_first:.1f}s "
              f"loss={loss:.4f}  TOTAL time-to-first-step: "
              f"{time.perf_counter() - t_start:.1f}s", flush=True)


if __name__ == "__main__":
    main()
