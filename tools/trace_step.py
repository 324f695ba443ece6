#!/usr/bin/env python
"""Capture a jax.profiler device trace of the bench train step and print the
top ops by self-time.

Parses the trace.json.gz written by jax.profiler.trace directly (no
TensorBoard needed): groups trace events on device tracks by op name and
prints cumulative duration, so the fused-step time attribution is measured,
not inferred from standalone sub-programs (tools/profile_step.py).

The model config mirrors bench.py exactly (fused Pallas kernels ON by
default; same --no-fused-stem/--no-fused-layer1/--cvjp/--pallas-align/--remat
flags) so the attribution is measured at the benchmarked optimum.

Run:  python tools/trace_step.py [bs]        (default 8)
      python tools/trace_step.py --infer [bs]   eval fwd + postprocess
      python tools/trace_step.py --rl [bs]      RL action-value train step
      python tools/trace_step.py --hlo [bs]     dump the optimized HLO of
        the same-config train step to /tmp/step_hlo.txt and exit (dump-only:
        executing the AOT-lowered Compiled object hangs over the tunneled
        backend, so the trace itself needs a separate invocation) — grep the
        trace's fusion names there for attribution.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()  # host-fingerprinted dir (SIGILL-safe across host gens)

    from bench import _gt
    from rlobjectdetection_tpu.config import Config
    from rlobjectdetection_tpu.engine import (build_optimizer, create_train_state,
                                              make_train_step)
    from rlobjectdetection_tpu.models import FasterRCNN

    bs = next((int(a) for a in sys.argv[1:] if a.isdigit()), 8)
    infer_mode = "--infer" in sys.argv
    h, w, g = 800, 1216, 50
    if "--rl" in sys.argv:
        from bench import _fused_stages_flag, make_rl_step

        rl_step, p, o, inputs = make_rl_step(
            bs, h, w, fused_stem="--no-fused-stem" not in sys.argv,
            fused_layer1="--no-fused-layer1" not in sys.argv,
            fused_stages=_fused_stages_flag())
        holder = {"p": p, "o": o}

        def run_rl():
            holder["p"], holder["o"], loss = rl_step(
                holder["p"], holder["o"], *inputs)
            return loss

        float(run_rl())
        _trace_and_report(jax, run_rl, lambda out: float(out))
        return
    from bench import _fused_stages_flag

    cfg = Config(
        ANCHOR_SCALES=(4, 8, 16, 32), MAX_NUM_GT_BOXES=50,
        REMAT="--remat" in sys.argv,
        CONV1_S2D="--s2d" in sys.argv,
        CONV1_FUSED="--no-fused-stem" not in sys.argv,
        LAYER1_FUSED=("--no-fused-stem" not in sys.argv
                      and "--no-fused-layer1" not in sys.argv),
        ALIGN_IMPL=("cvjp" if "--cvjp" in sys.argv
                    else "pallas" if "--pallas-align" in sys.argv
                    else "autodiff"),
        STAGE_FUSED=_fused_stages_flag(),
    )
    model = FasterRCNN(num_classes=81, backbone="resnet101", cfg=cfg)
    rng = np.random.RandomState(3)
    batch = {
        "data": jnp.asarray(rng.randn(bs, h, w, 3).astype(np.float32) * 10),
        "im_info": jnp.asarray(np.array([[h, w, 1.0]] * bs, dtype=np.float32)),
        "gt_boxes": jnp.asarray(_gt(rng, bs, g, h, w)),
        "num_boxes": jnp.asarray(np.full((bs,), 8, dtype=np.int32)),
    }
    tx, _ = build_optimizer(
        model.init({"params": jax.random.PRNGKey(3),
                    "sampling": jax.random.PRNGKey(4),
                    "dropout": jax.random.PRNGKey(5)},
                   batch["data"], batch["im_info"], batch["gt_boxes"],
                   batch["num_boxes"], train=True)["params"],
        "resnet101", base_lr=0.01)
    state = create_train_state(model, tx, batch)

    key = jax.random.PRNGKey(7)
    if infer_mode:
        from rlobjectdetection_tpu.engine import postprocess_detections

        @jax.jit
        def infer_fn(p, data, im_info):
            out = model.apply({"params": p}, data, im_info, train=False)
            return jax.vmap(lambda r, c, b2, i, v: postprocess_detections(
                r, c, b2, i, v, num_classes=81, max_per_image=100,
                nms_thresh=0.3))(out["rois"], out["cls_prob"],
                                 out["bbox_pred"], im_info, out["roi_valid"])

        if "--hlo" in sys.argv:
            hlo_path = next((a for a in sys.argv[1:] if a.endswith(".txt")),
                            "/tmp/infer_hlo.txt")
            compiled = infer_fn.lower(
                state.params, batch["data"], batch["im_info"]).compile()
            with open(hlo_path, "w") as f:
                f.write(compiled.as_text())
            print(f"wrote optimized HLO to {hlo_path}")
            return

        def step(s, b, k):
            return s, {"loss": infer_fn(s.params, b["data"], b["im_info"]
                                        )[0].ravel()[0]}
    else:
        step = make_train_step(model, tx)
        if "--hlo" in sys.argv:
            # dump-only: executing the AOT Compiled object hangs over the
            # axon tunnel (measured round 4), so the trace itself must run
            # via the jit path in a separate invocation. Instruction names
            # are deterministic for the same program, so the dumped HLO
            # attributes that trace's fusion names exactly.
            hlo_path = next((a for a in sys.argv[1:] if a.endswith(".txt")),
                            "/tmp/step_hlo.txt")
            compiled = step.lower(state, batch, key).compile()
            with open(hlo_path, "w") as f:
                f.write(compiled.as_text())
            print(f"wrote optimized HLO to {hlo_path}")
            return

    holder = {"state": state, "i": 0}

    def run_once():
        holder["state"], metrics = step(
            holder["state"], batch, jax.random.fold_in(key, holder["i"]))
        holder["i"] += 1
        return metrics

    for _ in range(3):
        metrics = run_once()
    float(metrics["loss"])
    _trace_and_report(jax, run_once, lambda m: float(m["loss"]))


def _trace_and_report(jax, run_once, sync, n_steps=5):
    """Trace n_steps executions of run_once and print top ops by self-time."""
    trace_dir = "/tmp/step_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(n_steps):
            out = run_once()
        sync(out)

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("NO TRACE FILES — profiler unsupported on this backend?")
        print("dir contents:", glob.glob(f"{trace_dir}/**/*", recursive=True))
        return
    by_op = defaultdict(float)
    counts = defaultdict(int)
    device_pids = set()
    for path in paths:
        with gzip.open(path, "rt") as f:
            trace = json.load(f)
        events = trace.get("traceEvents", [])
        # find pids whose process_name mentions TPU/device
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                nm = e.get("args", {}).get("name", "")
                if any(s in nm.lower() for s in ("tpu", "device", "xla")):
                    device_pids.add(e["pid"])
        for e in events:
            if e.get("ph") == "X" and e.get("pid") in device_pids:
                by_op[e["name"]] += e.get("dur", 0.0)
                counts[e["name"]] += 1
    if not by_op:
        # fall back: every complete event
        for path in paths:
            with gzip.open(path, "rt") as f:
                trace = json.load(f)
            for e in trace.get("traceEvents", []):
                if e.get("ph") == "X":
                    by_op[e["name"]] += e.get("dur", 0.0)
                    counts[e["name"]] += 1
    total = sum(by_op.values())
    print(f"{len(by_op)} distinct ops, total {total/1e3/n_steps:.2f} ms/step "
          f"({n_steps} steps traced)\n")
    print(f"{'ms/step':>9}  {'%':>5}  {'n':>5}  op")
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/1e3/n_steps:9.3f}  {100*dur/total:5.1f}  {counts[name]:5d}  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
