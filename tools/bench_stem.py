"""Standalone microbench: fused Pallas stem vs the XLA conv1+bn+relu+maxpool
composition, at the training bench shapes (bs8 800x1216 bf16).

Run on the real TPU (no env override needed — the axon platform preselects).
Sync is a value fetch of a loop-carried output (CLAUDE.md bench rule).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rlobjectdetection_tpu.models.backbones.resnet import ceil_max_pool
from rlobjectdetection_tpu.ops.stem_pallas import fused_stem

from rlobjectdetection_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # host-fingerprinted dir (SIGILL-safe across host gens)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h, w = 800, 1216
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 3)
    k = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(64).astype(np.float32))
    mean = jnp.asarray(rng.randn(64).astype(np.float32) * 0.2)
    var = jnp.asarray(rng.rand(64).astype(np.float32) + 0.3)

    @jax.jit
    def xla_ref(x, k, token):
        x = lax.optimization_barrier((x, token))[0]
        y = lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        inv = lax.rsqrt(var + 1e-5)
        mul = (scale * inv).astype(jnp.bfloat16)
        add = (bias - mean * scale * inv).astype(jnp.bfloat16)
        y = ceil_max_pool(jnp.maximum(y * mul + add, 0))
        return y, y[0, 0, 0, 0].astype(jnp.float32)

    @jax.jit
    def pallas_fused(x, k, token):
        x = lax.optimization_barrier((x, token))[0]
        y = fused_stem(x, k, scale, bias, mean, var)
        return y, y[0, 0, 0, 0].astype(jnp.float32)

    # correctness on-device first
    print("compiling xla ref...", flush=True)
    t = time.perf_counter()
    yr, _ = xla_ref(x, k, jnp.float32(0))
    yr.block_until_ready()
    print(f"  xla ref compiled in {time.perf_counter() - t:.1f}s", flush=True)
    print("compiling pallas kernel...", flush=True)
    t = time.perf_counter()
    yp, _ = pallas_fused(x, k, jnp.float32(0))
    yp.block_until_ready()
    print(f"  pallas compiled in {time.perf_counter() - t:.1f}s", flush=True)
    err = float(jnp.max(jnp.abs(yr.astype(jnp.float32) - yp.astype(jnp.float32))))
    rel = err / (float(jnp.max(jnp.abs(yr.astype(jnp.float32)))) + 1e-9)
    print(f"max abs diff vs XLA bf16 path: {err:.4f} (rel {rel:.4%})")

    if "--trace" in sys.argv:
        import glob
        import gzip
        import json
        import os
        from collections import defaultdict

        trace_dir = "/tmp/stem_trace"
        os.system(f"rm -rf {trace_dir}")
        token = jnp.float32(0)
        with jax.profiler.trace(trace_dir):
            for _ in range(5):
                _, token = pallas_fused(x, k, token)
            float(token)
        by_op, counts, device_pids = defaultdict(float), defaultdict(int), set()
        for path in glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True):
            with gzip.open(path, "rt") as f:
                events = json.load(f).get("traceEvents", [])
            for e in events:
                if e.get("ph") == "M" and e.get("name") == "process_name":
                    nm = e.get("args", {}).get("name", "")
                    if any(s in nm.lower() for s in ("tpu", "device", "xla")):
                        device_pids.add(e["pid"])
            for e in events:
                if e.get("ph") == "X" and e.get("pid") in device_pids:
                    by_op[e["name"]] += e.get("dur", 0.0)
                    counts[e["name"]] += 1
        for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:15]:
            print(f"{dur / 1e3 / 5:9.3f} ms  n={counts[name]:<4d} {name[:100]}")
        return

    for name, fn in [("xla", xla_ref), ("pallas", pallas_fused)]:
        token = jnp.float32(0)
        for _ in range(5):
            _, token = fn(x, k, token)
        float(token)
        iters = 200
        t0 = time.perf_counter()
        for _ in range(iters):
            _, token = fn(x, k, token)
        float(token)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:8s} {dt * 1e3:7.3f} ms/call  (bs{b} {h}x{w})")


if __name__ == "__main__":
    main()
