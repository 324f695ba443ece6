#!/usr/bin/env python
"""Standalone timing: fused Pallas layer1 vs XLA ResLayer forward at the
bench shape (bs8, stem-out 200x304). Value-fetch sync over a multi-second
window (CLAUDE.md axon invariants)."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp

from rlobjectdetection_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # host-fingerprinted dir (SIGILL-safe across host gens)

from rlobjectdetection_tpu.models.backbones.resnet import ResLayer
from rlobjectdetection_tpu.ops.layer1_pallas import fused_layer1

B, H, W = (int(a) for a in (sys.argv[1:4] or [8, 200, 304]))
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, H, W, 64).astype(np.float32) * 0.1, jnp.bfloat16)
layer = ResLayer(64, 3, 1, jnp.bfloat16)
params = jax.tree_util.tree_map(
    lambda v: v, layer.init(jax.random.PRNGKey(0), x)["params"])

def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    out.block_until_ready()
    # loop-carried chain so the final fetch forces every iteration
    iters = 200
    t0 = time.perf_counter()
    y = args[0]
    rest = args[1:]
    for i in range(iters):
        y = f(y, *rest) if False else f(*args)  # independent dispatches
    _ = np.asarray(y[0, 0, 0])  # value fetch of last result
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.3f} ms")
    return dt

def xla_l1(x):
    return layer.apply({"params": params}, x)

def pl_l1(x_cw):
    return fused_layer1(x_cw, params, out_dtype=jnp.bfloat16,
                        compute_dtype=jnp.bfloat16)

x_cw = jnp.transpose(x, (0, 1, 3, 2)).copy()
bench("xla_reslayer_fwd", xla_l1, x)
bench("fused_layer1", pl_l1, x_cw)
