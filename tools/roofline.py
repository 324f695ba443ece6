#!/usr/bin/env python
"""Backbone roofline: is the train step's 32% MFU a framework problem or the
XLA conv ceiling on these shapes?

Times the ResNet-101 conv1..layer3 fwd+bwd ALONE (the step's dominant cost,
tools/profile_step.py) at the bench shapes and reports its standalone MFU from
XLA's own FLOP count. If the bare backbone sits at ~the same MFU, the step is
conv-ceiling-bound and further gains need a better conv schedule, not framework
work (DESIGN.md round-3 target).

Run: python tools/roofline.py [bs ...]   (default: 8)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

V5E_BF16_PEAK = 197e12


def main():
    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()  # host-fingerprinted dir (SIGILL-safe across host gens)

    from rlobjectdetection_tpu.models.backbones.resnet import ResNetBase

    h, w = 800, 1216
    rng = np.random.RandomState(3)
    base = ResNetBase(num_layers=101, dtype=jnp.bfloat16, frozen_stages=1)
    params = jax.jit(base.init)(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.bfloat16))

    for bs in [int(a) for a in sys.argv[1:] if a.isdigit()] or [8]:
        img = jnp.asarray(rng.randn(bs, h, w, 3).astype(np.float32) * 10)

        @jax.jit
        def fwdbwd(p, x):
            g = jax.grad(lambda pp: base.apply(pp, x).astype(jnp.float32).sum())(p)
            return sum(l.astype(jnp.float32).ravel()[0] for l in jax.tree_util.tree_leaves(g))

        # flops from a compile-only pass; the TIMED calls go through the
        # normal jit dispatch path — executing the lowered Compiled object
        # directly hangs over the tunneled backend for this program (the
        # same failure mode trace_step.py documents; reproduced round 5)
        try:
            cost = fwdbwd.lower(params, img).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
        except Exception:
            flops = 0.0
        fwdbwd_c = fwdbwd
        for _ in range(3):
            out = fwdbwd_c(params, img)
        float(out)
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwdbwd_c(params, img)
        float(out)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "bs": bs, "backbone_fwdbwd_ms": round(dt * 1e3, 2),
            "tflops": round(flops / dt / 1e12, 1),
            "mfu": round(flops / dt / V5E_BF16_PEAK, 3),
        }))


if __name__ == "__main__":
    main()
