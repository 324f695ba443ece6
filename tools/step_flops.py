#!/usr/bin/env python
"""Print the XLA cost-analysis FLOP count of the bench train step, fused vs
unfused, without running a timed loop (MFU-accounting probe, VERDICT r4 #3).

The bench's MFU denominator is v5e bf16 peak and its numerator is the XLA
cost-analysis flop count of the compiled step. Pallas kernels lower to custom
calls whose flops XLA counts as ZERO, so the fused program's count is an
UNDERcount of the work actually done. This probe compiles the same step both
ways and prints both counts; the difference is exactly the flops the fused
stem/layer1 hide, and `DESIGN.md "MFU accounting"` carries the reconciled
arithmetic.

Run on the TPU: python tools/step_flops.py [bs]
(compile-only: ~40 s per variant server-side, no timed loop)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def step_flops(bs, fused, backbone="resnet101"):
    import jax
    import jax.numpy as jnp

    from bench import _gt
    from rlobjectdetection_tpu.config import Config
    from rlobjectdetection_tpu.engine import (build_optimizer,
                                              create_train_state,
                                              make_train_step)
    from rlobjectdetection_tpu.models import FasterRCNN

    h, w, g = 800, 1216, 50
    cfg = Config(ANCHOR_SCALES=(4, 8, 16, 32), MAX_NUM_GT_BOXES=50,
                 CONV1_FUSED=fused, LAYER1_FUSED=fused)
    model = FasterRCNN(num_classes=81, backbone=backbone, cfg=cfg)
    rng = np.random.RandomState(3)
    batch = {
        "data": jnp.asarray(rng.randn(bs, h, w, 3).astype(np.float32) * 10),
        "im_info": jnp.asarray(np.array([[h, w, 1.0]] * bs, dtype=np.float32)),
        "gt_boxes": jnp.asarray(_gt(rng, bs, g, h, w)),
        "num_boxes": jnp.asarray(np.full((bs,), 8, dtype=np.int32)),
    }
    tx, _ = build_optimizer(
        jax.jit(model.init, static_argnames="train")(
            {"params": jax.random.PRNGKey(3), "sampling": jax.random.PRNGKey(4),
             "dropout": jax.random.PRNGKey(5)},
            batch["data"], batch["im_info"], batch["gt_boxes"],
            batch["num_boxes"], train=True)["params"],
        backbone, base_lr=0.01)
    state = create_train_state(model, tx, batch)
    step = make_train_step(model, tx)
    compiled = step.lower(state, batch, jax.random.PRNGKey(7)).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def main():
    from rlobjectdetection_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    bs = next((int(a) for a in sys.argv[1:] if a.isdigit()), 8)
    out = {"bs": bs}
    for name, fused in (("fused", True), ("unfused", False)):
        f = step_flops(bs, fused)
        out[f"{name}_xla_flops"] = f
        print(json.dumps({"variant": name, "xla_flops": f}), file=sys.stderr,
              flush=True)
    out["pallas_hidden_flops"] = out["unfused_xla_flops"] - out["fused_xla_flops"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
