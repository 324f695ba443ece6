#!/usr/bin/env python
"""Per-conv-shape speed-of-light audit for the ResNet-101 C4 backbone.

The full-step trace attributes ~half the bs8 train step to backbone conv
fusions at ~40% MFU (DESIGN.md Roofline). This probe times every DISTINCT
conv shape the backbone runs at the bench resolution (800x1216 -> stem out
200x304) in isolation — fwd, and fwd+bwd (d/dx and d/dw, the real chain
cost) for the trained stages — and reports each shape's achieved TFLOP/s
vs the v5e bf16 peak. That pinpoints WHICH convs XLA runs below
speed-of-light (candidates for a Pallas schedule) instead of trusting a
stage-aggregate number.

Method notes (CLAUDE.md invariants): each jitted program runs REPS
independent instances of the conv (inputs offset by a constant to defeat
CSE) so sub-ms convs amortize dispatch; timing is a value fetch over a
multi-second window; MFU comes from XLA's own cost analysis over the whole
program, which contains nothing but the probed conv instances.

Run: python tools/probe_convs.py [bs]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

V5E_BF16_PEAK = 197e12

# (name, H, W, Cin, Cout, k, stride, trained)
# Spatial sizes follow the bench input 800x1216: stem out 200x304,
# layer2 100x152, layer3 50x76. `trained` mirrors FIXED_BLOCKS=1
# (layer1 frozen, layer2/3 + layer4 head trained) — frozen stages fwd only.
SHAPES = [
    ("l1.conv1x1 64->64 @200x304",    200, 304,   64,   64, 1, 1, False),
    ("l1.conv3x3 64->64 @200x304",    200, 304,   64,   64, 3, 1, False),
    ("l1.conv1x1 64->256 @200x304",   200, 304,   64,  256, 1, 1, False),
    ("l1.conv1x1 256->64 @200x304",   200, 304,  256,   64, 1, 1, False),
    ("l2.conv1x1 256->128 s2",        200, 304,  256,  128, 1, 2, True),
    ("l2.down 256->512 s2",           200, 304,  256,  512, 1, 2, True),
    ("l2.conv3x3 128->128 @100x152",  100, 152,  128,  128, 3, 1, True),
    ("l2.conv1x1 128->512 @100x152",  100, 152,  128,  512, 1, 1, True),
    ("l2.conv1x1 512->128 @100x152",  100, 152,  512,  128, 1, 1, True),
    ("l3.conv1x1 512->256 s2",        100, 152,  512,  256, 1, 2, True),
    ("l3.down 512->1024 s2",          100, 152,  512, 1024, 1, 2, True),
    ("l3.conv3x3 256->256 @50x76",     50,  76,  256,  256, 3, 1, True),
    ("l3.conv1x1 256->1024 @50x76",    50,  76,  256, 1024, 1, 1, True),
    ("l3.conv1x1 1024->256 @50x76",    50,  76, 1024,  256, 1, 1, True),
    ("l4.conv1x1 1024->512 @7x7 rois", 7,  7,  1024,  512, 1, 1, True),
    ("l4.conv3x3 512->512 @7x7 rois",  7,  7,   512,  512, 3, 1, True),
    ("l4.conv1x1 512->2048 @7x7 rois", 7,  7,   512, 2048, 1, 1, True),
]

# occurrences per train step (ResNet-101: layer1 x3, layer2 x4, layer3 x23
# blocks; layer4 head x3 blocks on 1024 rois). Used for the ranking column.
COUNT = {
    "l1.conv1x1 64->64 @200x304": 2,
    "l1.conv3x3 64->64 @200x304": 3,
    "l1.conv1x1 64->256 @200x304": 4,
    "l1.conv1x1 256->64 @200x304": 2,
    "l2.conv1x1 256->128 s2": 1,
    "l2.down 256->512 s2": 1,
    "l2.conv3x3 128->128 @100x152": 4,
    "l2.conv1x1 128->512 @100x152": 4,
    "l2.conv1x1 512->128 @100x152": 3,
    "l3.conv1x1 512->256 s2": 1,
    "l3.down 512->1024 s2": 1,
    "l3.conv3x3 256->256 @50x76": 23,
    "l3.conv1x1 256->1024 @50x76": 23,
    "l3.conv1x1 1024->256 @50x76": 22,
    "l4.conv1x1 1024->512 @7x7 rois": 3,
    "l4.conv3x3 512->512 @7x7 rois": 3,
    "l4.conv1x1 512->2048 @7x7 rois": 3,
}

REPS = 10  # conv instances per jitted program (amortizes dispatch)


def probe(name, bs, h, w, cin, cout, k, stride, bwd):
    import jax
    import jax.numpy as jnp
    from jax import lax

    # layer4 runs on roi features: batch is 1024 rois, not bs images
    n = 1024 if "rois" in name else bs
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32) * 0.1,
                    dtype=jnp.bfloat16)
    wgt = jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32) * 0.01,
                      dtype=jnp.bfloat16)

    def conv(xi):
        pad = "SAME" if k == 3 else "VALID"
        return lax.conv_general_dilated(
            xi, wgt, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def fwd_sum(x, wgt):
        acc = jnp.float32(0)
        for i in range(REPS):
            # distinct inputs defeat CSE; the add is free vs the conv
            acc = acc + conv(x + jnp.bfloat16(i * 0.01)).astype(jnp.float32).sum()
        return acc

    if bwd:
        def run(x, wgt):
            l, (gx, gw) = jax.value_and_grad(fwd_sum, argnums=(0, 1))(x, wgt)
            return l + gx.astype(jnp.float32).ravel()[0] + gw.astype(jnp.float32).ravel()[0]
    else:
        run = fwd_sum

    fn = jax.jit(run)
    try:
        cost = fn.lower(x, wgt).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0
    float(fn(x, wgt))  # warm + value-fetch sync
    t0 = time.perf_counter()
    float(fn(x, wgt))
    once = time.perf_counter() - t0
    iters = max(3, int(2.0 / max(once, 1e-3)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x, wgt)
    float(out)
    dt = (time.perf_counter() - t0) / iters
    oh, ow = (h + stride - 1) // stride, (w + stride - 1) // stride
    conv_flops = 2.0 * n * oh * ow * k * k * cin * cout * (3 if bwd else 1)
    return {
        "name": name, "ms_per_conv": round(dt * 1e3 / REPS, 3),
        "tflops": round(flops / dt / 1e12, 1) if flops else None,
        "mfu": round(flops / dt / V5E_BF16_PEAK, 3) if flops else None,
        "analytic_gflops_per_conv": round(conv_flops / 1e9, 1),
        "trained": bwd,
    }


def main():
    import jax
    from rlobjectdetection_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()  # host-fingerprinted dir (SIGILL-safe across host gens)

    bs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 8
    rows = []
    for (name, h, w, cin, cout, k, s, trained) in SHAPES:
        r = probe(name, bs, h, w, cin, cout, k, s, trained)
        rows.append(r)
        print(json.dumps(r), flush=True)
    print("\n# per-step cost ranking (est ms = ms_per_conv * count):")
    est = sorted(((r["ms_per_conv"] * COUNT[r["name"]], r) for r in rows),
                 key=lambda t: -t[0])
    total = 0.0
    for cost, r in est:
        total += cost
        print(f"  {cost:7.2f} ms  mfu={r['mfu']}  {r['name']}"
              f"{' (fwd+bwd)' if r['trained'] else ' (fwd)'}")
    print(f"  {total:7.2f} ms  TOTAL (cf. full-step conv attribution in DESIGN.md)")


if __name__ == "__main__":
    main()
