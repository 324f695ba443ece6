#!/usr/bin/env python
"""Probe: roi_align's 4-tap gather — flat [B*H*W, C] source vs per-image
vmapped gather — at serving shapes (VERDICT r4 #4, the bs16 break).

The bs16 infer trace attributes the entire >bs8 serving regression to
fusion.4-7: the four bilinear-tap gathers of roi_align.py:63-66, 0.58 ms each
at bs8 but 7.0 ms each at bs16 (12× the time for 2× the rows). Hypothesis:
the flattened gather source (B*3800 rows × 1024 ch bf16 = 62 MB at bs8,
124 MB at bs16) crosses XLA's window/prefetch threshold and the gather
degrades to HBM-latency-bound row fetches. A per-image batched gather keeps
each source window at 7.8 MB regardless of batch.

Run: python tools/probe_roi_gather.py [bs ...]    (default: 8 16)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from rlobjectdetection_tpu.ops.roi_align import roi_align

    h, w, c, rb = 50, 76, 1024, 300   # C4 features at COCO-800, eval rois/img
    img_h, img_w = 800, 1216
    rng = np.random.RandomState(3)

    for bs in [int(a) for a in sys.argv[1:] if a.isdigit()] or [8, 16]:
        feat = jnp.asarray(
            rng.randn(bs, h, w, c).astype(np.float32), dtype=jnp.bfloat16)
        # realistic eval rois: random boxes 32-400 px on the 800x1216 canvas
        r = bs * rb
        x1 = rng.uniform(0, img_w - 410, r).astype(np.float32)
        y1 = rng.uniform(0, img_h - 410, r).astype(np.float32)
        bw = rng.uniform(32, 400, r).astype(np.float32)
        bh = rng.uniform(32, 400, r).astype(np.float32)
        rois = np.stack([np.repeat(np.arange(bs), rb).astype(np.float32),
                         x1, y1, x1 + bw, y1 + bh], axis=1)
        rois_img = rois.reshape(bs, rb, 5).copy()
        rois_img[:, :, 0] = 0.0                      # per-image batch idx
        rois_j = jnp.asarray(rois)
        rois_img_j = jnp.asarray(rois_img)

        @jax.jit
        def flat_align(f, rr, tok):
            out = roi_align(f, rr.at[:, 0].add(tok.astype(jnp.float32)),
                            8, 8, 1.0 / 16.0)
            return out.reshape(-1, c)[::4096, :8].astype(jnp.float32).sum()

        @jax.jit
        def vmapped_align(f, rr, tok):
            out = jax.vmap(lambda fi, ri: roi_align(
                fi[None], ri.at[:, 0].add(tok.astype(jnp.float32)),
                8, 8, 1.0 / 16.0))(f, rr)
            return out.reshape(-1, c)[::4096, :8].astype(jnp.float32).sum()

        for name, fn, rr in (("flat", flat_align, rois_j),
                             ("vmapped", vmapped_align, rois_img_j)):
            print(f"# compiling {name} bs{bs}", file=sys.stderr, flush=True)
            tok = jnp.int32(0)
            for _ in range(3):
                out = fn(feat, rr, tok)
            float(out)
            print(f"# timing {name} bs{bs}", file=sys.stderr, flush=True)
            iters = 100
            t0 = time.perf_counter()
            for i in range(iters):
                out = fn(feat, rr, tok)
                tok = (out * 0).astype(jnp.int32)   # serialize iterations
            float(out)
            dt = (time.perf_counter() - t0) / iters
            gb = r * 64 * c * 2 * 4 / 1e9           # 4 taps, bf16
            print(json.dumps({"bs": bs, "variant": name,
                              "ms": round(dt * 1e3, 3),
                              "eff_GBps": round(gb / dt, 1)}))


if __name__ == "__main__":
    main()
