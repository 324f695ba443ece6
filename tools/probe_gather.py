#!/usr/bin/env python
"""Probe roi_align gather formulations at bench shapes (bs8, 1024 rois).

Variants:
  A. 4 independent row gathers from [B*H*W, C]         (current ops/roi_align.py)
  B. 2 gathers with slice_sizes=(2, C) from [B*H*W, C] (fetch (w, w+1) pairs)
  C. 1 gather with slice_sizes=(1, 2, 2, C) from [B, H, W, C] (2x2 patches)

Each timed fwd-only and fwd+bwd (grad wrt features), value-fetch sync.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()  # host-fingerprinted dir (SIGILL-safe across host gens)

    b, h, w, c = 8, 50, 76, 1024
    r, ah, aw = 1024, 8, 8
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32), jnp.bfloat16)
    # corner indices/weights as roi_align computes them
    bi = np.repeat(np.arange(b), r // b)
    hs = rng.randint(0, h - 1, (r, ah)).astype(np.int32)
    ws = rng.randint(0, w - 1, (r, aw)).astype(np.int32)
    hr = jnp.asarray(rng.rand(r, ah, 1, 1).astype(np.float32))
    wr = jnp.asarray(rng.rand(r, 1, aw, 1).astype(np.float32))
    hs, ws, bi = jnp.asarray(hs), jnp.asarray(ws), jnp.asarray(bi)

    def combine(ul, ur, dl, dr):
        out = (ul * (1 - hr) * (1 - wr) + ur * (1 - hr) * wr
               + dl * hr * (1 - wr) + dr * hr * wr)
        return out.astype(jnp.float32).sum()

    def v_a(f):
        flat = f.reshape(b * h * w, c)
        base = (bi * h)[:, None] + hs
        idx = base[:, :, None] * w + ws[:, None, :]
        g = lambda off: jnp.take(flat, (idx + off).reshape(-1), axis=0
                                 ).reshape(r, ah, aw, c)
        return combine(g(0), g(1), g(w), g(w + 1))

    def v_b(f):
        flat = f.reshape(b * h * w, c)
        base = (bi * h)[:, None] + hs
        idx = base[:, :, None] * w + ws[:, None, :]              # [R, AH, AW]

        def g2(off):
            starts = (idx + off).reshape(-1, 1)                  # [R*AH*AW, 1]
            out = jax.lax.gather(
                flat, jnp.concatenate(
                    [starts, jnp.zeros_like(starts)], axis=1),
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2), collapsed_slice_dims=(),
                    start_index_map=(0, 1)),
                slice_sizes=(2, c), mode="clip")
            return out.reshape(r, ah, aw, 2, c)

        top = g2(0)          # rows (h, w) and (h, w+1)
        bot = g2(w)          # rows (h+1, w) and (h+1, w+1)
        return combine(top[..., 0, :], top[..., 1, :],
                       bot[..., 0, :], bot[..., 1, :])

    def v_c(f):
        starts = jnp.stack(
            [jnp.broadcast_to(bi[:, None, None], (r, ah, aw)),
             jnp.broadcast_to(hs[:, :, None], (r, ah, aw)),
             jnp.broadcast_to(ws[:, None, :], (r, ah, aw))], axis=-1
        ).reshape(-1, 3)                                          # [R*AH*AW, 3]
        out = jax.lax.gather(
            f, starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
                start_index_map=(0, 1, 2)),
            slice_sizes=(1, 2, 2, c), mode="clip")
        out = out.reshape(r, ah, aw, 2, 2, c)
        return combine(out[..., 0, 0, :], out[..., 0, 1, :],
                       out[..., 1, 0, :], out[..., 1, 1, :])


    for name, fn in [("A_4xrow", v_a), ("B_2xpair", v_b), ("C_patch", v_c)]:
        fwd = jax.jit(fn)
        fb = jax.jit(jax.grad(fn))
        fbs = jax.jit(lambda f, _fb=fb: _fb(f).astype(jnp.float32).ravel()[0])
        try:
            t_f = timeit(fwd, feat)
            t_fb = timeit(fbs, feat)
            print(f"{name}: fwd {t_f:.2f} ms   fwd+bwd {t_fb:.2f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
