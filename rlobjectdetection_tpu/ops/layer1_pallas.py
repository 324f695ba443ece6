"""Fused ResNet layer1 (3 bottleneck blocks, stride 1, 64 -> 256) as one
forward-only Pallas TPU kernel.

Why: the per-conv speed-of-light probe (tools/probe_convs.py) and the bs8
train-step trace both show layer1 is XLA's worst-scheduled stage — its convs
run at 3-19% MFU (conv1x1 64->64: 3.2%) and the stage costs ~10.8 ms of the
~97 ms step, because C=64 half-fills the 128-lane MXU and every conv/bn/relu
round-trips the 200x304 activations through HBM. One kernel runs all three
blocks per row band: the input is read from HBM once, every intermediate
(including the 4x-wider 256-channel block outputs) lives in VMEM, and all
matmuls use a channels-on-sublanes x width-on-lanes layout where the 3x3
conv is 9 accumulated MXU passes over lane-ALIGNED row-shifted slices.

Semantics parity (reference lib/model/faster_rcnn/resnet.py:66-102, caffe
flavor): three Bottleneck(64) blocks — conv1x1/bn/relu, conv3x3(SAME)/bn/
relu, conv1x1/bn, residual add, relu; block0 has a conv1x1+bn downsample
shortcut. All BN is frozen (constants). Matches models/backbones/resnet.py
ResLayer(64, 3, stride=1) exactly; parity is pinned by interpret-mode tests.

Forward-only by contract: layer1 is frozen for every RESNET.FIXED_BLOCKS >=
1 (the reference default; resnet.py:250-259) and the RL net freezes
conv1..layer3 — a stop_gradient always sits between layer1 and trainable
params. The custom_vjp raises if ever differentiated; ResNetBase gates the
fused path on frozen_stages >= 1.

Layout derivation: activations are [C (sublanes), rows*Wp (lanes)] slabs
with image row r at lane offset r*Wp (Wp = ceil((W+1)/128)*128, so every
row has >= 1 trailing zero pad lane and all row offsets are lane-tile
aligned). conv1x1 = [Cout, Cin] @ [Cin, rows*Wp] MXU passes. conv3x3: for
tap row dy the rhs a1[:, dy*Wp : dy*Wp + L] is an ALIGNED slice (no
relayout); the +-1 column taps become two pltpu.roll's of the f32 partial
sums P0/P2 — the rolled-in lanes are a neighbouring row's trailing pad,
zero because a1 is masked (pad lanes + out-of-image halo rows) before the
taps (the circular wrap at the chunk edge lands on pad lanes too).
Between-block residuals are aligned slices of the previous slab. Each
block's conv1 stage is written to a scratch slab in 4-row chunks and
conv2/conv3/residual run in 2-row chunks, so f32 transients stay well
under 1 MB (whole-band f32 forms blew the 16 MB scoped-VMEM budget).
Params are read lazily from their VMEM refs at each use — preloading them
as whole-kernel values doubles them onto the stack. The NHWC output for
XLA's layer2 is produced by per-row jnp.transpose of 128-lane chunks
(measured supported and fast on this toolchain; transposed DOT operands
are 40x slower).

Row tiling: a band of TH output rows needs TH+6 input rows (one 3x3 halo
per block); halo rows are recomputed by the neighbouring band (~40% extra
layer1 FLOPs at TH=8 — still ~5x faster than XLA's schedule). Overlapping
row windows are inexpressible with BlockSpecs, so the input stays in
ANY/HBM and the kernel double-buffers its own row-window DMAs (same
pattern as ops/stem_pallas.py).

The kernel consumes the fused stem's CW layout ([B, H, 64, W], channels on
sublanes — stem_pallas.fused_stem(cw_out=True)), which is exactly the slab
layout, so no input transpose is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rlobjectdetection_tpu.ops.bn_fold import bn_mul_add as _bn_mul_add


def _l1_kernel(xp_hbm, m1_0, m1_12, m2s, m3s, md, bn1s, bn2s, bn3s, bnd,
               out_ref, slab_in, slab_a1, slab_a, slab_b, xbuf, sem, *,
               nt, total, th, wp, w, h_img, wop, out_dtype, compute_dtype):
    rws = th + 6
    b = pl.program_id(0)
    t = pl.program_id(1)
    step = b * nt + t

    def dma(slot, bb, tt):
        return pltpu.make_async_copy(
            xp_hbm.at[bb, pl.ds(tt * th, rws)],
            xbuf.at[slot],
            sem.at[slot],
        )

    @pl.when(step == 0)
    def _():
        dma(0, b, t).start()
        # lanes [wop, wp) of each row are written by no band; zero the slab
        # once so they read as conv zero-padding forever
        slab_in[:] = jnp.zeros_like(slab_in)

    nxt = step + 1

    @pl.when(nxt < total)
    def _():
        dma(nxt % 2, nxt // nt, nxt % nt).start()

    dma(step % 2, b, t).wait()
    slot = step % 2

    # de-shift the DMA'd CW rows into the slab (row r at lane r*Wp — an
    # aligned store). Rows are Wop wide, lanes [w, wop) zero-padded by
    # _fused_layer1_impl (Mosaic requires 128-aligned DMA slice widths).
    for r in range(rws):
        slab_in[:, r * wp:r * wp + wop] = xbuf[slot, r]

    def dot_f32(m, x):
        return lax.dot_general(m, x, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def mask(rows, row0, boff):
        """[1, rows*Wp] validity for a1 rows [row0, row0+rows): lane col in
        [0, W) AND the padded-global row (t*TH + boff + r; 3 zero rows on
        top) inside the image. Masking a1 makes halo rows/pad lanes act as
        the reference conv's zero padding for the 3x3 taps."""
        lane = lax.broadcasted_iota(jnp.int32, (1, rows * wp), 1)
        col = lane % wp
        grow = t * th + boff + row0 + lane // wp
        ok = (col < w) & (grow >= 3) & (grow < 3 + h_img)
        return ok.astype(compute_dtype)

    def block(a_ref, boff, ext_in, m1, add1, m2, add2, m3, add3, store,
              resid):
        """One bottleneck: a_ref slab [Cin, >=ext_in*Wp] -> store(chunk2, y)
        over ext_in-2 output rows. resid(c) yields the [256, 2*Wp] shortcut
        for chunk c; store(c, y) consumes the block's output chunk. BN
        scales are pre-folded into the weight matrices; only adds apply
        here. The conv1 stage streams through slab_a1 in 4-row chunks
        (bounds f32 transients); conv2/3 read sliding windows from it."""
        b1 = add1[:64]
        for r0 in range(0, ext_in, 4):
            rr = min(4, ext_in - r0)
            seg = dot_f32(m1[:], a_ref[:, r0 * wp:(r0 + rr) * wp])
            seg = seg.astype(compute_dtype) + b1
            slab_a1[:, r0 * wp:(r0 + rr) * wp] = \
                jnp.maximum(seg, 0.0) * mask(rr, r0, boff)
        b2 = add2[:64]
        b3 = add3[:]
        l = 2 * wp
        for c in range((ext_in - 2) // 2):
            # conv3x3 over output rows [2c, 2c+2) as ONE MXU contraction:
            # the 3 dy tap rows stack on the rhs sublanes ([192, L]) and the
            # 3 dx taps stack on the weight's M rows, so the [192, 192]
            # packed weight contracts all 9 taps at ~56% MXU utilization
            # (9 separate [64, 64] dots ran at 25% — M and K half-filled)
            rhs3 = jnp.concatenate(
                [slab_a1[:, (2 * c + dy) * wp:(2 * c + dy) * wp + l]
                 for dy in range(3)], axis=0)
            ps = dot_f32(m2, rhs3)        # [192, L]: P_dx stacked on sublanes
            # column taps: out[x] = P0[x-1] + P1[x] + P2[x+1]; the rolled-in
            # lanes are a neighbouring row's trailing pad — zero in masked a1
            y2 = (ps[64:128] + pltpu.roll(ps[0:64], 1, 1)
                  + pltpu.roll(ps[128:192], l - 1, 1)
                  ).astype(compute_dtype) + b2
            y2 = jnp.maximum(y2, 0.0)
            y3 = dot_f32(m3[:], y2).astype(compute_dtype) + b3
            store(c, jnp.maximum(y3 + resid(c), 0.0))

    # block0 (64 -> 256, downsample shortcut), rows TH+6 -> TH+4
    def store_a(c, y):
        slab_a[:, 2 * c * wp:(2 * c + 2) * wp] = y

    def resid_d(c):
        xc = slab_in[:, (1 + 2 * c) * wp:(3 + 2 * c) * wp]
        return dot_f32(md[:], xc).astype(compute_dtype) + bnd[:]

    block(slab_in, 0, rws, m1_0, bn1s[0], m2s[0], bn2s[0], m3s[0],
          bn3s[0], store_a, resid_d)

    # block1 (256 -> 256), rows TH+4 -> TH+2
    def store_b(c, y):
        slab_b[:, 2 * c * wp:(2 * c + 2) * wp] = y

    block(slab_a, 1, th + 4, m1_12[0], bn1s[1], m2s[1], bn2s[1], m3s[1],
          bn3s[1], store_b,
          lambda c: slab_a[:, (1 + 2 * c) * wp:(3 + 2 * c) * wp])

    # block2 (256 -> 256), rows TH+2 -> TH; output goes straight to NHWC
    def store_out(c, y):
        y = y.astype(out_dtype)
        for rr in range(2):
            r = 2 * c + rr
            for k in range(wop // 128):
                chunk = y[:, rr * wp + 128 * k:rr * wp + 128 * (k + 1)]
                out_ref[0, r, 128 * k:128 * (k + 1), :] = jnp.transpose(chunk)

    block(slab_b, 2, th + 2, m1_12[1], bn1s[2], m2s[2], bn2s[2], m3s[2],
          bn3s[2], store_out,
          lambda c: slab_b[:, (1 + 2 * c) * wp:(3 + 2 * c) * wp])


def _pack_params(p, compute_dtype, eps):
    """layer1 param tree (block0..2 Bottleneck params — the exact tree
    models/backbones/resnet.py::ResLayer(64, 3) creates) -> kernel arrays.
    Each conv's weight rows are pre-scaled by its following BN's mul
    (all folds in f32, cast once), so the kernel applies only BN adds."""
    def ma(blk, name):
        q = p[blk][name]
        return _bn_mul_add(q["scale"], q["bias"], q["mean"], q["var"], eps)

    def mat(kern, mul):       # [1,1,I,O] -> [O, I] row-scaled by bn mul
        return (kern[0, 0].T.astype(jnp.float32)
                * mul[:, None]).astype(compute_dtype)

    def m2(kern, mul):
        """[3,3,64,64] HWIO -> [192, 192] packed: row dx*64+co, col dy*64+ci
        (dx taps on M, dy taps on K — one MXU contraction per row chunk)."""
        m = kern.astype(jnp.float32) * mul[None, None, None, :]
        return m.transpose(1, 3, 0, 2).reshape(192, 192).astype(compute_dtype)

    def addvec(add, c):       # -> [256, 1] (sub-256 channels zero-padded)
        a = add.astype(compute_dtype).reshape(-1, 1)
        return jnp.pad(a, ((0, 256 - c), (0, 0))) if c < 256 else a

    bn1 = [ma(f"block{i}", "bn1") for i in range(3)]
    bn2 = [ma(f"block{i}", "bn2") for i in range(3)]
    bn3 = [ma(f"block{i}", "bn3") for i in range(3)]
    bnd = ma("block0", "downsample_bn")
    return dict(
        m1_0=mat(p["block0"]["conv1"]["kernel"], bn1[0][0]),         # [64, 64]
        m1_12=jnp.stack([mat(p[f"block{i}"]["conv1"]["kernel"], bn1[i][0])
                         for i in (1, 2)]),                          # [2,64,256]
        m2s=jnp.stack([m2(p[f"block{i}"]["conv2"]["kernel"], bn2[i][0])
                       for i in range(3)]),                          # [3,192,192]
        m3s=jnp.stack([mat(p[f"block{i}"]["conv3"]["kernel"], bn3[i][0])
                       for i in range(3)]),                          # [3,256,64]
        md=mat(p["block0"]["downsample_conv"]["kernel"], bnd[0]),    # [256, 64]
        bn1s=jnp.stack([addvec(bn1[i][1], 64) for i in range(3)]),
        bn2s=jnp.stack([addvec(bn2[i][1], 64) for i in range(3)]),
        bn3s=jnp.stack([addvec(bn3[i][1], 256) for i in range(3)]),
        bnd=addvec(bnd[1], 256),
    )


_ARG_ORDER = ("m1_0", "m1_12", "m2s", "m3s", "md", "bn1s", "bn2s", "bn3s", "bnd")


def _fused_layer1_impl(static, x_cw, *packed):
    out_dtype, compute_dtype, th, interpret = static
    out_dtype, compute_dtype = jnp.dtype(out_dtype), jnp.dtype(compute_dtype)
    m1_0, m1_12, m2s, m3s, md, bn1s, bn2s, bn3s, bnd = packed
    b, h, c64, w = x_cw.shape
    assert c64 == 64, "fused_layer1 consumes the stem's CW layout [B,H,64,W]"
    nt = -(-h // th)
    wop = -(-w // 128) * 128
    # row stride: 128 multiple (lane-aligned dy-shifts, residual slices,
    # output-transpose chunks) with >= 1 trailing zero pad lane per row
    # (the roll-based +-1 column taps read a neighbouring row's pad)
    wp = -(-(w + 1) // 128) * 128
    rws = th + 6
    # width padded to Wop (128 multiple): Mosaic DMA memref slices must be
    # lane-tile-aligned, so whole rows [64, Wop] are transferred per band
    xp = jnp.pad(x_cw, ((0, 0), (3, nt * th + 3 - h), (0, 0), (0, wop - w)))
    xp = xp.astype(compute_dtype)

    kern = partial(_l1_kernel, nt=nt, total=b * nt, th=th, wp=wp, w=w,
                   h_img=h, wop=wop, out_dtype=out_dtype,
                   compute_dtype=compute_dtype)
    const = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    shapes = dict(m1_0=(64, 64), m1_12=(2, 64, 256), m2s=(3, 192, 192),
                  m3s=(3, 256, 64), md=(256, 64), bn1s=(3, 256, 1),
                  bn2s=(3, 256, 1), bn3s=(3, 256, 1), bnd=(256, 1))
    out = pl.pallas_call(
        kern,
        grid=(b, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]      # xp (HBM)
                 + [const(shapes[k]) for k in _ARG_ORDER],
        # out_shape is the EXACT [B, H, W, 256] NHWC result: the trailing
        # row band and width chunk are partial blocks — Mosaic masks the
        # write-back, which is free compared to an XLA slice copy of the
        # whole tensor
        out_specs=pl.BlockSpec((1, th, wop, 256), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 256), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((64, rws * wp), compute_dtype),        # slab_in
            pltpu.VMEM((64, rws * wp), compute_dtype),        # slab_a1
            pltpu.VMEM((256, (th + 4) * wp), compute_dtype),  # slab_a
            pltpu.VMEM((256, (th + 2) * wp), compute_dtype),  # slab_b
            pltpu.VMEM((2, rws, 64, wop), compute_dtype),     # xbuf (DMA)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, *packed)
    return out


def _fused_layer1_dispatch(static, x_cw, *packed):
    # batch-dim partitioning rule for multi-device meshes (batch_partition.py)
    from rlobjectdetection_tpu.ops.batch_partition import batch_partitioned_call

    return batch_partitioned_call(_fused_layer1_impl, static, x_cw, *packed,
                                  out_rank=4)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_layer1(static, x_cw, *packed):
    return _fused_layer1_dispatch(static, x_cw, *packed)


def _fused_layer1_fwd(static, x_cw, *packed):
    return _fused_layer1_dispatch(static, x_cw, *packed), None


def _fused_layer1_bwd(static, residuals, g):
    raise NotImplementedError(
        "fused_layer1 is forward-only: layer1 is frozen for every "
        "RESNET.FIXED_BLOCKS >= 1 (reference resnet.py:250-259); a "
        "stop_gradient must sit between layer1 and trainable parameters."
    )


_fused_layer1.defvjp(_fused_layer1_fwd, _fused_layer1_bwd)


def fused_layer1(x_cw, params, *, out_dtype=jnp.bfloat16,
                 compute_dtype=jnp.bfloat16, tile_rows=None, interpret=False,
                 eps=1e-5):
    """Run the full frozen layer1 stage on the stem's CW-layout output.

    x_cw: [B, H, 64, W] (stem_pallas.fused_stem(cw_out=True) layout).
    params: the 'layer1' subtree of ResNetBase params (block0..block2).
    Returns [B, H, W, 256] NHWC for XLA's layer2.

    tile_rows defaults by compute dtype: 8 for <=2-byte types, 4 for f32 —
    the f32 working set at 8 rows is 18.15 MB at COCO-800 RL shapes, over
    the 16 MB scoped-vmem cap the axon chipless compile helper enforces on
    EVERY compile (measured round 5; the RL trainer is the f32 user).
    """
    if tile_rows is None:
        tile_rows = 8 if jnp.dtype(compute_dtype).itemsize <= 2 else 4
    assert tile_rows % 2 == 0 and tile_rows > 0, (
        f"tile_rows must be a positive even number (the conv2/conv3 stages "
        f"stream 2-row chunks), got {tile_rows}")
    packed = _pack_params(params, jnp.dtype(compute_dtype), eps)
    static = (jnp.dtype(out_dtype).name, jnp.dtype(compute_dtype).name,
              int(tile_rows), bool(interpret))
    return _fused_layer1(static, x_cw, *[packed[k] for k in _ARG_ORDER])
