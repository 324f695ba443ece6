"""Fused VGG-16 block 1 as a Pallas TPU kernel: conv1_1(3x3/1, pad 1, bias)
+ ReLU + conv1_2(3x3/1, pad 1, bias) + ReLU + max-pool 2x2/2, in one pass.

Why: the ResNet stem thesis applies verbatim to VGG's conv1_1 (VERDICT r3
#3) — XLA lowers the 3-channel 3x3 conv by padding C_in 3->128 on the MXU, a
42x FLOP waste, and conv1_1 runs at FULL 800x1216 resolution (stride 1), so
the padded cost is ~143 GFLOP/image where ~3.4 GFLOP is useful. This kernel
recasts conv1_1 as a channel-on-sublane im2col matmul with contraction
K = 3*3*8 = 72 (one MXU pass) and fuses the whole block so the two
full-resolution 64-channel activations (conv1_1 and conv1_2 outputs,
~125 MB/image each in f32) never round-trip HBM.

Semantics parity (reference lib/model/faster_rcnn/vgg16.py:38 = torchvision
vgg16 features[0:5]):
  conv1_1 = Conv2d(3, 64, k=3, s=1, p=1, bias=True); ReLU
  conv1_2 = Conv2d(64, 64, k=3, s=1, p=1, bias=True); ReLU
  pool1   = MaxPool2d(k=2, s=2)  (floor mode; H, W are even — the loader
            pads images to multiples of 32)
conv1_2's zero padding is replicated exactly: out-of-image conv1_1 outputs
are masked to literal 0 (NOT relu(bias)) before feeding conv1_2.

The kernel is forward-only: VGG blocks 1-2 are frozen upstream
(vgg16.py:41-42 freezes features[:10]) and VGGBase places a stop_gradient at
the block-`frozen_blocks` boundary, so no cotangent ever reaches block 1; the
custom_vjp makes that contract explicit (same pattern as ops/stem_pallas.py).

Layout: the de-interleave puts the 3 input channels on the SUBLANE axis
(xs[b, row, c(pad 8), col]) so every im2col tap is a contiguous [8, OW]
slice; row tiles overlap by 4 image rows (two 3x3 halos), which plain
BlockSpecs cannot express, so xs stays in ANY/HBM and the kernel
double-buffers its own row-window DMA. The stride-2 pool compaction and the
[64, W] -> [PW, 64] transpose ride one MXU selection matmul (the
ops/stem_pallas.py trick).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flatten_pad(x, rowsp, ws, compute_dtype):
    """[B,H,W,3] image -> [B, rowsp, 3*ws] flat padded rows: 2 rows top
    border (y2 row 0 reads x rows -2..), 2 px (6 flat elements) left border,
    zero-extended to the deint grid (cast + pad only — fuses in XLA)."""
    b, h, w, c = x.shape
    xf = x.reshape(b, h, w * c).astype(compute_dtype)
    return jnp.pad(xf, ((0, 0), (2, rowsp - 2 - h),
                        (6, ws * c - 6 - w * c)))


def _deint_kernel(xf_ref, cs_ref, out_ref):
    """Flat-row band [R, 384] -> channel-major block [R, 8, 128]:
    out[r, c, j] = band[r, 3j + c] for c < 3 (slots 3..7 zero — their
    conv-weight rows are zero anyway). Three one-hot selection matmuls
    Cs[c][k, j] = (k == 3j + c) on the MXU (XLA's equivalent minor-dim
    transpose is a multi-ms relayout; see ops/stem_pallas.py)."""
    f = xf_ref[0]
    for c in range(3):
        y = lax.dot_general(f, cs_ref[c], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        out_ref[0, :, c, :] = y.astype(out_ref.dtype)
    zero = jnp.zeros((f.shape[0], out_ref.shape[-1]), out_ref.dtype)
    for c in range(3, 8):
        out_ref[0, :, c, :] = zero


def _deinterleave(xfp, ws, compute_dtype, chunk, interpret):
    """[B, rowsp, 3*ws] flat rows -> [B, rowsp, 8, ws], channel on sublanes,
    width on lanes. 3 * 128 = 384: output lane block j depends exactly on
    flat columns [384j, 384(j+1)) — block-banded."""
    b, rowsp, fw = xfp.shape
    cs = np.zeros((3, 384, 128), np.float32)
    for c in range(3):
        cs[c, 3 * np.arange(128) + c, np.arange(128)] = 1.0
    cs = jnp.asarray(cs, dtype=compute_dtype)
    return pl.pallas_call(
        _deint_kernel,
        grid=(b, rowsp // chunk, ws // 128),
        in_specs=[
            pl.BlockSpec((1, chunk, 384), lambda i, r, j: (i, r, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 384, 128), lambda i, r, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, 8, 128),
                               lambda i, r, j: (i, r, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rowsp, 8, ws), compute_dtype),
        interpret=interpret,
    )(xfp, cs)


def _pack_w1(k1, compute_dtype):
    """[3,3,3,64] conv1_1 kernel -> [64, 72] im2col matrix, rows
    (dy*3 + dx)*8 + c matching the r72 assembly order (c slots 3..7 zero)."""
    km = jnp.pad(k1, ((0, 0), (0, 0), (0, 5), (0, 0)))   # [3,3,8,64]
    return km.reshape(72, 64).T.astype(compute_dtype)


def _pack_w2(k2, compute_dtype):
    """[3,3,64,64] conv1_2 kernel -> [64, 576], rows (dy*3 + dx)*64 + ci."""
    return k2.reshape(576, 64).T.astype(compute_dtype)


def _block1_kernel(xs_hbm, wm1_ref, b1_ref, wm2_ref, b2_ref, sel_ref, out_ref,
                   xs_buf, y1buf, y2buf, r72, r576, sem, *, nt, total, tp,
                   rws, h, w, out_dtype):
    ow1 = w + 2
    b = pl.program_id(0)
    t = pl.program_id(1)
    step = b * nt + t

    def dma(slot, bb, tt):
        return pltpu.make_async_copy(
            xs_hbm.at[bb, pl.ds(tt * 2 * tp, rws)],
            xs_buf.at[pl.ds(slot * rws, rws)],
            sem.at[slot],
        )

    @pl.when(step == 0)
    def _():
        dma(0, b, t).start()

    nxt = step + 1

    @pl.when(nxt < total)
    def _():
        dma(nxt % 2, nxt // nt, nxt % nt).start()

    dma(step % 2, b, t).wait()
    base = (step % 2) * rws

    wm1 = wm1_ref[:]
    b1 = b1_ref[:]
    # conv1_1 + bias + relu for the tile's 2*tp + 2 rows (conv1_2 halo rows
    # included). y1 row r is global conv1_1 output row t*2*tp + r - 1; its
    # column jj is output column jj - 1 (one col of left halo). Out-of-image
    # rows/cols are masked to literal 0 — conv1_2's zero padding, NOT
    # relu(bias).
    col = lax.broadcasted_iota(jnp.int32, (64, ow1), 1)
    for r in range(2 * tp + 2):
        for dy in range(3):
            for dx in range(3):
                r72[(dy * 3 + dx) * 8:(dy * 3 + dx) * 8 + 8, :] = \
                    xs_buf[base + r + dy, :, dx:dx + ow1]
        y = lax.dot_general(wm1, r72[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [64, OW1]
        y = jnp.maximum(y + b1, 0.0)
        g1 = t * 2 * tp + r - 1
        valid = (col >= 1) & (col <= w) & (0 <= g1) & (g1 < h)
        y1buf[r] = jnp.where(valid, y, 0.0).astype(y1buf.dtype)

    # conv1_2 + bias + relu, then 2x2/2 max-pool each row pair; the selection
    # matmul compacts stride-2 AND transposes [64, W] -> [PW, 64] on the MXU
    wm2 = wm2_ref[:]
    b2 = b2_ref[:]
    sel = sel_ref[:]
    for q in range(2 * tp):
        for dy in range(3):
            for dx in range(3):
                r576[(dy * 3 + dx) * 64:(dy * 3 + dx) * 64 + 64, :] = \
                    y1buf[q + dy, :, dx:dx + w]
        y = lax.dot_general(wm2, r576[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [64, W]
        y2buf[q % 2] = jnp.maximum(y + b2, 0.0)
        if q % 2 == 1:
            rm = jnp.maximum(y2buf[0], y2buf[1])
            z1 = jnp.concatenate(
                [rm[:, 1:], jnp.zeros((64, 1), rm.dtype)], axis=1)
            m = jnp.maximum(rm, z1).astype(sel.dtype)  # zero-fill OK post-ReLU
            outp = lax.dot_general(sel, m, (((0,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
            out_ref[0, q // 2] = outp.astype(out_dtype)


def _fused_vgg_block1_impl(static, x, k1, b1, k2, b2):
    out_dtype, compute_dtype, tp, interpret = static
    out_dtype = jnp.dtype(out_dtype)
    compute_dtype = jnp.dtype(compute_dtype)
    b, h, w, _ = x.shape
    assert h % 2 == 0 and w % 2 == 0, (
        "fused_vgg_block1 needs even H/W (the loader pads to multiples of 32)")
    phh, pww = h // 2, w // 2
    nt = -(-phh // tp)
    ws = -(-(w + 4) // 128) * 128    # x cols [-2, W+2) + lane alignment
    chunk = 128                      # de-interleave row-grid granularity
    rowsp = -(-(nt * 2 * tp + 4) // chunk) * chunk
    rws = 2 * tp + 4                 # image rows per tile (two 3x3 halos)

    xs = _deinterleave(_flatten_pad(x, rowsp, ws, compute_dtype),
                       ws, compute_dtype, chunk, interpret)
    wm1 = _pack_w1(k1, compute_dtype)
    wm2 = _pack_w2(k2, compute_dtype)
    b1c = b1.reshape(64, 1).astype(jnp.float32)
    b2c = b2.reshape(64, 1).astype(jnp.float32)
    # 0/1 selection: sel[i, q] = (i == 2q) — stride-2 compaction + transpose
    sel = (np.arange(w)[:, None] == 2 * np.arange(pww)[None, :])
    sel = jnp.asarray(sel, dtype=compute_dtype)

    kern = partial(_block1_kernel, nt=nt, total=b * nt, tp=tp, rws=rws,
                   h=h, w=w, out_dtype=out_dtype)
    out = pl.pallas_call(
        kern,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # xs (HBM)
            pl.BlockSpec((64, 72), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),              # wm1
            pl.BlockSpec((64, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),              # b1
            pl.BlockSpec((64, 576), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),              # wm2
            pl.BlockSpec((64, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),              # b2
            pl.BlockSpec((w, pww), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),              # sel
        ],
        out_specs=pl.BlockSpec((1, tp, pww, 64), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nt * tp, pww, 64), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * rws, 8, ws), compute_dtype),        # xs_buf
            pltpu.VMEM((2 * tp + 2, 64, w + 2), compute_dtype),  # y1buf
            pltpu.VMEM((2, 64, w), jnp.float32),                # y2buf
            pltpu.VMEM((72, w + 2), compute_dtype),             # r72 (im2col)
            pltpu.VMEM((576, w), compute_dtype),                # r576 (im2col)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xs, wm1, b1c, wm2, b2c, sel)
    return out[:, :phh]


def _fused_vgg_block1_dispatch(static, x, k1, b1, k2, b2):
    # multi-device worlds go through the batch-dim partitioning rule so DP
    # meshes keep the fused kernel (ops/batch_partition.py)
    from rlobjectdetection_tpu.ops.batch_partition import batch_partitioned_call

    return batch_partitioned_call(_fused_vgg_block1_impl, static, x, k1, b1,
                                  k2, b2, out_rank=4)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_vgg_block1(static, x, k1, b1, k2, b2):
    return _fused_vgg_block1_dispatch(static, x, k1, b1, k2, b2)


def _fused_vgg_block1_fwd(static, x, k1, b1, k2, b2):
    return _fused_vgg_block1_dispatch(static, x, k1, b1, k2, b2), None


def _fused_vgg_block1_bwd(static, residuals, g):
    raise NotImplementedError(
        "fused_vgg_block1 is forward-only: VGG blocks 1-2 are frozen in the "
        "reference (vgg16.py:41-42); a stop_gradient must sit between block 1 "
        "and any trainable parameter."
    )


_fused_vgg_block1.defvjp(_fused_vgg_block1_fwd, _fused_vgg_block1_bwd)


def fused_vgg_block1(x, k1, b1, k2, b2, *, out_dtype=jnp.bfloat16,
                     compute_dtype=jnp.bfloat16, tile_rows=4, interpret=False):
    """conv1_1 + ReLU + conv1_2 + ReLU + 2x2/2 max-pool in one kernel.

    x: [B, H, W, 3] float (H, W even); k1: [3, 3, 3, 64] / b1: [64] conv1_1
    kernel+bias (canonical 'conv1_1/{kernel,bias}' params); k2: [3, 3, 64, 64]
    / b2: [64] conv1_2. Returns [B, H/2, W/2, 64] NHWC in out_dtype.
    """
    assert x.shape[-1] == 3 and k1.shape == (3, 3, 3, 64) \
        and k2.shape == (3, 3, 64, 64), (
        "fused_vgg_block1 is specialized to the VGG-16 3->64->64 block")
    static = (jnp.dtype(out_dtype).name, jnp.dtype(compute_dtype).name,
              int(tile_rows), bool(interpret))
    return _fused_vgg_block1(static, x, k1, b1, k2, b2)
