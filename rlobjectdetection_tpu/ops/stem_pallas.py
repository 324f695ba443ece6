"""Fused ResNet stem as a Pallas TPU kernel: conv1(7x7/2, pad 3, no bias)
+ frozen-BatchNorm affine + ReLU + ceil-mode 3x3/2 max-pool, in one pass.

Why: XLA lowers the 3-channel 7x7 stem by padding C_in 3->128 on the MXU —
a 42x FLOP waste that makes conv1 the single worst op in the train step
(measured 4.9 ms at 4% MFU for bs8 800x1216, tools/trace_step.py). This
kernel recasts the stem as a space-to-depth im2col matmul with contraction
K = 4*4*12 = 192 (2 MXU passes instead of 49 padded ones) and fuses the
whole conv->bn->relu->maxpool chain so the 4x-larger unpooled activation
never round-trips HBM.

Semantics parity (reference lib/model/faster_rcnn/resnet.py:110-115):
  conv1 = Conv2d(3, 64, k=7, s=2, p=3, bias=False)
  bn1   = frozen BatchNorm (constants; folded here into mul/add)
  relu; maxpool = MaxPool2d(k=3, s=2, p=0, ceil_mode=True)
The pooling edge uses a zero-fill identity instead of -inf: post-ReLU all
real taps are >= 0, so max(real..., 0) == max(real...) whenever at least one
real tap exists — true for every ceil-mode output cell.

Derivation of the space-to-depth im2col (matches conv1_space_to_depth in
models/backbones/resnet.py): with xp = x padded 3 top/left,
  conv(i, j) = sum_{dy,dx<7,c} W[dy,dx,c] * xp[2i+dy, 2j+dx, c]
writing dy = 2*δy + ph, dx = 2*δx + pw (δ in [0,4), parity in {0,1}) gives
  conv(i, j) = sum_{δy,δx,k} W'[(δy,δx,k)] * xs[i+δy, k, j+δx]
over the s2d tensor xs[R, k=(ph,pw,c), Wcol] = xp[2R+ph, 2Wcol+pw, c]; the
(δy=3, ph=1) tap would be dy=7, so W is zero-padded to 8x8 first.

The kernel is forward-only: conv1/bn1 are unconditionally frozen in the
reference (resnet.py:250-266) and every `frozen_stages` setting places a
stop_gradient at or after the stem, so no cotangent ever reaches it; the
custom_vjp below makes that contract explicit.

Layout notes (see /opt/skills/guides/pallas_guide.md): xs keeps the 6 s2d
width-parity/channel slots (s = 3*pw + c, padded to 8) on the SUBLANE axis
and width on lanes so every im2col tap is a contiguous [8, OW] slice; row
tiles overlap by 8 image rows (conv halo) + 2 (pool halo), which plain
BlockSpecs cannot express, so xs stays in ANY/HBM and the stem kernel
double-buffers its own row-window DMA.

The de-interleave itself (flat row [6j+s] -> xs[s, j]) is a second, tiny
Pallas kernel: XLA lowers the equivalent [.., ws, 6] -> [.., 6, ws]
minor-dim transpose as ~5 ms of relayout copies at bs8 800x1216 (measured;
20x off memory-bandwidth speed-of-light), while MXU one-hot selection
matmuls do it in otherwise-idle MXU time and write the [rows, 8, ws] layout
the stem kernel wants directly. Because 6 * 128 = 768 exactly, the global
selection matrix is block-banded: each 128-lane output block j reads only
flat columns [768j, 768(j+1)), so gridding the width makes every block a
[chunk, 768] x [768, 128] matmul — 7x fewer MACs than the full-width
selection and a 1.2 MB constant instead of 9 MB. The only XLA-side prep
left is a fusable cast + pad of the flat [B, H, W*3] image.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rlobjectdetection_tpu.ops.bn_fold import bn_mul_add


def stem_out_shapes(h: int, w: int) -> tuple[int, int, int, int]:
    """(conv_h, conv_w, pool_h, pool_w) of the stem for an HxW input."""
    oh, ow = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    ph = -(-(oh - 3) // 2) + 1
    pw = -(-(ow - 3) // 2) + 1
    return oh, ow, ph, pw


def _pack_weight(kernel, compute_dtype):
    """[7,7,3,64] conv kernel -> [64, 256] im2col matrix, rows (δy, δx, k16)
    with k16 = ph*8 + (pw*3 + c) — the s2d channel order produced by _s2d
    (channels 6,7,14,15 of each tap are zero: the (pw, c) group is padded
    6->8 so the s2d tensor has 16 sublane-tile-aligned channels; K=256 is
    exactly two MXU passes either way)."""
    k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))      # [8,8,3,64]
    km = k8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
    km = jnp.pad(km.reshape(4, 4, 2, 6, 64), ((0, 0),) * 3 + ((0, 2), (0, 0)))
    return km.reshape(256, 64).T.astype(compute_dtype)          # [64, 256]


def _flatten_pad(x, rowsp, ws, compute_dtype):
    """[B,H,W,3] image -> [B, rowsp, 6*ws] flat padded rows (cast + pad only;
    every op here keeps the minor dimension >= 6*ws so XLA fuses it into one
    cheap pass — no sub-128 minor dims, no transposes)."""
    b, h, w, c = x.shape
    xf = x.reshape(b, h, w * c).astype(compute_dtype)
    # rows: 3-px top conv border then bottom to the chunk grid; flat cols:
    # 3 px (9 elements) left border then right to the Ws window extent
    return jnp.pad(xf, ((0, 0), (3, rowsp - 3 - h),
                        (9, ws * 2 * c - 9 - w * c)))


def _deint_kernel(xf_ref, cs_ref, out_ref):
    """Flat-row band [R, 768] -> s2d block [R, 8, 128]: out[r, s, j] =
    band[r, 6j + s] for s < 6 (slots 6/7 zero — their conv-weight rows are
    zero-padded anyway). Six one-hot selection matmuls Cs[s][k, j] =
    (k == 6j + s) on the MXU."""
    f = xf_ref[0]
    for s in range(6):
        y = lax.dot_general(f, cs_ref[s], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        out_ref[0, :, s, :] = y.astype(out_ref.dtype)
    zero = jnp.zeros((f.shape[0], out_ref.shape[-1]), out_ref.dtype)
    out_ref[0, :, 6, :] = zero
    out_ref[0, :, 7, :] = zero


def _deinterleave(xfp, ws, compute_dtype, chunk, interpret):
    """[B, rowsp, 6*ws] flat rows -> [B, rowsp, 8, ws] s2d tensor, s-slot
    (3*pw + c) on sublanes, width on lanes. rowsp must be a chunk multiple;
    ws a 128 multiple. Width-gridded: 6 * 128 = 768, so output lane block j
    depends exactly on flat columns [768j, 768(j+1)) — block-banded."""
    b, rowsp, fw = xfp.shape
    cs = np.zeros((6, 768, 128), np.float32)
    for s in range(6):
        cs[s, 6 * np.arange(128) + s, np.arange(128)] = 1.0
    cs = jnp.asarray(cs, dtype=compute_dtype)
    return pl.pallas_call(
        _deint_kernel,
        grid=(b, rowsp // chunk, ws // 128),
        in_specs=[
            pl.BlockSpec((1, chunk, 768), lambda i, r, j: (i, r, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 768, 128), lambda i, r, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, 8, 128),
                               lambda i, r, j: (i, r, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rowsp, 8, ws), compute_dtype),
        interpret=interpret,
    )(xfp, cs)


def _stem_kernel(xs_hbm, wm_ref, mul_ref, add_ref, sel_ref, out_ref,
                 xs_buf, ybuf, r256, sem, *, nt, total, tp, rws, oh, ow,
                 out_dtype, cw):
    th = 2 * tp + 1
    b = pl.program_id(0)
    t = pl.program_id(1)
    step = b * nt + t

    def dma(slot, bb, tt):
        return pltpu.make_async_copy(
            xs_hbm.at[bb, pl.ds(tt * 4 * tp, rws)],
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

    wm = wm_ref[:]
    mul = mul_ref[:]
    add = add_ref[:]
    # conv + bn + relu for the tile's 2*tp+1 rows (pool halo row included).
    # The im2col matrix is assembled tap-by-tap through the r256 scratch —
    # Mosaic's concatenate cannot splice sublane pieces with mixed lane-shift
    # layouts, but individual relayout stores are fine. Taps: conv row
    # 2*(r+dy4)+ph of the full-res window, r256 rows (dy4, dx, ph, s).
    for r in range(th):
        i = 0
        for dy4 in range(4):
            for dx in range(4):
                for ph in range(2):
                    r256[16 * i + 8 * ph:16 * i + 8 * ph + 8, :] = \
                        xs_buf[base + 2 * (r + dy4) + ph, :, dx:dx + ow]
                i += 1
        y = lax.dot_general(wm, r256[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [64, OW]
        y = jnp.maximum(y * mul + add, 0.0)
        grow = t * 2 * tp + r
        y = jnp.where(grow < oh, y, 0.0)   # rows past conv output: identity-0
        ybuf[r] = y

    # ceil-mode 3x3/2 max-pool; width taps via zero-fill shifts (identity
    # post-ReLU), stride-2 compaction + transpose in one MXU selection matmul
    sel = sel_ref[:]
    for p in range(tp):
        rm = jnp.maximum(jnp.maximum(ybuf[2 * p], ybuf[2 * p + 1]),
                         ybuf[2 * p + 2])
        z1 = jnp.concatenate([rm[:, 1:], jnp.zeros((64, 1), rm.dtype)], axis=1)
        z2 = jnp.concatenate([rm[:, 2:], jnp.zeros((64, 2), rm.dtype)], axis=1)
        m = jnp.maximum(jnp.maximum(rm, z1), z2).astype(sel.dtype)
        if cw:
            # CW layout [64, PW] — channels stay on sublanes for the fused
            # layer1 kernel (ops/layer1_pallas.py); sel compacts stride-2
            outp = lax.dot_general(m, sel, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        else:
            outp = lax.dot_general(sel, m, (((0,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)  # [PW, 64]
        out_ref[0, p] = outp.astype(out_dtype)


def _fused_stem_impl(static, x, kernel, scale, bias, mean, var):
    out_dtype, compute_dtype, tp, interpret, eps, cw = static
    out_dtype = jnp.dtype(out_dtype)
    compute_dtype = jnp.dtype(compute_dtype)
    b, h, w, _ = x.shape
    oh, ow, phh, pww = stem_out_shapes(h, w)
    nt = -(-phh // tp)
    # DMA windows must be lane-tile-aligned on the minor dim: pad Ws to 128
    ws = -(-(ow + 3) // 128) * 128
    chunk = 128                      # de-interleave row-grid granularity
    rowsp = -(-(4 * tp * nt + 8) // chunk) * chunk   # padded image rows
    rws = 4 * tp + 8                 # image rows per stem tile (halos incl.)
    th = 2 * tp + 1

    xs = _deinterleave(_flatten_pad(x, rowsp, ws, compute_dtype),
                       ws, compute_dtype, chunk, interpret)
    wm = _pack_weight(kernel, compute_dtype)
    mul, add = bn_mul_add(scale, bias, mean, var, eps)
    mul, add = mul.reshape(64, 1), add.reshape(64, 1)
    # 0/1 selection matrix: sel[i, q] = (i == 2q) — compacts the 3-tap width
    # max to stride-2 cells AND transposes [64, OW] -> [PW, 64] on the MXU
    sel = (np.arange(ow)[:, None] == 2 * np.arange(pww)[None, :])
    sel = jnp.asarray(sel, dtype=compute_dtype)

    kern = partial(_stem_kernel, nt=nt, total=b * nt, tp=tp, rws=rws,
                   oh=oh, ow=ow, out_dtype=out_dtype, cw=cw)
    out_block = (1, tp, 64, pww) if cw else (1, tp, pww, 64)
    out = pl.pallas_call(
        kern,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # xs (HBM)
            pl.BlockSpec((64, 256), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),              # wm
            pl.BlockSpec((64, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),              # mul
            pl.BlockSpec((64, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),              # add
            pl.BlockSpec((ow, pww), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),              # sel
        ],
        out_specs=pl.BlockSpec(out_block, lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nt * tp) + out_block[2:], out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * rws, 8, ws), compute_dtype),        # xs_buf
            pltpu.VMEM((th, 64, ow), jnp.float32),              # ybuf
            pltpu.VMEM((256, ow), compute_dtype),               # r256 (im2col)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xs, wm, mul, add, sel)
    return out[:, :phh]


def _fused_stem_dispatch(static, x, kernel, scale, bias, mean, var):
    # multi-device worlds go through the batch-dim partitioning rule so DP
    # meshes keep the fused kernel (ops/batch_partition.py); single-device
    # processes call the impl directly
    from rlobjectdetection_tpu.ops.batch_partition import batch_partitioned_call

    return batch_partitioned_call(_fused_stem_impl, static, x, kernel,
                                  scale, bias, mean, var, out_rank=4)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_stem(static, x, kernel, scale, bias, mean, var):
    return _fused_stem_dispatch(static, x, kernel, scale, bias, mean, var)


def _fused_stem_fwd(static, x, kernel, scale, bias, mean, var):
    return _fused_stem_dispatch(static, x, kernel, scale, bias, mean, var), None


def _fused_stem_bwd(static, residuals, g):
    raise NotImplementedError(
        "fused_stem is forward-only: conv1/bn1 are frozen in every reference "
        "configuration (resnet.py:250-266); a stop_gradient must sit between "
        "the stem and any trainable parameter."
    )


_fused_stem.defvjp(_fused_stem_fwd, _fused_stem_bwd)


def fused_stem(x, kernel, scale, bias, mean, var, *, out_dtype=jnp.bfloat16,
               compute_dtype=jnp.bfloat16, tile_rows=8, interpret=False,
               eps=1e-5, cw_out=False):
    """conv1(7x7/2) + frozen-BN + ReLU + ceil-maxpool(3x3/2) in one kernel.

    x: [B, H, W, 3] float; kernel: [7, 7, 3, 64] (HWIO, the canonical
    'conv1/kernel' param); scale/bias/mean/var: [64] frozen bn1 params.
    Returns [B, PH, PW, 64] in out_dtype, PH/PW per `stem_out_shapes` —
    or [B, PH, 64, PW] with cw_out=True (channels on sublanes, the slab
    layout ops/layer1_pallas.py consumes with zero transposes).
    """
    assert x.shape[-1] == 3 and kernel.shape == (7, 7, 3, 64), (
        "fused_stem is specialized to the 3->64 7x7 ResNet stem")
    static = (jnp.dtype(out_dtype).name, jnp.dtype(compute_dtype).name,
              int(tile_rows), bool(interpret), float(eps), bool(cw_out))
    return _fused_stem(static, x, kernel, scale, bias, mean, var)
