"""Fused ResNet residual stage (layer2/layer3) as one forward-only Pallas
TPU kernel: the whole chain of bottleneck blocks runs per image with the
activation slab resident in VMEM and per-block weights streamed in.

Why: after the fused stem + layer1 kernels, the frozen conv1..layer3 trunk
of the RL refinement workload (and the WHOLE backbone of the serving path,
which has no backward at all) is dominated by XLA's layer2/layer3 conv
schedule at the C4 bench shapes (~40% MFU ceiling, DESIGN.md Roofline).
layer3 alone is 23 bottleneck blocks = ~75% of trunk forward FLOPs. This
kernel formulates every conv as a position-major GEMM and keeps all
intermediates on-chip:

* Activations are [P, C] slabs (P = Ho*Wo flattened positions on sublanes,
  channels on lanes) — exactly the NHWC reshape, so producer/consumer pay
  no transpose.
* conv1x1 = [P, Cin] @ [Cin, width] MXU contraction.
* conv3x3 = ONE [P, 3w] @ [3w, 3w] contraction per chunk: the three dy tap
  rows are prebuilt as lane-stacked bands (masked +-Wo sublane rolls of the
  conv1 output), the three dx taps stack on the packed weight's N columns,
  and the +-1 column taps become sublane-shifted slices of the f32 partial
  sums with column-boundary masks (the same tap-packing that took the
  layer1 kernel's 3x3 from 25% to ~56% MXU utilization).
* The strided entry block needs no in-kernel striding: a 1x1 stride-2 conv
  (caffe flavor — stride sits on conv1/downsample, resnet.py:71-73 \"#
  change\") reads exactly the even-coordinate grid, so the CALLER passes
  x[:, ::2, ::2, :] and every block works on the output grid.
* Grid = (batch, blocks): the activation slab S persists in scratch across
  the block dimension; per-block weights arrive via BlockSpec index maps
  (block0's conv1 weight is K-padded into the common [Cmax, w] slot); the
  finished slab DMAs straight from scratch to HBM.
* BN folds into the preceding conv's weight columns host-side (f32), the
  kernel applies only the per-channel adds.

Semantics parity: models/backbones/resnet.py::ResLayer(width, blocks,
stride) — reference lib/model/faster_rcnn/resnet.py:66-102 (Bottleneck,
caffe flavor) — pinned by interpret-mode tests on odd shapes.

Forward-only by contract: layer2/layer3 are frozen for RESNET.FIXED_BLOCKS
>= 2/3 (resnet.py:250-259), the RL net freezes the whole conv1..layer3
trunk (Reinforcement/resnet.py:139-147), and the eval/serving path computes
no gradients at all. The custom_vjp raises if ever differentiated;
ResNetBase gates the fused path on those contracts.

Status: a measured NEGATIVE result end-to-end (DESIGN.md "Fused Pallas
layer1 and frozen residual stages") — XLA's conv schedule wins at
layer2/3 widths, so this stays opt-in/off. Known untried improvement if
revisited: the input x is a VMEM BlockSpec operand pinned for every
(b, j) grid step though only block j=0 reads it; moving it to ANY/HBM
with an explicit j==0 DMA (the stem/layer1 pattern) frees ~4-8 MB of
VMEM for pipelining.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rlobjectdetection_tpu.ops.bn_fold import bn_mul_add as _bn_mul_add

_HALO = 16  # sublane-aligned chunk overlap; the 3x3 dx taps need only +-1


def _dot_f32(a, b):
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _stage_kernel(x_ref, w1s, m2s, w3s, wd, a1s, a2s, a3s, ad, out_hbm,
                  s_slab, t3, sem, *, nb, cin, w, cmax, wo, p, pp, ch,
                  compute_dtype):
    """One grid step = one bottleneck block j of image b.

    s_slab [PP, Cmax]: the running stage activation (persists over j).
    t3 [PP + 2*HALO, 3w]: dy-banded conv1 output — rows [HALO, HALO+PP) are
    data; band lanes [0,w) = row above (p-Wo), [w,2w) = center, [2w,3w) =
    row below; 16-row pad zones at both ends stay zero so chunk halos read
    conv zero-padding.
    """
    b = pl.program_id(0)
    j = pl.program_id(1)
    nch = pp // ch

    @pl.when((b == 0) & (j == 0))
    def _():
        t3[:] = jnp.zeros_like(t3)  # pad zones must read as zeros forever

    def rows_valid(c0, rr):
        """[rr, 1] mask: global position < P (pad rows act as conv zero
        padding and must not hold relu(bias) garbage)."""
        g = c0 + lax.broadcasted_iota(jnp.int32, (rr, 1), 0)
        return g < p

    # ---- conv1 pass: T1 = relu(src @ W1 + b1) into t3's center band ----
    b1 = a1s[0]                                         # [1, w]
    for c in range(nch):
        c0 = c * ch

        def t1_of(src_chunk, k):
            seg = _dot_f32(src_chunk, w1s[0, :k, :]) + b1
            seg = jnp.maximum(seg, 0.0).astype(compute_dtype)
            return jnp.where(rows_valid(c0, ch), seg, 0)

        @pl.when(j == 0)
        def _():
            t3[_HALO + c0:_HALO + c0 + ch, w:2 * w] = \
                t1_of(x_ref[0, c0:c0 + ch, :], cin)

        @pl.when(j > 0)
        def _():
            t3[_HALO + c0:_HALO + c0 + ch, w:2 * w] = \
                t1_of(s_slab[c0:c0 + ch, :], cmax)

    # ---- dy bands: above = roll(+Wo) (top Wo rows have no above), below =
    # roll(-Wo) (tail rows read zeros; wrapped head rows are killed because
    # they only feed pad-row outputs or masked column taps). The roll runs
    # in f32: this toolchain's AOT Mosaic path rejects sub-32-bit sublane
    # rotates ("Rotate with non-32-bit data"); casts are free when
    # compute_dtype is already f32 ----
    t1 = t3[_HALO:_HALO + pp, w:2 * w].astype(jnp.float32)
    riota = lax.broadcasted_iota(jnp.int32, (pp, 1), 0)
    above = jnp.where(riota >= wo, pltpu.roll(t1, wo, 0), 0)
    below = jnp.where(riota < p - wo, pltpu.roll(t1, pp - wo, 0), 0)
    t3[_HALO:_HALO + pp, 0:w] = above.astype(compute_dtype)
    t3[_HALO:_HALO + pp, 2 * w:3 * w] = below.astype(compute_dtype)

    # ---- conv2 (packed 3x3) + conv3 + residual + relu, per chunk ----
    b2 = a2s[0]                                         # [1, w]
    b3 = a3s[0]                                         # [1, cmax]
    for c in range(nch):
        c0 = c * ch
        rhs = t3[c0:c0 + ch + 2 * _HALO, :]             # rows c0-HALO..+HALO
        ps = _dot_f32(rhs, m2s[0])                      # [ch+2H, 3w] f32
        # out[p] = ps[p-1, dx0] + ps[p, dx1] + ps[p+1, dx2]; local row of
        # global p is p - c0 + HALO. Column-boundary masks kill the wrapped
        # left/right neighbours (col 0 has no p-1 tap, col Wo-1 no p+1).
        col = (c0 + lax.broadcasted_iota(jnp.int32, (ch, 1), 0)) % wo
        left = jnp.where(col > 0, ps[_HALO - 1:_HALO - 1 + ch, 0:w], 0)
        right = jnp.where(col < wo - 1,
                          ps[_HALO + 1:_HALO + 1 + ch, 2 * w:3 * w], 0)
        y2 = left + ps[_HALO:_HALO + ch, w:2 * w] + right + b2
        y2 = jnp.maximum(y2, 0.0).astype(compute_dtype)
        y3 = _dot_f32(y2, w3s[0])                       # [ch, cmax] f32

        @pl.when(j == 0)
        def _():
            res = _dot_f32(x_ref[0, c0:c0 + ch, :], wd[:cin, :]) + ad[:]
            s_slab[c0:c0 + ch, :] = \
                jnp.maximum(y3 + b3 + res, 0.0).astype(compute_dtype)

        @pl.when(j > 0)
        def _():
            res = s_slab[c0:c0 + ch, :].astype(jnp.float32)
            s_slab[c0:c0 + ch, :] = \
                jnp.maximum(y3 + b3 + res, 0.0).astype(compute_dtype)

    # ---- finished image: slab -> HBM ----
    @pl.when(j == nb - 1)
    def _():
        cp = pltpu.make_async_copy(s_slab, out_hbm.at[b], sem)
        cp.start()
        cp.wait()


def _pack_params(p, nb, cin, w, cmax, compute_dtype, eps):
    """ResLayer param tree (block0 with downsample + identity blocks) ->
    stacked kernel arrays; BN muls fold into the preceding conv's weight
    columns (f32, cast once), adds ship separately."""
    def ma(blk, name):
        q = p[blk][name]
        return _bn_mul_add(q["scale"], q["bias"], q["mean"], q["var"], eps)

    def m1(kern, mul, kpad):  # [1,1,K,w] -> [kpad, w], cols scaled by mul
        m = kern[0, 0].astype(jnp.float32) * mul[None, :]
        m = jnp.pad(m, ((0, kpad - m.shape[0]), (0, 0)))
        return m.astype(compute_dtype)

    def m2(kern, mul):
        """[3,3,w,w] HWIO -> [3w, 3w]: row dy*w+ci (K, matching the t3 band
        order), col dx*w+co (N, the three dx partial-sum bands)."""
        m = kern.astype(jnp.float32) * mul[None, None, None, :]
        return m.transpose(0, 2, 1, 3).reshape(3 * w, 3 * w).astype(compute_dtype)

    bn1 = [ma(f"block{i}", "bn1") for i in range(nb)]
    bn2 = [ma(f"block{i}", "bn2") for i in range(nb)]
    bn3 = [ma(f"block{i}", "bn3") for i in range(nb)]
    bnd = ma("block0", "downsample_bn")
    row = lambda a: a.astype(jnp.float32).reshape(1, -1)
    return dict(
        w1s=jnp.stack([m1(p[f"block{i}"]["conv1"]["kernel"], bn1[i][0],
                          cmax) for i in range(nb)]),     # [nb, cmax, w]
        m2s=jnp.stack([m2(p[f"block{i}"]["conv2"]["kernel"], bn2[i][0])
                       for i in range(nb)]),              # [nb, 3w, 3w]
        w3s=jnp.stack([m1(p[f"block{i}"]["conv3"]["kernel"], bn3[i][0], w)
                       for i in range(nb)]),              # [nb, w, cmax]
        wd=m1(p["block0"]["downsample_conv"]["kernel"], bnd[0], cin),
        a1s=jnp.stack([row(bn1[i][1]) for i in range(nb)]),  # [nb, 1, w]
        a2s=jnp.stack([row(bn2[i][1]) for i in range(nb)]),
        a3s=jnp.stack([row(bn3[i][1]) for i in range(nb)]),
        ad=row(bnd[1]),                                      # [1, cmax]
    )


_ARG_ORDER = ("w1s", "m2s", "w3s", "wd", "a1s", "a2s", "a3s", "ad")


def _fused_res_stage_impl(static, x, *packed):
    (nb, w, out_dtype, compute_dtype, chunk, interpret) = static
    out_dtype, compute_dtype = jnp.dtype(out_dtype), jnp.dtype(compute_dtype)
    b, ho, wo, cin = x.shape
    cmax = 4 * w
    p = ho * wo
    ch = min(chunk, -(-p // 16) * 16)
    pp = -(-p // ch) * ch
    xf = x.reshape(b, p, cin).astype(compute_dtype)
    xf = jnp.pad(xf, ((0, 0), (0, pp - p), (0, 0)))

    kern = partial(_stage_kernel, nb=nb, cin=cin, w=w, cmax=cmax, wo=wo,
                   p=p, pp=pp, ch=ch, compute_dtype=compute_dtype)
    shapes = dict(w1s=(1, cmax, w), m2s=(1, 3 * w, 3 * w), w3s=(1, w, cmax),
                  wd=(cin, cmax), a1s=(1, 1, w), a2s=(1, 1, w),
                  a3s=(1, 1, cmax), ad=(1, cmax))
    perblk = lambda s: pl.BlockSpec(s, lambda b_, j: (j,) + (0,) * (len(s) - 1),
                                    memory_space=pltpu.VMEM)
    const = lambda s: pl.BlockSpec(s, lambda b_, j: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    spec = {k: (perblk if k[-1] == "s" else const)(shapes[k])
            for k in _ARG_ORDER}
    out = pl.pallas_call(
        kern,
        grid=(b, nb),
        in_specs=[pl.BlockSpec((1, pp, cin), lambda b_, j: (b_, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [spec[k] for k in _ARG_ORDER],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, pp, cmax), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((pp, cmax), compute_dtype),               # s_slab
            pltpu.VMEM((pp + 2 * _HALO, 3 * w), compute_dtype),  # t3
            pltpu.SemaphoreType.DMA,
        ],
        # layer2's slab scratch alone is ~16 MB at bench shapes — past the
        # 16 MB default scoped-vmem limit, well under the 128 MB v5e VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xf, *packed)
    return out[:, :p, :].reshape(b, ho, wo, cmax)


def _fused_res_stage_dispatch(static, x, *packed):
    # batch-dim partitioning rule for multi-device meshes (batch_partition.py)
    from rlobjectdetection_tpu.ops.batch_partition import batch_partitioned_call

    return batch_partitioned_call(_fused_res_stage_impl, static, x, *packed,
                                  out_rank=4)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_res_stage(static, x, *packed):
    return _fused_res_stage_dispatch(static, x, *packed)


def _fused_res_stage_fwd(static, x, *packed):
    return _fused_res_stage_dispatch(static, x, *packed), None


def _fused_res_stage_bwd(static, residuals, g):
    raise NotImplementedError(
        "fused_res_stage is forward-only: it serves frozen trunk stages "
        "(RESNET.FIXED_BLOCKS >= stage / the RL net's frozen conv1..layer3) "
        "and the no-gradient eval path; a stop_gradient must sit between "
        "this stage and trainable parameters."
    )


_fused_res_stage.defvjp(_fused_res_stage_fwd, _fused_res_stage_bwd)


def fused_res_stage(x, params, *, blocks, width, out_dtype=jnp.bfloat16,
                    compute_dtype=jnp.bfloat16, chunk=3840, interpret=False,
                    eps=1e-5):
    """Run a frozen residual stage on an ALREADY-STRIDED NHWC input.

    x: [B, Ho, Wo, Cin] — for a stride-2 stage pass x_full[:, ::2, ::2, :]
    (exact: the caffe-flavor stride sits on the 1x1 conv1/downsample, so
    block0 only ever reads the even-coordinate grid).
    params: a ResLayer subtree ('block0'..'block{blocks-1}', block0 with
    downsample_conv/_bn).
    Returns [B, Ho, Wo, 4*width].
    """
    cin = x.shape[-1]
    assert jnp.dtype(out_dtype) == jnp.dtype(compute_dtype), \
        "fused_res_stage DMAs the compute-dtype slab straight to the output"
    packed = _pack_params(params, blocks, cin, width, 4 * width,
                          jnp.dtype(compute_dtype), eps)
    static = (int(blocks), int(width), jnp.dtype(out_dtype).name,
              jnp.dtype(compute_dtype).name, int(chunk), bool(interpret))
    return _fused_res_stage(static, x, *[packed[k] for k in _ARG_ORDER])
