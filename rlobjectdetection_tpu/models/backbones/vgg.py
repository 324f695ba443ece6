"""VGG-16 backbone in flax.linen, NHWC.

Reference: /root/reference/lib/model/faster_rcnn/vgg16.py —
  * base = torchvision vgg16 features minus the last maxpool (l.38): 13 convs,
    4 maxpools → stride-16 512-ch feature
  * head = vgg classifier minus the last fc (l.35, 46): fc6(25088→4096) + ReLU
    + Dropout + fc7(4096→4096) + ReLU + Dropout
  * layers before conv3 frozen (l.41-42) — expressed via `vgg_param_trainable`
  * weight init / pretrained weights come from the caffe checkpoint
    (data/pretrained_model/vgg16_caffe.pth) via tools/convert_torch_weights.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

# (block, convs-in-block, channels)
VGG16_CFG = ((1, 2, 64), (2, 2, 128), (3, 3, 256), (4, 3, 512), (5, 3, 512))


class _VGGConvParams(nn.Module):
    """Holder exposing nn.Conv-compatible 'kernel'+'bias' params for the
    fused-block1 path (same names/shapes/inits as the nn.Conv modules it
    replaces — checkpoints interchange freely between the paths)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(), self.shape),
                self.param("bias", nn.initializers.zeros, (self.shape[-1],)))


class VGGBase(nn.Module):
    """conv1_1 .. conv5_3 (no pool5) → [B, H/16, W/16, 512].

    Blocks 1..frozen_blocks are frozen upstream (vgg16.py:41-42 freezes
    features[:10] = blocks 1-2); cutting the gradient at that boundary lets
    XLA delete their backward, as torch autograd does for requires_grad=False.

    conv1_fused runs block 1 (conv1_1+relu+conv1_2+relu+pool1) as one Pallas
    kernel (ops/vgg_stem_pallas.py) — the ResNet stem thesis applied to VGG's
    3-channel conv1_1 (XLA pads C_in 3→128 on the MXU at FULL resolution).
    Forward-only: block 1 is always inside the frozen prefix
    (frozen_blocks >= 1 in every reference config). Takes effect only on the
    TPU backend unless stem_interpret forces interpret mode (CPU tests).
    """

    dtype: Any = jnp.float32
    frozen_blocks: int = 2
    conv1_fused: bool = False
    stem_interpret: bool = False

    @nn.compact
    def __call__(self, x):
        import jax
        from jax import lax

        pallas_ok = self.stem_interpret or jax.default_backend() == "tpu"
        fuse1 = self.conv1_fused and pallas_ok and self.frozen_blocks >= 1
        if not fuse1:
            # fused block 1 takes the raw (f32) image and casts inside its
            # fusable flatten-pad; the plain path casts up front
            x = x.astype(self.dtype)
        for block, n_convs, ch in VGG16_CFG:
            if block == 1 and fuse1:
                from rlobjectdetection_tpu.ops.vgg_stem_pallas import fused_vgg_block1

                k1, b1 = _VGGConvParams((3, 3, 3, 64), name="conv1_1")()
                k2, b2 = _VGGConvParams((3, 3, 64, 64), name="conv1_2")()
                # pool1 (the block > 1 branch below) is fused in the kernel;
                # block 2 skips its leading max_pool via the flag
                x = fused_vgg_block1(x, k1, b1, k2, b2,
                                     out_dtype=self.dtype,
                                     compute_dtype=self.dtype,
                                     interpret=self.stem_interpret)
                if self.frozen_blocks == 1:
                    x = lax.stop_gradient(x)
                continue
            if block > 1 and not (block == 2 and fuse1):
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for i in range(1, n_convs + 1):
                x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            name=f"conv{block}_{i}")(x)
                x = nn.relu(x)
            if block == self.frozen_blocks:
                x = lax.stop_gradient(x)
        return x


class VGGHead(nn.Module):
    """fc6 + fc7 head on flattened pool5 → [R, 4096] (vgg16.py:55-60).

    The flatten order matches torch NCHW (C, H, W row-major) so converted fc6
    weights line up: input pooled is [R, P, P, C] NHWC and is transposed before
    flattening.
    """

    dtype: Any = jnp.float32
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, pooled, *, train: bool = False):
        r, p1, p2, c = pooled.shape
        x = jnp.transpose(pooled, (0, 3, 1, 2)).reshape(r, c * p1 * p2)
        x = nn.Dense(4096, dtype=self.dtype, name="fc6")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(4096, dtype=self.dtype, name="fc7")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


def vgg_param_trainable(path: Sequence[str], fixed_blocks: int = 2) -> bool:
    """Freeze conv blocks 1..fixed_blocks (vgg16.py:41-42 freezes features[:10] =
    blocks 1 and 2)."""
    name = path[0]
    if name.startswith("conv"):
        block = int(name[4])
        return block > fixed_blocks
    return True
