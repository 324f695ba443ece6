"""Frozen-BatchNorm constant folding shared by the fused Pallas kernels.

The reference freezes BN throughout (lib/model/faster_rcnn/resnet.py:261-284),
so BN is an affine y = x*mul + add with constants; the fused kernels
(stem_pallas, layer1_pallas, res_stage_pallas) fold `mul` into the preceding
conv's weight rows host-side and apply only `add` on-chip.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def bn_mul_add(scale, bias, mean, var, eps):
    """FrozenBatchNorm fold (computed in f32): y = x*mul + add."""
    inv = lax.rsqrt(var.astype(jnp.float32) + eps)
    mul = scale.astype(jnp.float32) * inv
    add = bias.astype(jnp.float32) - mean.astype(jnp.float32) * mul
    return mul, add
