"""Parity of the fused Pallas stem (conv1+bn+relu+ceil-maxpool) vs the XLA
composition used by the default ResNetBase path (models/backbones/resnet.py).

Runs the kernel in interpret mode on the forced-CPU mesh; the shapes exercise
odd H/W (ceil-mode edge cells), multiple row tiles, and a partial last tile.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from rlobjectdetection_tpu.models.backbones.resnet import ceil_max_pool
from rlobjectdetection_tpu.ops.stem_pallas import fused_stem, stem_out_shapes


def xla_stem(x, kernel, scale, bias, mean, var, eps=1e-5):
    y = lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    inv = lax.rsqrt(var + eps)
    y = y * (scale * inv) + (bias - mean * scale * inv)
    return ceil_max_pool(jnp.maximum(y, 0.0))


def _random_inputs(rng, b, h, w):
    x = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 3)
    k = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(64).astype(np.float32))
    mean = jnp.asarray(rng.randn(64).astype(np.float32) * 0.2)
    var = jnp.asarray(rng.rand(64).astype(np.float32) + 0.3)
    return x, k, scale, bias, mean, var


@pytest.mark.parametrize("b,h,w,tp", [
    (1, 64, 80, 8),     # even dims, 2 tiles
    (2, 37, 45, 4),     # odd dims -> ceil-mode edge cells, partial last tile
    (1, 29, 128, 8),    # PH smaller than one tile
])
def test_fused_stem_matches_xla(b, h, w, tp):
    rng = np.random.RandomState(b * 1000 + h + w)
    args = _random_inputs(rng, b, h, w)
    ref = xla_stem(*args)
    got = fused_stem(*args, out_dtype=jnp.float32, compute_dtype=jnp.float32,
                     tile_rows=tp, interpret=True)
    _, _, ph, pw = stem_out_shapes(h, w)
    assert got.shape == (b, ph, pw, 64) == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_fused_stem_cw_out_layout():
    """cw_out=True returns the same values in [B, PH, 64, PW] (channels on
    sublanes — the slab layout ops/layer1_pallas.py consumes)."""
    rng = np.random.RandomState(21)
    args = _random_inputs(rng, 2, 37, 45)
    ref = fused_stem(*args, out_dtype=jnp.float32, compute_dtype=jnp.float32,
                     tile_rows=4, interpret=True)
    got = fused_stem(*args, out_dtype=jnp.float32, compute_dtype=jnp.float32,
                     tile_rows=4, interpret=True, cw_out=True)
    assert got.shape == (ref.shape[0], ref.shape[1], 64, ref.shape[2])
    np.testing.assert_array_equal(np.asarray(got).transpose(0, 1, 3, 2),
                                  np.asarray(ref))


def test_fused_stem_bf16_close():
    rng = np.random.RandomState(7)
    args = _random_inputs(rng, 1, 48, 64)
    ref = np.asarray(xla_stem(*args))
    got = np.asarray(fused_stem(*args, out_dtype=jnp.bfloat16,
                                compute_dtype=jnp.bfloat16, tile_rows=4,
                                interpret=True)).astype(np.float32)
    # bf16 tap products; pooled maxima stay within bf16 rounding of the ref
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-1)


def test_resnet_base_fused_stem_matches_plain():
    """ResNetBase(conv1_fused=True) is a drop-in: same param tree, same
    output as the plain XLA stem path (f32, interpret mode on CPU)."""
    from rlobjectdetection_tpu.models.backbones.resnet import ResNetBase

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 64, 80, 3).astype(np.float32) * 5)
    plain = ResNetBase(num_layers=50, dtype=jnp.float32)
    fused = ResNetBase(num_layers=50, dtype=jnp.float32, conv1_fused=True,
                       stem_interpret=True)
    params = plain.init(jax.random.PRNGKey(3), x)["params"]
    # identical trees -> the fused model consumes the plain model's params
    fused_params = fused.init(jax.random.PRNGKey(3), x)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(fused_params)
    ref = plain.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_fused_stem_is_forward_only():
    rng = np.random.RandomState(3)
    args = _random_inputs(rng, 1, 32, 32)

    def loss(k):
        return fused_stem(args[0], k, *args[2:], out_dtype=jnp.float32,
                          compute_dtype=jnp.float32, tile_rows=4,
                          interpret=True).sum()

    # grads through the stem are a contract violation, not silent zeros
    with pytest.raises(NotImplementedError):
        jax.grad(loss)(args[1])

    # ...but a downstream stop_gradient (how ResNetBase always uses it) is fine
    def loss_stopped(k):
        out = fused_stem(args[0], k, *args[2:], out_dtype=jnp.float32,
                         compute_dtype=jnp.float32, tile_rows=4,
                         interpret=True)
        return (lax.stop_gradient(out)).sum() + (k * 0.0).sum()

    g = jax.grad(loss_stopped)(args[1])
    np.testing.assert_array_equal(np.asarray(g), 0.0)
