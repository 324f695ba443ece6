"""Parity of the fused Pallas VGG block 1 (conv1_1+relu+conv1_2+relu+pool1)
vs the XLA composition used by the default VGGBase path
(models/backbones/vgg.py). Interpret mode on the forced-CPU mesh; shapes
exercise multiple row tiles and a partial last tile.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from rlobjectdetection_tpu.ops.vgg_stem_pallas import fused_vgg_block1


def xla_block1(x, k1, b1, k2, b2):
    y = lax.conv_general_dilated(
        x, k1, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
    y = jnp.maximum(y, 0.0)
    y = lax.conv_general_dilated(
        y, k2, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2
    y = jnp.maximum(y, 0.0)
    return lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                             "VALID")


def _random_inputs(rng, b, h, w):
    x = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 3)
    k1 = jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(64).astype(np.float32))
    k2 = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(64).astype(np.float32))
    return x, k1, b1, k2, b2


@pytest.mark.parametrize("b,h,w,tp", [
    (1, 64, 80, 8),     # 4 tiles
    (2, 32, 48, 5),     # partial last tile (PH=16, tp=5)
    (1, 16, 128, 8),    # PH exactly one tile
])
def test_fused_vgg_block1_matches_xla(b, h, w, tp):
    rng = np.random.RandomState(b * 1000 + h + w)
    args = _random_inputs(rng, b, h, w)
    ref = xla_block1(*args)
    got = fused_vgg_block1(*args, out_dtype=jnp.float32,
                           compute_dtype=jnp.float32, tile_rows=tp,
                           interpret=True)
    assert got.shape == (b, h // 2, w // 2, 64) == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_fused_vgg_block1_bf16_close():
    rng = np.random.RandomState(7)
    args = _random_inputs(rng, 1, 32, 64)
    ref = np.asarray(xla_block1(*args))
    got = np.asarray(fused_vgg_block1(
        *args, out_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
        tile_rows=4, interpret=True)).astype(np.float32)
    # two chained bf16 convs; pooled maxima stay within bf16 rounding
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=1.0)


def test_vgg_base_fused_matches_plain():
    """VGGBase(conv1_fused=True) is a drop-in: same param tree, same output
    as the plain XLA path (f32, interpret mode on CPU)."""
    from rlobjectdetection_tpu.models.backbones.vgg import VGGBase

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 64, 80, 3).astype(np.float32) * 5)
    plain = VGGBase(dtype=jnp.float32)
    fused = VGGBase(dtype=jnp.float32, conv1_fused=True, stem_interpret=True)
    params = plain.init(jax.random.PRNGKey(3), x)["params"]
    fused_params = fused.init(jax.random.PRNGKey(3), x)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(fused_params)
    ref = plain.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_fused_vgg_block1_is_forward_only():
    rng = np.random.RandomState(3)
    args = _random_inputs(rng, 1, 16, 32)

    def loss(k1):
        return fused_vgg_block1(args[0], k1, *args[2:], out_dtype=jnp.float32,
                                compute_dtype=jnp.float32, tile_rows=4,
                                interpret=True).sum()

    with pytest.raises(NotImplementedError):
        jax.grad(loss)(args[1])

    # the VGGBase usage (stop_gradient at the frozen boundary) is fine, and
    # trainable block-3+ params still get gradients through the fused output
    from rlobjectdetection_tpu.models.backbones.vgg import VGGBase

    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    model = VGGBase(dtype=jnp.float32, conv1_fused=True, stem_interpret=True)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    def vgg_loss(p):
        return (model.apply({"params": p}, x) ** 2).sum()

    g = jax.grad(vgg_loss)(params)
    np.testing.assert_array_equal(np.asarray(g["conv1_1"]["kernel"]), 0.0)
    assert float(np.abs(np.asarray(g["conv5_3"]["kernel"])).sum()) > 0


def test_vgg_fused_path_actually_engages(monkeypatch):
    """Count the kernel entry point through the model gate (plain == plain
    would pass the drop-in test trivially)."""
    from rlobjectdetection_tpu.models.backbones import vgg as vgg_mod
    from rlobjectdetection_tpu.ops import vgg_stem_pallas

    calls = {"n": 0}
    real = vgg_stem_pallas.fused_vgg_block1

    def wrapper(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(vgg_stem_pallas, "fused_vgg_block1", wrapper)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    model = vgg_mod.VGGBase(dtype=jnp.float32, conv1_fused=True,
                            stem_interpret=True)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    model.apply({"params": params}, x)
    assert calls["n"] >= 1, "fused VGG block1 never invoked"

    # the gate really disables it: CPU backend without interpret
    calls["n"] = 0
    gated = vgg_mod.VGGBase(dtype=jnp.float32, conv1_fused=True)
    gated.apply({"params": params}, x)
    assert calls["n"] == 0
