"""Parity of the fused Pallas layer1 (3 bottleneck blocks in one kernel,
ops/layer1_pallas.py) vs the ResLayer composition used by the default
ResNetBase path (models/backbones/resnet.py; reference semantics
lib/model/faster_rcnn/resnet.py:66-102, caffe flavor).

Interpret mode on the forced-CPU mesh; shapes exercise odd H/W (pad lanes,
halo-row masking), a partial last row band, and multiple images.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from rlobjectdetection_tpu.models.backbones.resnet import ResLayer, ResNetBase
from rlobjectdetection_tpu.ops.layer1_pallas import fused_layer1


def _layer_and_params(rng, key=0):
    """ResLayer(64, 3) with randomized params/BN stats (non-trivial folding)."""
    layer = ResLayer(64, 3, 1, jnp.float32)
    params = layer.init(jax.random.PRNGKey(key),
                        jnp.zeros((1, 8, 8, 64), jnp.float32))["params"]

    def randomize(p):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict):
                out[k] = randomize(v)
            else:
                r = rng.randn(*v.shape).astype(np.float32) * 0.05
                r += 1.0 if k in ("scale", "var") else 0.0
                if k == "var":
                    r = np.abs(r) + 0.5
                out[k] = jnp.asarray(r)
        return out

    return layer, randomize(params)


@pytest.mark.parametrize("b,h,w,th", [
    (1, 9, 50, 4),      # partial last band, single 128-lane output chunk
    (2, 13, 40, 8),     # 2 images, band > H
])
def test_fused_layer1_matches_reslayer(b, h, w, th):
    rng = np.random.RandomState(b * 100 + h)
    layer, params = _layer_and_params(rng, key=b)
    x = jnp.asarray(rng.randn(b, h, w, 64).astype(np.float32) * 0.1)
    ref = layer.apply({"params": params}, x)
    x_cw = jnp.transpose(x, (0, 1, 3, 2))           # [B, H, 64, W]
    got = fused_layer1(x_cw, params, out_dtype=jnp.float32,
                       compute_dtype=jnp.float32, tile_rows=th,
                       interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_resnet_base_fused_chain_matches_plain():
    """ResNetBase(conv1_fused + layer1_fused) is a drop-in: identical param
    tree, same output as the plain XLA path (f32, interpret on CPU)."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 64, 80, 3).astype(np.float32) * 5)
    plain = ResNetBase(num_layers=50, dtype=jnp.float32)
    fused = ResNetBase(num_layers=50, dtype=jnp.float32, conv1_fused=True,
                       layer1_fused=True, stem_interpret=True)
    params = plain.init(jax.random.PRNGKey(3), x)["params"]
    fused_params = fused.init(jax.random.PRNGKey(3), x)["params"]
    # identical trees -> checkpoints interchange between the two paths
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(fused_params)
    assert all(a.shape == b.shape for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(fused_params)))
    ref = plain.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-2)


def test_fused_layer1_is_forward_only():
    rng = np.random.RandomState(3)
    _, params = _layer_and_params(rng)
    x_cw = jnp.asarray(rng.randn(1, 6, 64, 30).astype(np.float32) * 0.1)

    def loss(p):
        return fused_layer1(x_cw, p, out_dtype=jnp.float32,
                            compute_dtype=jnp.float32, tile_rows=4,
                            interpret=True).sum()

    # layer1 is frozen for FIXED_BLOCKS >= 1; grads are a contract violation
    with pytest.raises(NotImplementedError):
        jax.grad(loss)(params)

    # ...but the downstream stop_gradient (how ResNetBase uses it) is fine
    def loss_stopped(p):
        out = fused_layer1(x_cw, p, out_dtype=jnp.float32,
                           compute_dtype=jnp.float32, tile_rows=4,
                           interpret=True)
        leaves = jax.tree_util.tree_leaves(p)
        return lax.stop_gradient(out).sum() + sum((l * 0.0).sum()
                                                  for l in leaves)

    g = jax.grad(loss_stopped)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)


def test_fused_layer1_rejects_odd_tile_rows():
    """Odd tile_rows would leave the last band row uninitialized (the
    conv2/conv3 stages stream 2-row chunks) — must fail fast, not NaN."""
    rng = np.random.RandomState(11)
    x_cw = jnp.asarray(rng.randn(1, 10, 64, 20).astype(np.float32))
    layer = ResLayer(64, 3, 1, jnp.float32)
    params = layer.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 10, 20, 64)))["params"]
    with pytest.raises(AssertionError, match="even"):
        fused_layer1(x_cw, params, out_dtype=jnp.float32,
                     compute_dtype=jnp.float32, tile_rows=5, interpret=True)
