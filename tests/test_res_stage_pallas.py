"""Parity of the fused Pallas residual stage (ops/res_stage_pallas.py) vs
the ResLayer composition (models/backbones/resnet.py; reference semantics
lib/model/faster_rcnn/resnet.py:66-102, caffe flavor: stage stride sits on
block0's 1x1 conv1/downsample, so the fused kernel consumes the caller-
strided even-coordinate grid).

Interpret mode on the forced-CPU mesh; shapes exercise odd Ho/Wo, chunked
position slabs (chunk < P), stride-1 and stride-2 entries, and multi-image
batches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlobjectdetection_tpu.models.backbones.resnet import ResLayer
from rlobjectdetection_tpu.ops.res_stage_pallas import fused_res_stage


def _layer_and_params(rng, planes, blocks, stride, cin, key=0):
    layer = ResLayer(planes, blocks, stride, jnp.float32)
    params = layer.init(jax.random.PRNGKey(key),
                        jnp.zeros((1, 8, 8, cin), jnp.float32))["params"]

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


@pytest.mark.parametrize("b,h,w,planes,blocks,stride,cin,chunk", [
    (1, 13, 11, 8, 3, 2, 16, 48),   # layer2-like: stride-2 entry, 3 chunks
    (2, 7, 9, 8, 2, 1, 32, 1024),   # stride-1 entry, single chunk, 2 images
    (1, 10, 6, 16, 4, 2, 8, 16),    # tiny chunk = many partial-halo chunks
    (1, 5, 16, 8, 2, 1, 16, 32),    # Wo a multiple of 16 (aligned row case)
])
def test_fused_res_stage_matches_reslayer(b, h, w, planes, blocks, stride,
                                          cin, chunk):
    rng = np.random.RandomState(b * 100 + h + planes)
    layer, params = _layer_and_params(rng, planes, blocks, stride, cin, key=b)
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32) * 0.1)
    ref = layer.apply({"params": params}, x)
    xs = x[:, ::stride, ::stride, :]
    got = fused_res_stage(xs, params, blocks=blocks, width=planes,
                          out_dtype=jnp.float32, compute_dtype=jnp.float32,
                          chunk=chunk, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_resnet_base_fused_stages_drop_in():
    """ResNetBase(stages_fused=23) is a drop-in: identical param tree, same
    output as the plain XLA path (f32, interpret on CPU), and the fused
    stages only engage when the forward-only contract holds."""
    from rlobjectdetection_tpu.models.backbones.resnet import ResNetBase

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 64, 48, 3).astype(np.float32) * 5)
    plain = ResNetBase(num_layers=50, dtype=jnp.float32, frozen_stages=3)
    fused = ResNetBase(num_layers=50, dtype=jnp.float32, frozen_stages=3,
                       stages_fused=23, stem_interpret=True)
    params = plain.init(jax.random.PRNGKey(3), x)["params"]
    fused_params = fused.init(jax.random.PRNGKey(3), x)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(fused_params)
    assert all(a.shape == b.shape for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(fused_params)))
    ref = plain.apply({"params": params}, x)
    got = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-2)

    # frozen_stages=1 blocks stage fusion in training mode (fwd_only=False):
    # output must still match the plain path because the plain stages run
    trainy = ResNetBase(num_layers=50, dtype=jnp.float32, frozen_stages=1,
                        stages_fused=23, stem_interpret=True)
    got2 = trainy.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # ...and fwd_only=True re-enables it (the eval path)
    got3 = trainy.apply({"params": params}, x, fwd_only=True)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(ref),
                               rtol=1e-3, atol=1e-2)


def test_fused_res_stage_is_forward_only():
    rng = np.random.RandomState(0)
    _, params = _layer_and_params(rng, 8, 2, 1, 32)
    x = jnp.asarray(rng.randn(1, 6, 6, 32).astype(np.float32))

    def f(xi):
        return fused_res_stage(xi, params, blocks=2, width=8,
                               out_dtype=jnp.float32,
                               compute_dtype=jnp.float32,
                               interpret=True).sum()

    with pytest.raises(NotImplementedError, match="forward-only"):
        jax.grad(f)(x)


def test_resnet_base_rejects_malformed_stages_fused():
    """stages_fused is digit-coded {0,2,3,23}; anything else must fail fast
    (a typo like 1 or 32 would otherwise silently change which stages fuse)."""
    from rlobjectdetection_tpu.models.backbones.resnet import ResNetBase

    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    bad = ResNetBase(num_layers=50, dtype=jnp.float32, frozen_stages=3,
                     stages_fused=32, stem_interpret=True)
    with pytest.raises(AssertionError, match="digit-coded"):
        bad.init(jax.random.PRNGKey(0), x)
