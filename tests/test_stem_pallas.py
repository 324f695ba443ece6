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


def test_fused_paths_actually_engage(monkeypatch):
    """The drop-in equality tests cannot see the fused path silently NOT
    engaging (plain == plain passes trivially); count the kernel entry points
    through the model gate for every fused configuration."""
    from rlobjectdetection_tpu.models.backbones.resnet import ResNetBase
    from rlobjectdetection_tpu.ops import layer1_pallas, res_stage_pallas, stem_pallas

    calls = {"stem": 0, "layer1": 0, "stage": 0}
    real_stem = stem_pallas.fused_stem
    real_l1 = layer1_pallas.fused_layer1
    real_stage = res_stage_pallas.fused_res_stage

    def count(key, real):
        def wrapper(*a, **k):
            calls[key] += 1
            return real(*a, **k)
        return wrapper

    monkeypatch.setattr(stem_pallas, "fused_stem", count("stem", real_stem))
    monkeypatch.setattr(layer1_pallas, "fused_layer1", count("layer1", real_l1))
    monkeypatch.setattr(res_stage_pallas, "fused_res_stage",
                        count("stage", real_stage))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32))
    model = ResNetBase(num_layers=50, dtype=jnp.float32, frozen_stages=3,
                       conv1_fused=True, layer1_fused=True, stages_fused=23,
                       stem_interpret=True)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    model.apply({"params": params}, x)
    assert calls["stem"] >= 1, "fused stem never invoked"
    assert calls["layer1"] >= 1, "fused layer1 never invoked"
    assert calls["stage"] >= 2, "fused layer2+layer3 never invoked"

    # ...and the gates really disable them: CPU backend without interpret
    calls.update(stem=0, layer1=0, stage=0)
    gated = ResNetBase(num_layers=50, dtype=jnp.float32, frozen_stages=3,
                       conv1_fused=True, layer1_fused=True, stages_fused=23)
    gated.apply({"params": params}, x)
    assert calls == {"stem": 0, "layer1": 0, "stage": 0}
