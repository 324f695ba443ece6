"""Fused Pallas kernels under multi-device data-parallel meshes.

Round-2 gated the fused stem/layer1/stage kernels to single-device because a
`pallas_call` has no GSPMD partitioning rule; ops/batch_partition.py registers
one (batch dim sharded, everything else replicated). These tests pin, on the
forced 8-device CPU mesh in interpret mode:

  * bitwise parity of the sharded fused kernel vs the unsharded call;
  * that the compiled program does NOT all-gather the batch (the rule
    partitions instead of replicating);
  * that the fused paths actually ENGAGE inside ResNetBase under a jit over
    the mesh (engagement counters — drop-in equality alone can't see a path
    silently turning itself off, the round-2 failure mode);
  * end-to-end ResNetBase fused == plain under the mesh;
  * the forward-only contract still raises through the partitioned path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rlobjectdetection_tpu.ops.stem_pallas import fused_stem
from tests.test_stem_pallas import _random_inputs, xla_stem

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the forced 8-device CPU mesh")


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("data",))


def test_fused_stem_sharded_matches_unsharded():
    rng = np.random.RandomState(5)
    x, *params = _random_inputs(rng, 8, 37, 45)
    kw = dict(out_dtype=jnp.float32, compute_dtype=jnp.float32, tile_rows=4,
              interpret=True)

    ref = np.asarray(fused_stem(x, *params, **kw))

    mesh = _mesh()
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ps = [jax.device_put(p, NamedSharding(mesh, P())) for p in params]
    fn = jax.jit(lambda x, *p: fused_stem(x, *p, **kw))
    out = fn(xs, *ps)
    assert out.sharding.spec == P("data"), (
        "output lost its batch sharding — the partitioning rule did not apply")
    # measured: the per-image kernel math is bitwise batch-invariant (eager
    # b=8 == per-image b=1 exactly); the residual ~2e-6 here is jit-context
    # fma/reassociation in XLA's CPU lowering, not a sharding artifact
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
    # numerics vs the XLA composition too (not just self-consistency)
    np.testing.assert_allclose(ref, np.asarray(xla_stem(x, *params)),
                               rtol=1e-5, atol=1e-4)


def test_fused_stem_sharded_compiles_without_allgather():
    """The rule must PARTITION the batch, not replicate it: the compiled
    program may not all-gather the input."""
    rng = np.random.RandomState(6)
    x, *params = _random_inputs(rng, 8, 32, 32)
    kw = dict(out_dtype=jnp.float32, compute_dtype=jnp.float32, tile_rows=4,
              interpret=True)
    mesh = _mesh()
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    lowered = jax.jit(lambda x, *p: fused_stem(x, *p, **kw)).lower(xs, *params)
    hlo = lowered.compile().as_text()
    assert "all-gather" not in hlo, "batch was all-gathered instead of sharded"


def test_resnet_fused_engages_and_matches_under_mesh(monkeypatch):
    """ResNetBase with every fusion on, jitted over an 8-device DP mesh:
    the fused kernels ENGAGE (counters) and match the plain XLA path."""
    from rlobjectdetection_tpu.models.backbones.resnet import ResNetBase
    from rlobjectdetection_tpu.ops import layer1_pallas, res_stage_pallas, stem_pallas

    calls = {"stem": 0, "layer1": 0, "stage": 0}
    for key, mod, name in (("stem", stem_pallas, "fused_stem"),
                           ("layer1", layer1_pallas, "fused_layer1"),
                           ("stage", res_stage_pallas, "fused_res_stage")):
        real = getattr(mod, name)

        def wrapper(*a, _k=key, _real=real, **kw):
            calls[_k] += 1
            return _real(*a, **kw)

        monkeypatch.setattr(mod, name, wrapper)

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 48, 48, 3).astype(np.float32) * 5)
    plain = ResNetBase(num_layers=50, dtype=jnp.float32, frozen_stages=3)
    fused = ResNetBase(num_layers=50, dtype=jnp.float32, frozen_stages=3,
                       conv1_fused=True, layer1_fused=True, stages_fused=23,
                       stem_interpret=True)
    params = plain.init(jax.random.PRNGKey(0), x)["params"]

    mesh = _mesh()
    data_s = NamedSharding(mesh, P("data"))
    repl_s = NamedSharding(mesh, P())
    xs = jax.device_put(x, data_s)
    params_r = jax.device_put(params, repl_s)

    ref = jax.jit(lambda p, x: plain.apply({"params": p}, x))(params_r, xs)
    got = jax.jit(lambda p, x: fused.apply({"params": p}, x))(params_r, xs)
    assert calls["stem"] >= 1 and calls["layer1"] >= 1 and calls["stage"] >= 2, (
        f"fused paths did not engage under the mesh: {calls}")
    assert got.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_fused_stem_forward_only_raises_through_partitioned_path():
    rng = np.random.RandomState(3)
    x, *params = _random_inputs(rng, 8, 32, 32)
    mesh = _mesh()
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    def loss(k):
        return fused_stem(xs, k, *params[1:], out_dtype=jnp.float32,
                          compute_dtype=jnp.float32, tile_rows=4,
                          interpret=True).sum()

    with pytest.raises(NotImplementedError):
        jax.grad(loss)(params[0])
