"""NaN-guard tests."""

import numpy as np
import jax
import jax.numpy as jnp

from rlobjectdetection_tpu.utils.guards import finite_mask, loss_is_exploding, skip_nonfinite_update


def test_finite_mask():
    ok = {"a": jnp.ones((3,)), "b": jnp.zeros((2, 2))}
    bad = {"a": jnp.ones((3,)), "b": jnp.array([1.0, np.nan])}
    assert bool(finite_mask(ok))
    assert not bool(finite_mask(bad))
    # integer leaves are ignored
    mixed = {"i": jnp.arange(3), "f": jnp.ones((2,))}
    assert bool(finite_mask(mixed))


def test_skip_nonfinite_update():
    old = {"w": jnp.zeros((2,))}
    new = {"w": jnp.ones((2,))}
    good_g = {"w": jnp.ones((2,))}
    bad_g = {"w": jnp.array([1.0, np.inf])}
    np.testing.assert_allclose(
        np.asarray(skip_nonfinite_update(old, new, good_g)["w"]), 1.0
    )
    np.testing.assert_allclose(
        np.asarray(skip_nonfinite_update(old, new, bad_g)["w"]), 0.0
    )


def test_train_step_skips_nonfinite():
    """A step with NaN-producing inputs must leave params unchanged when
    skip_nonfinite is on (uses the RL net: small + deterministic)."""
    import optax

    from rlobjectdetection_tpu.models.rl import RLPolicyNet

    model = RLPolicyNet(num_acts=4, num_layers=50)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    bboxes = np.zeros((1, 2, 8), dtype=np.float32)
    bboxes[..., 1:5] = [4, 4, 40, 40]
    targets = jnp.ones((1, 2, 4), jnp.float32)
    weights = jnp.ones((1, 2, 4), jnp.float32)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, img, jnp.asarray(bboxes), targets, weights
    )["params"]
    tx = optax.sgd(0.1)
    opt_state = tx.init(params)

    from rlobjectdetection_tpu.utils.guards import finite_mask, skip_nonfinite_update

    @jax.jit
    def step(params, opt_state, img):
        def loss_fn(p):
            _, loss, _ = model.apply({"params": p}, img, jnp.asarray(bboxes),
                                     targets, weights)
            return loss

        grads = jax.grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = skip_nonfinite_update(params, new_params, grads)
        return new_params, opt_state2

    bad_img = img.at[0, 0, 0, 0].set(jnp.nan)
    p2, _ = step(params, opt_state, bad_img)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and a good step does change params
    p3, _ = step(params, opt_state, img)
    changed = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p3))
    )
    assert changed


def test_loss_is_exploding():
    assert bool(loss_is_exploding(jnp.float32(np.nan)))
    assert bool(loss_is_exploding(jnp.float32(1e12)))
    assert not bool(loss_is_exploding(jnp.float32(3.5)))
