"""Numerical guards.

The reference has no sanitizers — its CUDA kernels lean on atomicAdd and
print-and-continue CUDA_CHECK macros (SURVEY.md §5). XLA is race-free by
construction; the useful guard on TPU is NaN/Inf detection on losses and
gradients, which these helpers provide without leaving the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def finite_mask(tree) -> jnp.ndarray:
    """Scalar bool: every leaf of the pytree is finite."""
    leaves = jax.tree_util.tree_leaves(tree)
    ok = jnp.bool_(True)
    for leaf in leaves:
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            ok = ok & jnp.isfinite(leaf).all()
    return ok


def skip_nonfinite_update(params, new_params, grads,
                          opt_state=None, new_opt_state=None):
    """Fixed-shape 'skip bad step' policy usable inside jit.

    Returns new_params if grads are finite, else the old params. Pass the
    optimizer states too (returns a (params, opt_state) pair then): a
    momentum/Adam state that already ingested an Inf gradient stays poisoned
    forever if only the params roll back.
    """
    ok = finite_mask(grads)
    keep = lambda old, new: jax.tree_util.tree_map(
        lambda o, n: jnp.where(ok, n, o), old, new)
    if opt_state is None:
        return keep(params, new_params)
    return keep(params, new_params), keep(opt_state, new_opt_state)


def assert_finite(tree, name: str = "tree"):
    """checkify-style hard assert (debug/eager use)."""
    from jax.experimental import checkify

    def f(t):
        for i, leaf in enumerate(jax.tree_util.tree_leaves(t)):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                checkify.check(jnp.isfinite(leaf).all(), f"non-finite in {name}[{i}]")
        return 0

    err, _ = checkify.checkify(f)(tree)
    err.throw()


def loss_is_exploding(loss, threshold: float = 1e8):
    return ~jnp.isfinite(loss) | (jnp.abs(loss) > threshold)
