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


def skip_nonfinite_update(params, new_params, grads):
    """Return new_params if grads are finite, else keep old params — a
    fixed-shape 'skip bad step' policy usable inside jit."""
    ok = finite_mask(grads)
    return jax.tree_util.tree_map(
        lambda old, new: jnp.where(ok, new, old), params, new_params
    )


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
