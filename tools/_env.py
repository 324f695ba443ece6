"""Shared CLI bootstrap: honor RLOD_FORCE_CPU / RLOD_PLATFORM before jax use.

The axon TPU plugin preselects itself regardless of the JAX_PLATFORMS env var,
so the platform must be forced through jax.config.
"""

import os


def setup_platform():
    import jax

    want = os.environ.get("RLOD_PLATFORM")
    if os.environ.get("RLOD_FORCE_CPU") == "1":
        want = "cpu"
    if want:
        jax.config.update("jax_platforms", want)
