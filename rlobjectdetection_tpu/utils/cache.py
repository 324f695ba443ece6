"""Host-fingerprinted persistent JAX compile cache.

The persistent compile cache (`jax_compilation_cache_dir`) keys entries by the
computation + compile options, but XLA:CPU executables embed host-ISA-specific
code: an entry compiled on one host generation loaded on another triggers the
XLA "machine type ... doesn't match ... could lead to execution errors such as
SIGILL" warning and a per-feature-set recompile (measured: the 8-device dryrun
degrades 2.5 min -> ~13 min on stale-generation entries — CLAUDE.md). Keying
the cache *directory* by a host-feature hash makes entries from a different
host generation invisible instead of poisonous.

The reference has no analogue (eager CUDA, no compile cache); this is
TPU/XLA-rebuild infrastructure.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """12-hex-char digest of the host CPU feature set + jax version."""
    try:
        with open("/proc/cpuinfo") as f:
            feats = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        feats = platform.processor() or platform.machine()
    try:
        import jax

        ver = jax.__version__
    except Exception:  # pragma: no cover - jax is always present in practice
        ver = "nojax"
    return hashlib.sha1(f"{feats}|{ver}".encode()).hexdigest()[:12]


def host_cache_dir(base: str = "/tmp/jax_cache") -> str:
    return f"{base}-{host_fingerprint()}"


def enable_persistent_cache(min_compile_secs: int = 5) -> str | None:
    """Point jax at the host-keyed persistent cache dir (idempotent).

    Returns the directory used, or None if the backend was already
    initialized with different settings (config updates raise then).
    """
    import jax

    path = host_cache_dir()
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    except Exception:
        return None
    return path
