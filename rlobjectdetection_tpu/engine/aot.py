"""Per-shape AOT executable cache: skip XLA recompiles across process restarts.

The reference framework has no compile step to amortize (eager CUDA); here a
fresh TPU process pays the full XLA train-step compile before its first step
(historically 5-7 min over the tunneled backend; DESIGN.md "Attacking the
per-process compile tax" measured `jax.experimental.serialize_executable`
round-tripping the compiled step in ~1.5 s save / ~1.3 s load). This module
turns that measurement into a trainer feature (`trainval_net.py --aot_cache`).

Cache keying is content-addressed: the lowered StableHLO text is hashed
together with the jax version, backend, device kind and device count, so a
code change, a different chip, or a different mesh never loads a stale
executable. Each distinct input-shape signature (the loader's quantized
padded shapes yield a bounded bucket set — DESIGN.md "Eval-path compile
buckets") gets its own executable, lazily lowered on first sight.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile

import jax


def _shape_sig(tree) -> tuple:
    return tuple(
        (getattr(x, "shape", ()), str(getattr(x, "dtype", type(x))))
        for x in jax.tree_util.tree_leaves(tree)
    )


class AotExecutableCache:
    """Wrap a jitted function; calls dispatch to deserialized-or-compiled
    executables persisted under `cache_dir`.

    stats counts engagement (tests/test_engine.py): "compiles" = built by XLA
    this process, "loads" = deserialized from disk, "hits" = in-memory reuse.
    """

    def __init__(self, fn, cache_dir: str, key_material: str | None = None):
        self.fn = fn
        self.dir = os.path.abspath(cache_dir)
        os.makedirs(self.dir, exist_ok=True)
        self._compiled = {}
        self._meta = {}
        self.key_material = key_material
        self.stats = {"compiles": 0, "loads": 0, "hits": 0}

    def _get(self, args):
        sig = _shape_sig(args)
        comp = self._compiled.get(sig)
        if comp is not None:
            self.stats["hits"] += 1
            return comp
        # Default keying is content-addressed on the lowered StableHLO text.
        # A caller whose program embeds huge constants (the export artifact
        # bakes the weights in) passes key_material instead — hashing and even
        # lowering are then skipped on a disk hit.
        if self.key_material is not None:
            lowered, base = None, self.key_material + repr(sig)
        else:
            lowered = self.fn.lower(*args)
            base = lowered.as_text()
        dev = jax.devices()[0]
        key = hashlib.sha256(
            "\0".join((
                base, jax.__version__, jax.default_backend(),
                getattr(dev, "device_kind", "?"), str(jax.device_count()),
            )).encode()
        ).hexdigest()[:32]
        path = os.path.join(self.dir, f"{key}.aotx")
        if os.path.exists(path):
            from jax.experimental.serialize_executable import (
                deserialize_and_load)

            with open(path, "rb") as f:
                rec = pickle.loads(f.read())
            # v1 blobs have 4 fields; v2 appends a meta dict (XLA flops etc.
            # — cost_analysis is unavailable on deserialized executables)
            payload, in_tree_b, out_tree_b, dev_ids = rec[:4]
            meta = rec[4] if len(rec) > 4 else {}
            # deserialize_and_load defaults execution_devices to ALL backend
            # devices; an executable compiled for a subset (single-device jit
            # on a multi-device host) must replay its original assignment
            id2dev = {d.id: d for d in jax.devices()}
            comp = deserialize_and_load(
                payload, pickle.loads(in_tree_b), pickle.loads(out_tree_b),
                execution_devices=[id2dev[i] for i in dev_ids])
            self.stats["loads"] += 1
        else:
            from jax.experimental.serialize_executable import serialize

            if lowered is None:
                lowered = self.fn.lower(*args)
            comp = lowered.compile()
            meta = {"flops": _xla_flops(comp)}
            payload, in_tree, out_tree = serialize(comp)
            dev_ids = [d.id for d in comp.runtime_executable().local_devices()]
            blob = pickle.dumps(
                (payload, pickle.dumps(in_tree), pickle.dumps(out_tree),
                 dev_ids, meta))
            # atomic publish: concurrent processes (multi-host launch) race
            # benignly — last rename wins with identical content
            fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
            self.stats["compiles"] += 1
        self._compiled[sig] = comp
        self._meta[sig] = meta
        return comp

    def get_with_meta(self, args):
        """(compiled, meta) for this arg-shape signature; meta carries the
        compile-time XLA cost analysis ("flops") even when the executable
        itself was deserialized from disk."""
        comp = self._get(args)
        return comp, self._meta.get(_shape_sig(args), {})

    def __call__(self, *args):
        return self._get(args)(*args)


def _xla_flops(compiled):
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None
