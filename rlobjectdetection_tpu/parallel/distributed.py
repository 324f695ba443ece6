"""Multi-host initialization.

The reference's only multi-node traces are an unused DistributedSampler import
and a SLURM rank filter (SURVEY.md §2.6). The TPU-native story: call
`initialize()` once per host before any jax op; the global mesh from
parallel.mesh then spans all hosts' devices (ICI within a slice, DCN across),
and the SAME jitted train step code runs unchanged — each host feeds its local
shard of the global batch (`host_local_batch_slice`).
"""

from __future__ import annotations

import os


_MULTIHOST_ENV_HINTS = (
    "SLURM_PROCID", "OMPI_COMM_WORLD_RANK", "PMI_RANK",
    "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
)


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """jax.distributed.initialize with env auto-detection; True if initialized.

    With no explicit args, any recognized multi-host launcher env (SLURM,
    OMPI/mpirun, PMI, an explicit coordinator address) triggers JAX's own
    auto-detecting initialize — silently running N independent single-host
    jobs is the one unacceptable outcome. A plain single-process launch
    (no hints) is a no-op.
    """
    import jax

    if coordinator_address is None and num_processes is None:
        if not any(v in os.environ for v in _MULTIHOST_ENV_HINTS):
            return False  # single-process
        jax.distributed.initialize()   # auto-detect from the launcher env
        return True
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def host_local_batch_slice(global_batch_size: int):
    """(start, size) of this host's slice of the global batch."""
    import jax

    n = jax.process_count()
    i = jax.process_index()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} hosts — the remainder would be silently dropped")
    per = global_batch_size // n
    return i * per, per


def make_global_array(mesh, local_arrays, axis: str = "data"):
    """Assemble per-host local shards into one globally-sharded jax.Array."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_arrays)


def fetch_scalar(x) -> float:
    """float(x) that also works on multi-host replicated outputs (which are
    not fully addressable, so plain float() would raise)."""
    import jax
    import numpy as np

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return float(np.asarray(x.addressable_data(0)))
    return float(x)


def shard_global_batch(mesh, batch: dict, axis: str = "data") -> dict:
    """Shard a GLOBAL batch over a (possibly multi-host) mesh.

    Every host materializes the same global batch (the loaders are seeded
    identically); each contributes only its own slice of the leading dim.
    Single-process falls back to a plain sharded device_put. NOTE: host-side
    assembly cost scales with the GLOBAL batch here — the sliced input
    pipeline (data/loader.py::HostShardLoader + shard_local_batch) assembles
    only the local rows and is what tools/trainval_net.py uses multi-host.
    """
    import jax
    import numpy as np

    if jax.process_count() == 1:
        from .mesh import shard_batch

        return shard_batch(mesh, batch, axis)

    def one(x):
        x = np.asarray(x)
        start, size = host_local_batch_slice(x.shape[0])
        return make_global_array(mesh, x[start:start + size], axis)

    return jax.tree_util.tree_map(one, batch)


def shard_local_batch(mesh, batch: dict, axis: str = "data") -> dict:
    """Assemble per-host LOCAL batch slices into the global sharded batch.

    The counterpart of shard_global_batch for the sliced input pipeline:
    each host decoded only its own rows (HostShardLoader), so host decode
    cost scales at 1/N hosts. All hosts' slices must be shape-consistent
    (HostShardLoader's predicted canvas guarantees it). Single-process:
    the 'local' batch IS the global batch — plain sharded device_put.
    """
    import jax

    if jax.process_count() == 1:
        from .mesh import shard_batch

        return shard_batch(mesh, batch, axis)
    import numpy as np

    return jax.tree_util.tree_map(
        lambda x: make_global_array(mesh, np.asarray(x), axis), batch)
