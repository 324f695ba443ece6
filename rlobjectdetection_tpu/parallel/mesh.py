"""Device mesh + sharding helpers — the SPMD replacement for nn.DataParallel.

The reference scales with single-host nn.DataParallel (replicate module,
scatter batch, gather losses — RCNN_bases/trainval_net.py:292-293) over NCCL.
TPU-native equivalent (SURVEY.md §2.6): a 1-D `jax.sharding.Mesh` over the
'data' axis; the global batch is sharded batch-wise, parameters are replicated,
and XLA emits the psum gradient all-reduce over ICI on its own when the jitted
train step consumes sharded batches with replicated params. Multi-host extends
the same mesh over DCN via jax.distributed.initialize — no code changes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    if n > len(devices):
        raise ValueError(
            f"requested a {n}-device mesh but only {len(devices)} device(s) "
            f"exist — a silently truncated mesh would break batch divisibility "
            f"far from the cause")
    return Mesh(np.array(devices[:n]), (axis,))


def make_hybrid_mesh(axis: str = "data") -> Mesh:
    """Multi-host mesh whose device order keeps each host's devices contiguous,
    so the flattened 1-D data axis reduces hierarchically: XLA's psum does the
    intra-host portion over ICI and only crosses DCN once per host pair
    (the scaling-book layout rule). Single-process: plain make_mesh."""
    if jax.process_count() == 1:
        return make_mesh(axis=axis)
    from jax.experimental import mesh_utils

    ndev = len(jax.devices())
    nproc = jax.process_count()
    try:
        dev = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(ndev // nproc,), dcn_mesh_shape=(nproc,),
        ).reshape(-1)
    except ValueError:
        # no slice topology info (e.g. multi-process CPU): process-major order
        # gives the same host-contiguous property
        dev = np.array(sorted(jax.devices(),
                              key=lambda d: (d.process_index, d.id)))
    return Mesh(dev, (axis,))


def shard_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    """Device-put each array sharded on its leading (batch) dim."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
