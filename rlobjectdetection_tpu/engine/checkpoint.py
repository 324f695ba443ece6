"""Checkpoint / resume via orbax.

Rebuild of the reference's torch .pth checkpointing with the same payload
fields: base detector saves {session, epoch, model, optimizer, pooling_mode,
class_agnostic} per epoch (RCNN_bases/trainval_net.py:374-394) and restores
optimizer state + LR + pooling mode on resume (l.278-290; test restores
pooling_mode, test_net.py:171-172). RL saves {epoch, state_dict}
(trainval_net.py:159-172).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def _to_local(tree):
    """Make a multi-host-replicated tree saveable from a single process: a
    replicated global array's local shard IS the full value. (Train-state
    params/opt_state are always replicated here — parallel/mesh.py.)"""

    def fix(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return x

    return jax.tree_util.tree_map(fix, tree)


def save_checkpoint(path: str, state, *, session: int = 1, epoch: int = 0,
                    pooling_mode: str = "align", class_agnostic: bool = False,
                    extra: dict | None = None):
    """Save a train state (orbax pytree dir) + sidecar meta.json; path is a
    directory.

    Multi-process runs: EVERY process must call this — orbax's save
    synchronizes all hosts (a rank-0-only call deadlocks at its first global
    barrier), and replicated global arrays are passed through so orbax writes
    each from its primary replica. meta.json is written by process 0 only.
    """
    import json

    ocp = _ocp()
    path = os.path.abspath(path)
    conv = (lambda t: t) if jax.process_count() > 1 else _to_local
    payload = {
        "params": conv(state.params),
        "opt_state": conv(state.opt_state),
        "step": np.asarray(_to_local(state.step)),
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    if jax.process_index() == 0:
        meta = {
            "session": session,
            "epoch": epoch,
            "pooling_mode": pooling_mode,
            "class_agnostic": class_agnostic,
            **(extra or {}),
        }
        tmp = os.path.join(path, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "meta.json"))
    if jax.process_count() > 1:
        # orbax's save barrier releases every process BEFORE process 0 writes
        # the sidecar above — a rank!=0 process that proceeds straight to
        # load_checkpoint can observe the orbax tree without meta.json. Hold
        # save_checkpoint's return until the sidecar exists everywhere.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("save_checkpoint:meta")
    return path


def _load_meta(path: str) -> dict:
    import json

    mp = os.path.join(path, "meta.json")
    if os.path.exists(mp):
        with open(mp) as f:
            return json.load(f)
    return {}


def _numpy_restore_args(ckptr, path):
    """RestoreArgs tree forcing every leaf to plain numpy — fully
    topology-agnostic (no sharding reconstruction at all)."""
    ocp = _ocp()
    tree = ckptr.metadata(path).item_metadata.tree
    return jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree,
        is_leaf=lambda x: not isinstance(x, (dict, list, tuple)))


def load_checkpoint(path: str, state=None):
    """Load a checkpoint; if `state` is given, restores into its structure
    (shapes/dtypes/pytree node types preserved — needed for opt_state tuples).
    Returns (state_or_tree, meta).

    Topology-portable by construction, matching the reference's
    train-multi-GPU → test-single-GPU workflow (a torch state dict carries no
    topology: RCNN_bases/trainval_net.py:374-394 save, test_net.py:169-172
    load). With `state`, restore targets are the CURRENT arrays' shardings
    (construct_restore_args), so a checkpoint written under an 8-device mesh
    restores cleanly in a 1-device process and vice versa — never orbax's
    "unsafe" checkpoint-sharding-file fallback. Without `state`, every leaf is
    restored as plain numpy (no sharding reconstruction at all)."""
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    meta = _load_meta(path)
    if state is not None:
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        restore_args = ocp.checkpoint_utils.construct_restore_args(template)
        restored = ckptr.restore(path, item=template, restore_args=restore_args)
        new_state = state._replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"]),
        )
        return new_state, meta
    restored = ckptr.restore(path, restore_args=_numpy_restore_args(ckptr, path))
    return restored, meta


def save_params(path: str, params):
    ocp = _ocp()
    ocp.PyTreeCheckpointer().save(os.path.abspath(path), {"params": params}, force=True)


def load_params(path: str):
    ocp = _ocp()
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    return ckptr.restore(
        path, restore_args=_numpy_restore_args(ckptr, path))["params"]


def save_net_npz(path: str, params):
    """Flat-array param dump — the h5 save_net/load_net equivalent
    (net_utils.py:13-24), using npz instead of hdf5."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {
        "/".join(p.key for p in kp): np.asarray(v) for kp, v in flat
    }
    np.savez(path, **arrays)


def load_net_npz(path: str, params):
    """Restore a flat npz dump into an existing param tree structure."""
    import jax

    data = np.load(path)

    def rebuild(kp, v):
        key = "/".join(p.key for p in kp)
        if key in data.files:
            arr = data[key]
            assert arr.shape == v.shape, f"{key}: {arr.shape} vs {v.shape}"
            return arr.astype(np.asarray(v).dtype)
        return v

    return jax.tree_util.tree_map_with_path(rebuild, params)
