"""Subprocess worker: restore a mesh-saved checkpoint in a 1-device process.

Proves the reference's topology-portable checkpoint workflow (train multi-GPU,
test single-GPU by loading the same .pth anywhere —
/root/reference/RCNN_bases/trainval_net.py:374-394 save, test_net.py:169-172
load) for the orbax rebuild: a checkpoint written under an 8-device mesh must
restore bit-exactly in a process that has ONE device, with no orbax
"Sharding info not provided" unsafe-fallback warning.

Usage: python tests/topo_worker.py <ckpt_dir> <expected_npz>
"""

import os
import sys
import warnings


def main():
    ckpt, expected_npz = sys.argv[1], sys.argv[2]
    os.environ["XLA_FLAGS"] = ""  # drop the parent's 8-fake-device flag
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rlobjectdetection_tpu.engine.checkpoint import load_checkpoint
    from rlobjectdetection_tpu.engine.train import TrainState

    assert len(jax.devices()) == 1, f"expected 1 device, got {len(jax.devices())}"

    params = {"w": jnp.zeros((4, 8), jnp.float32), "b": jnp.zeros((16,), jnp.float32)}
    tx = optax.sgd(0.1, momentum=0.9)
    state = TrainState(params, tx.init(params), jnp.int32(0))

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        state2, meta = load_checkpoint(ckpt, state)
    bad = [w for w in caught if "harding" in str(w.message)]
    assert not bad, f"unsafe sharding fallback warned: {bad[0].message}"

    expected = np.load(expected_npz)
    flat = jax.tree_util.tree_flatten_with_path(
        {"params": state2.params, "opt_state": state2.opt_state})[0]
    for kp, v in flat:
        key = jax.tree_util.keystr(kp)
        np.testing.assert_array_equal(np.asarray(v), expected[key], err_msg=key)
    assert int(state2.step) == int(expected["step"])
    assert meta["epoch"] == 3
    # restored arrays live on THIS process's single device
    for _, v in flat:
        assert len(v.sharding.device_set) == 1
    print("CROSS_TOPO_OK", len(flat))


if __name__ == "__main__":
    main()
