"""2-process jax.distributed localhost test (VERDICT r1 item 4): the same
deterministic global batch trained by 2 processes × 2 CPU devices must produce
the same loss and updated parameters as 1 process × 4 devices.

Runs in subprocesses because jax.distributed.initialize is per-process global
state (the suite's own jax runtime must stay untouched).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
WORKER = os.path.join(REPO, "tests", "dist_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _launch(rank, nprocs, port, ndev_local, out):
    return subprocess.Popen(
        [sys.executable, WORKER, str(rank), str(nprocs), str(port),
         str(ndev_local), out],
        cwd=REPO, env=_env(),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


def test_two_process_matches_single_process(tmp_path):
    out2 = str(tmp_path / "two_proc.json")
    out1 = str(tmp_path / "one_proc.json")

    port = _free_port()
    procs = [_launch(r, 2, port, 2, out2) for r in range(2)]
    for p in procs:
        _, err = p.communicate(timeout=560)
        assert p.returncode == 0, err[-3000:]

    p = _launch(0, 1, _free_port(), 4, out1)
    _, err = p.communicate(timeout=560)
    assert p.returncode == 0, err[-3000:]

    with open(out2) as f:
        two = json.load(f)
    with open(out1) as f:
        one = json.load(f)

    assert two["fg"] == one["fg"] and two["bg"] == one["bg"]
    assert abs(two["loss"] - one["loss"]) < 1e-4, (two["loss"], one["loss"])
    s2, s1 = np.array(two["sums"]), np.array(one["sums"])
    np.testing.assert_allclose(s2, s1, rtol=1e-4)
    # checkpoint save/restore must work under BOTH topologies (all processes
    # participate in the orbax barriers; rank-0-only saving deadlocks)
    assert two["ckpt_roundtrip"] and one["ckpt_roundtrip"]
