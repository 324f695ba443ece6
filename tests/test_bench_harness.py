"""The bench/trace shared RL step builder runs end-to-end at tiny shapes.

bench.py::make_rl_step is imported by both `bench.py --rl` and
`tools/trace_step.py --rl`; this pins that the builder's step function
trains (loss finite, trunk frozen, head updated) so refactors to the
benchmark harness cannot silently break either consumer.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import WD, make_rl_step

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_watchdog_inert_on_import():
    """Importing bench (tests/tools do) must not arm the stall watchdog —
    an armed default deadline would os._exit the whole pytest process."""
    assert WD._thread is None and WD._deadline is None


def test_watchdog_emits_diagnostic_on_stall():
    """A stalled stage produces ONE parseable JSON diagnostic on stdout and
    exit code 3 — the r4 empty-artifact failure mode is impossible by
    construction (VERDICT r4 #1)."""
    code = (
        "import time, bench\n"
        "bench.WD.metric = 'unit_test_metric'\n"
        "bench.WD.stage('fake_stall', 1)\n"
        "time.sleep(30)\n"
    )
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"},
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 3, (r.returncode, r.stderr[-500:])
    rec = json.loads(r.stdout.strip())
    assert rec["metric"] == "unit_test_metric"
    assert rec["value"] is None
    assert rec["status"] == "tunnel_stall" and rec["stage"] == "fake_stall"


def test_make_rl_step_trains_at_tiny_shape():
    step, params, opt_state, inputs = make_rl_step(
        batch_size=1, h=64, w=96, n_boxes=4,
        fused_stem=False, fused_layer1=False)
    p1, o1, loss1 = step(params, opt_state, *inputs)
    p2, _, loss2 = step(p1, o1, *inputs)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    # trunk frozen (optax.set_to_zero on "base"), head moves
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), params["base"], p2["base"]))
    assert same, "frozen trunk params changed"
    head_keys = [k for k in params if k != "base"]
    assert head_keys
    moved = any(
        not jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: jnp.array_equal(a, b), params[k], p2[k]))
        for k in head_keys)
    assert moved, "no head params updated"
