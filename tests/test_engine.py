"""Engine tests: optimizer param groups, LR schedule, checkpoint roundtrip,
npz dump, weight conversion merge."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from rlobjectdetection_tpu.engine.optim import build_optimizer, count_trainable, make_lr_schedule, param_labels


def _fake_resnet_params():
    k = lambda *s: jnp.ones(s, jnp.float32)
    return {
        "base": {
            "conv1": {"kernel": k(7, 7, 3, 64)},
            "bn1": {"scale": k(64), "bias": k(64), "mean": k(64), "var": k(64)},
            "layer1": {"block0": {"conv1": {"kernel": k(1, 1, 64, 64)},
                                  "bn1": {"scale": k(64), "bias": k(64),
                                          "mean": k(64), "var": k(64)}}},
            "layer2": {"block0": {"conv1": {"kernel": k(1, 1, 64, 128)}}},
        },
        "head": {"layer4": {"block0": {"conv1": {"kernel": k(1, 1, 128, 512)},
                                       "bn1": {"scale": k(512), "bias": k(512),
                                               "mean": k(512), "var": k(512)}}}},
        "rpn": {"RPN_Conv": {"kernel": k(3, 3, 128, 512), "bias": k(512)}},
        "RCNN_cls_score": {"kernel": k(512, 4), "bias": k(4)},
    }


def test_param_labels_resnet():
    params = _fake_resnet_params()
    labels = param_labels(params, "resnet101", fixed_blocks=1)
    # conv1 + bn1 + layer1 frozen (FIXED_BLOCKS=1, resnet.py:250-259)
    assert labels["base"]["conv1"]["kernel"] == "frozen"
    assert labels["base"]["bn1"]["scale"] == "frozen"
    assert labels["base"]["layer1"]["block0"]["conv1"]["kernel"] == "frozen"
    # layer2 trainable
    assert labels["base"]["layer2"]["block0"]["conv1"]["kernel"] == "weight"
    # head layer4 conv trainable, its BN frozen
    assert labels["head"]["layer4"]["block0"]["conv1"]["kernel"] == "weight"
    assert labels["head"]["layer4"]["block0"]["bn1"]["scale"] == "frozen"
    # rpn: kernel=weight, bias=bias (double-LR group)
    assert labels["rpn"]["RPN_Conv"]["kernel"] == "weight"
    assert labels["rpn"]["RPN_Conv"]["bias"] == "bias"
    counts = count_trainable(labels)
    assert counts["frozen"] == 14 and counts["bias"] == 2


def test_optimizer_bias_double_lr_and_frozen():
    params = {"w": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
              "base": {"conv1": {"kernel": jnp.ones((3, 3))}}}
    tx, labels = build_optimizer(params, "resnet101", base_lr=0.1,
                                 momentum=0.0, weight_decay=0.0)
    assert labels["base"]["conv1"]["kernel"] == "frozen"
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]["kernel"]), -0.1, rtol=1e-6)
    # DOUBLE_BIAS: bias LR is 2× (RCNN_bases/trainval_net.py:268-270)
    np.testing.assert_allclose(np.asarray(updates["w"]["bias"]), -0.2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["base"]["conv1"]["kernel"]), 0.0)


def test_lr_schedule_step_decay():
    sched = make_lr_schedule(0.01, decay_step_iters=100, gamma=0.1)
    assert sched(0) == 0.01
    assert sched(99) == 0.01
    assert abs(sched(100) - 0.001) < 1e-12
    assert abs(sched(250) - 0.0001) < 1e-12


def test_checkpoint_roundtrip(tmp_path):
    from rlobjectdetection_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
    from rlobjectdetection_tpu.engine.train import TrainState

    params = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    tx = optax.sgd(0.1, momentum=0.9)
    state = TrainState(params, tx.init(params), jnp.int32(7))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, session=2, epoch=5, pooling_mode="crop",
                    class_agnostic=True)
    state2, meta = load_checkpoint(path, state)
    np.testing.assert_array_equal(np.asarray(state2.params["a"]),
                                  np.asarray(params["a"]))
    assert int(state2.step) == 7
    assert meta["epoch"] == 5
    assert meta["pooling_mode"] == "crop"
    assert meta["class_agnostic"] is True


def _flat_expected(state):
    flat = jax.tree_util.tree_flatten_with_path(
        {"params": state.params, "opt_state": state.opt_state})[0]
    out = {jax.tree_util.keystr(kp): np.asarray(v) for kp, v in flat}
    out["step"] = np.asarray(state.step)
    return out


def test_checkpoint_cross_topology_8_to_1(tmp_path):
    """A checkpoint saved under the 8-device mesh restores bit-exactly in a
    fresh ONE-device process, with no orbax unsafe-sharding-fallback warning —
    the reference's train-multi-GPU → test-single-GPU workflow
    (RCNN_bases/test_net.py:169-172)."""
    import subprocess
    import sys as _sys

    import optax
    from rlobjectdetection_tpu.engine.checkpoint import save_checkpoint
    from rlobjectdetection_tpu.engine.train import TrainState
    from rlobjectdetection_tpu.parallel import make_mesh, replicate

    mesh = make_mesh(8)
    params = {"w": jnp.arange(32, dtype=jnp.float32).reshape(4, 8) * 1.5,
              "b": jnp.arange(16, dtype=jnp.float32) - 3.0}
    tx = optax.sgd(0.1, momentum=0.9)
    opt = tx.init(params)
    # non-trivial momentum trace so opt_state equality is meaningful
    upd, opt = tx.update(jax.tree_util.tree_map(lambda x: x * 0.1, params), opt, params)
    state = TrainState(replicate(mesh, params), replicate(mesh, opt), jnp.int32(42))
    path = str(tmp_path / "ckpt8")
    save_checkpoint(path, state, epoch=3)
    exp = str(tmp_path / "expected.npz")
    np.savez(exp, **_flat_expected(state))

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run(
        [_sys.executable, os.path.join(os.path.dirname(__file__), "topo_worker.py"),
         path, exp],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    assert "CROSS_TOPO_OK" in r.stdout, r.stdout


def test_checkpoint_cross_topology_1_to_8(tmp_path):
    """The reverse direction: a checkpoint whose arrays were saved with
    single-device sharding restores into an 8-device-mesh-replicated template,
    bit-exact, landing on all 8 devices."""
    import warnings

    import optax
    from rlobjectdetection_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
    from rlobjectdetection_tpu.engine.train import TrainState
    from rlobjectdetection_tpu.parallel import make_mesh, replicate

    params = {"w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4) + 0.25}
    tx = optax.sgd(0.1, momentum=0.9)
    dev0 = jax.devices()[0]
    one_dev = jax.tree_util.tree_map(lambda x: jax.device_put(x, dev0), params)
    state1 = TrainState(one_dev, jax.tree_util.tree_map(
        lambda x: jax.device_put(x, dev0), tx.init(params)), jnp.int32(7))
    path = str(tmp_path / "ckpt1")
    save_checkpoint(path, state1, epoch=1)

    mesh = make_mesh(8)
    template = TrainState(
        replicate(mesh, jax.tree_util.tree_map(jnp.zeros_like, params)),
        replicate(mesh, tx.init(params)), jnp.int32(0))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        state8, meta = load_checkpoint(path, template)
    assert not [w for w in caught if "harding" in str(w.message)], caught
    np.testing.assert_array_equal(np.asarray(state8.params["w"]), np.asarray(params["w"]))
    assert int(state8.step) == 7 and meta["epoch"] == 1
    assert len(state8.params["w"].sharding.device_set) == 8


def test_npz_dump_roundtrip(tmp_path):
    from rlobjectdetection_tpu.engine.checkpoint import load_net_npz, save_net_npz

    params = {"m": {"kernel": jnp.ones((2, 2)) * 3, "bias": jnp.zeros((2,))}}
    path = str(tmp_path / "net.npz")
    save_net_npz(path, params)
    blank = jax.tree_util.tree_map(jnp.zeros_like, params)
    restored = load_net_npz(path, blank)
    np.testing.assert_allclose(np.asarray(restored["m"]["kernel"]), 3.0)


def test_merge_pretrained_partial():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.convert_torch_weights import merge_pretrained

    params = {
        "base": {"conv1": {"kernel": np.zeros((7, 7, 3, 64), np.float32)}},
        "rpn": {"RPN_Conv": {"kernel": np.zeros((3, 3, 64, 512), np.float32)}},
    }
    pretrained = {
        "base": {"conv1": {"kernel": np.ones((7, 7, 3, 64), np.float32)}},
        "extra": {"x": np.ones((1,))},                      # missing in dst
        "rpn": {"RPN_Conv": {"kernel": np.ones((9, 9), np.float32)}},  # bad shape
    }
    out = merge_pretrained(params, pretrained)
    assert (np.asarray(out["base"]["conv1"]["kernel"]) == 1).all()
    assert (np.asarray(out["rpn"]["RPN_Conv"]["kernel"]) == 0).all()


def test_create_train_state_and_forward_fn():
    """Engine API surface: create_train_state + make_forward_fn round trip."""
    import dataclasses

    import jax.numpy as jnp

    from rlobjectdetection_tpu.config import Config, TestConfig, TrainConfig
    from rlobjectdetection_tpu.engine.train import create_train_state, make_forward_fn
    from rlobjectdetection_tpu.models import FasterRCNN

    cfg = Config(TRAIN=TrainConfig(RPN_PRE_NMS_TOP_N=64, RPN_POST_NMS_TOP_N=16,
                                   BATCH_SIZE=8),
                 TEST=TestConfig(RPN_PRE_NMS_TOP_N=64, RPN_POST_NMS_TOP_N=16),
                 DTYPE="float32", NMS_TILE=64, ANCHOR_SCALES=(2, 3, 5))
    model = FasterRCNN(num_classes=4, backbone="tiny", cfg=cfg)
    batch = {
        "data": np.zeros((1, 64, 64, 3), np.float32),
        "im_info": np.array([[64.0, 64.0, 1.0]], np.float32),
        "gt_boxes": np.array([[[4, 4, 40, 40, 1]]], np.float32),
        "num_boxes": np.array([1], np.int32),
    }
    tx = optax.sgd(0.01)
    state = create_train_state(model, tx, batch)
    assert int(state.step) == 0
    fwd = make_forward_fn(model)
    out = fwd(state.params, jnp.asarray(batch["data"]), jnp.asarray(batch["im_info"]))
    assert out["rois"].shape == (1, 16, 5)


def test_aot_executable_cache(tmp_path):
    """AotExecutableCache: persisted executables serve fresh wrappers (the
    restarted-process path) without recompiling; content-addressed keys give
    distinct shapes distinct executables; outputs match the plain jit call."""
    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.engine import AotExecutableCache

    @jax.jit
    def f(x, y):
        return x @ y + 1.0

    x, y = jnp.ones((8, 8)), jnp.full((8, 8), 2.0)
    c1 = AotExecutableCache(f, str(tmp_path))
    np.testing.assert_array_equal(np.asarray(c1(x, y)), np.asarray(f(x, y)))
    assert c1.stats == {"compiles": 1, "loads": 0, "hits": 0}
    assert list(tmp_path.glob("*.aotx")), "executable not persisted"

    # same shapes again: in-memory hit, no second executable
    c1(x, y)
    assert c1.stats["hits"] == 1 and c1.stats["compiles"] == 1

    # a fresh wrapper (= a restarted process) deserializes instead of compiling
    c2 = AotExecutableCache(f, str(tmp_path))
    np.testing.assert_array_equal(np.asarray(c2(x, y)), np.asarray(f(x, y)))
    assert c2.stats == {"compiles": 0, "loads": 1, "hits": 0}

    # a different input shape is a different executable
    x2 = jnp.ones((4, 8))
    np.testing.assert_array_equal(np.asarray(c2(x2, y)), np.asarray(f(x2, y)))
    assert c2.stats["compiles"] == 1
    assert len(list(tmp_path.glob("*.aotx"))) == 2


def test_aot_executable_cache_meta_and_key_material(tmp_path):
    """The compile-time XLA flop count rides in the blob (bench.py MFU on the
    deserialize path), and key_material replaces StableHLO-text hashing for
    programs with huge baked-in constants (export replay, VERDICT r4 #8)."""
    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.engine import AotExecutableCache

    @jax.jit
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((16, 16))
    c1 = AotExecutableCache(f, str(tmp_path))
    _, meta1 = c1.get_with_meta((x,))
    assert c1.stats["compiles"] == 1
    assert meta1.get("flops") and meta1["flops"] > 0

    # fresh wrapper: meta (incl. flops) must survive the disk roundtrip
    c2 = AotExecutableCache(f, str(tmp_path))
    comp, meta2 = c2.get_with_meta((x,))
    assert c2.stats == {"compiles": 0, "loads": 1, "hits": 0}
    assert meta2.get("flops") == meta1["flops"]
    np.testing.assert_allclose(np.asarray(comp(x)), np.asarray(f(x)))

    # key_material keying: same key + same shapes -> disk hit in a fresh
    # wrapper; a different key is a different entry (no false sharing)
    k1 = AotExecutableCache(f, str(tmp_path), key_material="artifact-A")
    k1(x)
    assert k1.stats["compiles"] == 1
    k2 = AotExecutableCache(f, str(tmp_path), key_material="artifact-A")
    np.testing.assert_allclose(np.asarray(k2(x)), np.asarray(f(x)))
    assert k2.stats == {"compiles": 0, "loads": 1, "hits": 0}
    k3 = AotExecutableCache(f, str(tmp_path), key_material="artifact-B")
    k3(x)
    assert k3.stats["compiles"] == 1


def test_aot_executable_cache_under_mesh(tmp_path):
    """The trainer wraps a step whose inputs are sharded over the data mesh
    (tools/trainval_net.py --aot_cache): the deserialized executable must
    replay the original multi-device assignment and produce identical
    results for sharded inputs in a fresh wrapper."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rlobjectdetection_tpu.engine import AotExecutableCache
    from rlobjectdetection_tpu.parallel import make_mesh

    mesh = make_mesh(8)

    @jax.jit
    def step(w, x):
        return jnp.tanh(x @ w).sum(axis=1)

    with mesh:
        x = jax.device_put(
            np.arange(16 * 4, dtype=np.float32).reshape(16, 4) / 10,
            NamedSharding(mesh, P("data")))
        w = jax.device_put(np.full((4, 4), 0.5, np.float32),
                           NamedSharding(mesh, P()))
        want = np.asarray(step(w, x))

        c1 = AotExecutableCache(step, str(tmp_path))
        np.testing.assert_array_equal(np.asarray(c1(w, x)), want)
        assert c1.stats["compiles"] == 1

        c2 = AotExecutableCache(step, str(tmp_path))
        out = c2(w, x)
        assert c2.stats == {"compiles": 0, "loads": 1, "hits": 0}
        np.testing.assert_array_equal(np.asarray(out), want)
        # the loaded executable still runs sharded, not gathered to one device
        assert len(out.sharding.device_set) == 8
