"""jax.export serving artifact: export → serialize → deserialize → replay
equals the live jitted function (tools/export_model.py).

The artifact is self-contained (weights baked in as constants), so this is
the deployment path: a serving runtime needs only the artifact bytes and a
matching platform, no model code."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_export_roundtrip_matches_live(tmp_path):
    import dataclasses

    from rlobjectdetection_tpu.config import Config
    from rlobjectdetection_tpu.models import FasterRCNN
    from tools.export_model import build_serving_fn

    from jax import export as jexport

    cfg = dataclasses.replace(
        Config(), DTYPE="float32", ANCHOR_SCALES=(2, 3, 5), NMS_TILE=64)
    cfg = dataclasses.replace(
        cfg, TEST=dataclasses.replace(cfg.TEST, RPN_PRE_NMS_TOP_N=128,
                                      RPN_POST_NMS_TOP_N=32))
    model = FasterRCNN(num_classes=4, backbone="tiny", cfg=cfg)
    h, w = 64, 96
    key = jax.random.PRNGKey(3)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": key, "sampling": key, "dropout": key},
        jnp.zeros((1, h, w, 3), jnp.float32),
        jnp.asarray([[float(h), float(w), 1.0]]), train=False,
    )["params"]

    serve = build_serving_fn(model, params, 4, False, 10, cfg.TEST.NMS)
    exported = jexport.export(serve)(
        jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, 3), jnp.float32))
    path = tmp_path / "m.jaxexport"
    path.write_bytes(exported.serialize())

    # replay from bytes only
    restored = jexport.deserialize(bytearray(path.read_bytes()))
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32) * 5)
    info = jnp.asarray([[float(h), float(w), 1.0]], dtype=np.float32)
    live = serve(data, info)
    replayed = restored.call(data, info)
    for k in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_array_equal(np.asarray(live[k]),
                                      np.asarray(replayed[k]), err_msg=k)


def test_batched_export_matches_per_image(tmp_path):
    """A --batch N artifact returns exactly what the one-image artifact
    returns for each member image (fixed shapes: batching is a pure
    throughput choice, not a numerics one)."""
    import dataclasses

    from rlobjectdetection_tpu.config import Config
    from rlobjectdetection_tpu.models import FasterRCNN
    from tools.export_model import build_serving_fn

    from jax import export as jexport

    cfg = dataclasses.replace(
        Config(), DTYPE="float32", ANCHOR_SCALES=(2, 3, 5), NMS_TILE=64)
    cfg = dataclasses.replace(
        cfg, TEST=dataclasses.replace(cfg.TEST, RPN_PRE_NMS_TOP_N=128,
                                      RPN_POST_NMS_TOP_N=32))
    model = FasterRCNN(num_classes=4, backbone="tiny", cfg=cfg)
    h, w, n = 64, 96, 2
    key = jax.random.PRNGKey(3)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": key, "sampling": key, "dropout": key},
        jnp.zeros((1, h, w, 3), jnp.float32),
        jnp.asarray([[float(h), float(w), 1.0]]), train=False,
    )["params"]

    serve1 = build_serving_fn(model, params, 4, False, 10, cfg.TEST.NMS)
    serven = build_serving_fn(model, params, 4, False, 10, cfg.TEST.NMS,
                              batch=n)
    exported = jexport.export(serven)(
        jax.ShapeDtypeStruct((n, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((n, 3), jnp.float32))
    restored = jexport.deserialize(bytearray(exported.serialize()))

    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(n, h, w, 3).astype(np.float32) * 5)
    info = jnp.asarray([[float(h), float(w), 1.0]] * n, dtype=np.float32)
    batched = restored.call(data, info)
    for i in range(n):
        one = serve1(data[i:i + 1], info[i:i + 1])
        for k in ("boxes", "scores", "classes", "valid"):
            np.testing.assert_allclose(
                np.asarray(batched[k][i]), np.asarray(one[k]),
                rtol=1e-5, atol=1e-5, err_msg=f"{k}[{i}]")
