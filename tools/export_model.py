#!/usr/bin/env python
"""Export the detector's serving function as a portable StableHLO artifact.

Beyond-reference deployment story: the reference serves by shipping the
python model tree plus a .pth; here the ENTIRE jitted eval step — backbone
forward, proposal generation, decode, per-class NMS, top-100 cap — exports
to one self-contained `jax.export` artifact with the weights baked in as
constants. The artifact replays on any matching-platform runtime (CPU smoke
test / TPU serving) with no model code, and carries the static input shape
contract explicitly.

    python tools/export_model.py --load_name <ckpt_dir> --net res101 \
        --out model.jaxexport --height 800 --width 1216 \
        --platforms cpu,tpu [--classes 81] [--cag]

Verify/replay:

    python tools/export_model.py --replay model.jaxexport --height 800 ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Export the serving function")
    p.add_argument("--load_name", default=None, help="checkpoint dir")
    p.add_argument("--net", default="res101")
    p.add_argument("--out", default="model.jaxexport")
    p.add_argument("--replay", default=None,
                   help="deserialize this artifact and run one synthetic frame")
    p.add_argument("--height", default=800, type=int)
    p.add_argument("--width", default=1216, type=int)
    p.add_argument("--classes", default=81, type=int)
    p.add_argument("--cag", dest="class_agnostic", action="store_true")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated export platforms")
    p.add_argument("--max_per_image", default=100, type=int)
    p.add_argument("--set", dest="set_cfgs", nargs="*", default=None)
    return p.parse_args()


def build_serving_fn(model, params, num_classes, class_agnostic,
                     max_per_image, nms_thresh):
    """One-image serving step: [1,H,W,3] caffe-BGR blob + [1,3] im_info →
    (boxes, scores, classes, valid), params closed over as constants."""
    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.engine import postprocess_detections

    def serve(data, im_info):
        out = model.apply({"params": params}, data, im_info, train=False)
        boxes, scores, classes, valid = postprocess_detections(
            out["rois"][0], out["cls_prob"][0], out["bbox_pred"][0],
            im_info[0], out["roi_valid"][0],
            num_classes=num_classes, class_agnostic=class_agnostic,
            max_per_image=max_per_image, nms_thresh=nms_thresh,
        )
        return {"boxes": boxes, "scores": scores,
                "classes": classes, "valid": valid}

    return jax.jit(serve)


def export_artifact(args, cfg=None):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from rlobjectdetection_tpu.config import Config, cfg_from_list, cfg_update
    from rlobjectdetection_tpu.engine.checkpoint import load_checkpoint
    from rlobjectdetection_tpu.models import FasterRCNN

    if cfg is None:
        cfg = Config()
        if args.set_cfgs:
            cfg = cfg_from_list(cfg, args.set_cfgs)

    meta = {}
    params = None
    if args.load_name:
        tree, meta = load_checkpoint(args.load_name)
        params = tree["params"]
        if meta.get("pooling_mode"):
            cfg = cfg_update(cfg, {"POOLING_MODE": meta["pooling_mode"]})
        if meta.get("class_agnostic"):
            args.class_agnostic = True

    backbone = {"vgg16": "vgg16", "res50": "resnet50", "res101": "resnet101",
                "res152": "resnet152"}.get(args.net, args.net)
    model = FasterRCNN(num_classes=args.classes, backbone=backbone,
                       class_agnostic=args.class_agnostic, cfg=cfg)
    h, w = args.height, args.width
    data_spec = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
    info_spec = jax.ShapeDtypeStruct((1, 3), jnp.float32)
    if params is None:
        print("WARNING: no --load_name; exporting random weights (smoke mode)")
        key = jax.random.PRNGKey(3)
        params = jax.jit(model.init, static_argnames="train")(
            {"params": key, "sampling": key, "dropout": key},
            jnp.zeros((1, h, w, 3), jnp.float32),
            jnp.asarray([[float(h), float(w), 1.0]]), train=False,
        )["params"]

    serve = build_serving_fn(model, params, args.classes, args.class_agnostic,
                             args.max_per_image, cfg.TEST.NMS)
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    exported = jexport.export(serve, platforms=platforms)(data_spec, info_spec)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob) / 1e6:.1f} MB -> {args.out} "
          f"(platforms={platforms}, input [1,{h},{w},3])")
    return args.out


def replay_artifact(path, h, w):
    """Deserialize and run one synthetic frame — proves the artifact is
    self-contained (no model code touched)."""
    import jax.numpy as jnp
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32) * 10)
    info = jnp.asarray([[float(h), float(w), 1.0]], dtype=np.float32)
    out = exported.call(data, info)
    n = int(np.asarray(out["valid"]).sum())
    print(f"replayed {path}: {n} detections above threshold "
          f"(top score {float(np.asarray(out['scores']).max()):.4f})")
    return out


def main():
    from tools._env import setup_platform

    args = parse_args()
    setup_platform()
    if args.replay:
        replay_artifact(args.replay, args.height, args.width)
        return
    export_artifact(args)


if __name__ == "__main__":
    main()
