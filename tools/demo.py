#!/usr/bin/env python
"""Demo: detect objects in an image folder, draw boxes, write *_det.jpg.

Rebuild of /root/reference/RCNN_bases/demo.py: loads a checkpoint (20-class
VOC by default), runs single-scale (600) detection over images in --image_dir,
applies per-class NMS at 0.3 with vis threshold 0.5, draws rectangles
(net_utils.vis_detections equivalent) and writes <name>_det.jpg. With
--webcam_num >= 0 it detects on live frames until 'q' (demo.py:246-258).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

VOC_CLASSES = (
    "__background__", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


def parse_args():
    p = argparse.ArgumentParser(description="Faster R-CNN demo")
    p.add_argument("--net", default="vgg16")
    p.add_argument("--image_dir", default="images")
    p.add_argument("--out_dir", default=None,
                   help="where *_det.jpg land (default: --image_dir, like the "
                        "reference; set it when --image_dir is read-only)")
    p.add_argument("--webcam_num", default=-1, type=int,
                   help="webcam device index (>=0 enables webcam mode, demo.py:58)")
    p.add_argument("--load_name", default=None, help="checkpoint dir")
    p.add_argument("--cag", dest="class_agnostic", action="store_true")
    p.add_argument("--vis_thresh", default=0.5, type=float)
    p.add_argument("--pad_to", nargs=2, type=int, default=None,
                   metavar=("H", "W"),
                   help="fixed blob canvas: pad every image to H W instead "
                        "of its own quantized shape — ONE compile serves a "
                        "mixed-aspect folder (the per-shape default costs "
                        "one multi-minute TPU compile per distinct padded "
                        "shape; same trick as test_net's partial-batch "
                        "canvas). Images that exceed the canvas fall back "
                        "to their own shape.")
    p.add_argument("--set", dest="set_cfgs", nargs="*", default=None)
    return p.parse_args()


def vis_detections(im, class_name, dets, thresh=0.8):
    """cv2 overlay (net_utils.py:52-62)."""
    import cv2

    for i in range(np.minimum(10, dets.shape[0])):
        bbox = tuple(int(np.round(x)) for x in dets[i, :4])
        score = dets[i, -1]
        if score > thresh:
            cv2.rectangle(im, bbox[0:2], bbox[2:4], (0, 204, 0), 2)
            cv2.putText(
                im, f"{class_name}: {score:.3f}", (bbox[0], bbox[1] + 15),
                cv2.FONT_HERSHEY_PLAIN, 1.0, (0, 0, 255), thickness=1,
            )
    return im


def _make_detector(args, cfg, params, forward):
    """One shared prep→forward→postprocess→overlay pipeline for both the
    image-folder and webcam modes (divergence between two copies is how the
    webcam path once lost the class_agnostic arg)."""
    import cv2  # noqa: F401  (callers feed cv2 BGR frames)
    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.data.minibatch import (
        PIXEL_MEANS_BGR, pad_shape, prep_im_for_blob,
    )
    from rlobjectdetection_tpu.engine import postprocess_detections

    def detect_frame(im_bgr, im2show):
        """im_bgr: float32 BGR frame; im2show: uint8 canvas drawn in place."""
        im, im_scale = prep_im_for_blob(im_bgr, PIXEL_MEANS_BGR,
                                        cfg.TEST.SCALES[0])
        ph, pw = pad_shape(im.shape[0], im.shape[1])
        if args.pad_to and args.pad_to[0] >= ph and args.pad_to[1] >= pw:
            ph, pw = args.pad_to
        blob = np.zeros((1, ph, pw, 3), dtype=np.float32)
        blob[0, : im.shape[0], : im.shape[1]] = im
        im_info = np.array([[im.shape[0], im.shape[1], im_scale]],
                           dtype=np.float32)
        out = forward({"params": params}, jnp.asarray(blob),
                      jnp.asarray(im_info), train=False)
        boxes, scores, classes, valid = postprocess_detections(
            out["rois"][0], out["cls_prob"][0], out["bbox_pred"][0],
            jnp.asarray(im_info[0]), out["roi_valid"][0],
            num_classes=len(VOC_CLASSES),
            class_agnostic=args.class_agnostic,
            max_per_image=cfg.TEST.MAX_DETS_PER_IMAGE,
            nms_thresh=cfg.TEST.NMS,
        )
        jax.block_until_ready(boxes)
        boxes_np, scores_np = np.asarray(boxes), np.asarray(scores)
        classes_np, valid_np = np.asarray(classes), np.asarray(valid)
        for j in range(1, len(VOC_CLASSES)):
            sel = valid_np & (classes_np == j)
            if sel.any():
                dets = np.concatenate(
                    [boxes_np[sel], scores_np[sel, None]], axis=1)
                im2show = vis_detections(im2show, VOC_CLASSES[j], dets,
                                         args.vis_thresh)
        return im2show

    return detect_frame


def main():
    from tools._env import setup_platform

    setup_platform()
    import cv2
    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.config import Config, cfg_from_list, cfg_update
    from rlobjectdetection_tpu.engine.checkpoint import load_checkpoint
    from rlobjectdetection_tpu.models import FasterRCNN

    args = parse_args()
    cfg = Config()
    if args.set_cfgs:
        cfg = cfg_from_list(cfg, args.set_cfgs)
    from tools._env import enable_fused_tpu_defaults
    cfg = enable_fused_tpu_defaults(cfg, args.set_cfgs)

    params, meta = None, {}
    if args.load_name:
        tree, meta = load_checkpoint(args.load_name)
        # pin on device once: jitted calls re-transfer host-backed trees on
        # every image otherwise (same fix as tools/test_net.py)
        params = jax.device_put(tree["params"])
        if meta.get("pooling_mode"):
            # the reference demo restores cfg.POOLING_MODE from the
            # checkpoint (RCNN_bases/demo.py:190-191), like test_net
            cfg = cfg_update(cfg, {"POOLING_MODE": meta["pooling_mode"]})
    if meta.get("class_agnostic"):
        args.class_agnostic = True

    backbone = {"vgg16": "vgg16", "res50": "resnet50", "res101": "resnet101",
                "res152": "resnet152"}.get(args.net, args.net)
    model = FasterRCNN(
        num_classes=len(VOC_CLASSES), backbone=backbone,
        class_agnostic=args.class_agnostic, cfg=cfg,
    )
    if params is None:
        print("WARNING: no --load_name; using random weights (smoke mode)")
        key = jax.random.PRNGKey(3)
        d = ((cfg.TEST.SCALES[0] + 31) // 32) * 32
        dummy = jnp.zeros((1, d, d, 3), jnp.float32)
        params = jax.jit(model.init, static_argnames="train")(
            {"params": key, "sampling": key, "dropout": key},
            dummy, jnp.asarray([[float(d), float(d), 1.0]]), train=False,
        )["params"]

    forward = jax.jit(model.apply, static_argnames="train")
    detect_frame = _make_detector(args, cfg, params, forward)

    if args.webcam_num >= 0:
        _webcam_loop(args, detect_frame)
        return

    imglist = [
        f for f in os.listdir(args.image_dir)
        if f.lower().endswith((".jpg", ".png", ".jpeg")) and "_det" not in f
    ]
    print(f"Loaded Photo: {len(imglist)} images.")
    out_dir = args.out_dir or args.image_dir
    os.makedirs(out_dir, exist_ok=True)
    for name in imglist:
        path = os.path.join(args.image_dir, name)
        im_bgr = cv2.imread(path)
        if im_bgr is None:
            print(f"{name}: unreadable image, skipped")
            continue
        t0 = time.time()
        im2show = detect_frame(im_bgr.astype(np.float32), im_bgr.copy())
        print(f"{name}: detect {time.time() - t0:.3f}s")
        out_path = os.path.join(
            out_dir, os.path.splitext(name)[0] + "_det.jpg"
        )
        cv2.imwrite(out_path, im2show)
        print(f"wrote {out_path}")


def _webcam_loop(args, detect_frame):
    """Webcam mode (RCNN_bases/demo.py:246-258, 352-359): grab frames, detect,
    display until 'q'."""
    import cv2

    cap = cv2.VideoCapture(args.webcam_num)
    if not cap.isOpened():
        raise RuntimeError("Webcam could not open. Please check connection.")
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        im2show = detect_frame(frame.astype(np.float32), frame.copy())
        cv2.imshow("result", im2show)
        if cv2.waitKey(1) & 0xFF == ord("q"):
            break
    cap.release()
    cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
