"""Real-JPEG demo path on the reference's bundled demo assets.

The reference ships demo inputs with committed golden outputs
(`/root/reference/images/img{1..4}.jpg` + `img*_det.jpg` —
RCNN_bases/demo.py:244-359 is the loop that produced them). These tests drive
the SAME real JPEGs through the rebuild's full demo pipeline: cv2 JPEG decode
→ BGR mean-subtract/short-side-resize blob (data/minibatch.py) → padded
forward → on-device postprocess → overlay/imwrite. Gated on the reference
checkout existing (CI without it skips).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
REF_IMAGES = "/root/reference/images"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF_IMAGES, "img1.jpg")),
    reason="reference demo assets not present",
)

TINY_SET = [
    "TEST.RPN_PRE_NMS_TOP_N", "128", "TEST.RPN_POST_NMS_TOP_N", "32",
    "TEST.SCALES", "[128]", "TEST.MAX_DETS_PER_IMAGE", "10",
    "ANCHOR_SCALES", "(2,3,5)", "DTYPE", "float32", "NMS_TILE", "64",
]


def test_refimage_blob_forward_postprocess_produces_boxes():
    """img1.jpg through decode→blob→detect in-process: the padded-blob
    forward must keep at least one valid detection (random init keeps
    low-score boxes — the dryrun's eval postprocess contract)."""
    import cv2
    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.config import Config, TestConfig
    from rlobjectdetection_tpu.data.minibatch import (
        PIXEL_MEANS_BGR, pad_shape, prep_im_for_blob)
    from rlobjectdetection_tpu.engine import postprocess_detections
    from rlobjectdetection_tpu.models import FasterRCNN

    im_bgr = cv2.imread(os.path.join(REF_IMAGES, "img1.jpg"))
    assert im_bgr is not None and im_bgr.ndim == 3 and im_bgr.shape[2] == 3

    cfg = Config(
        TEST=TestConfig(RPN_PRE_NMS_TOP_N=128, RPN_POST_NMS_TOP_N=32,
                        SCALES=(128,), MAX_DETS_PER_IMAGE=10),
        ANCHOR_SCALES=(2, 3, 5), DTYPE="float32", NMS_TILE=64,
    )
    model = FasterRCNN(num_classes=21, backbone="tiny", cfg=cfg)

    im, im_scale = prep_im_for_blob(im_bgr.astype(np.float32),
                                    PIXEL_MEANS_BGR, 128)
    ph, pw = pad_shape(im.shape[0], im.shape[1])
    blob = np.zeros((1, ph, pw, 3), dtype=np.float32)
    blob[0, : im.shape[0], : im.shape[1]] = im
    im_info = jnp.asarray(
        [[im.shape[0], im.shape[1], im_scale]], dtype=jnp.float32)

    key = jax.random.PRNGKey(3)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": key, "sampling": key, "dropout": key},
        jnp.asarray(blob), im_info, train=False)["params"]
    out = jax.jit(model.apply, static_argnames="train")(
        {"params": params}, jnp.asarray(blob), im_info, train=False)
    boxes, scores, classes, valid = postprocess_detections(
        out["rois"][0], out["cls_prob"][0], out["bbox_pred"][0], im_info[0],
        out["roi_valid"][0], num_classes=21, max_per_image=10, nms_thresh=0.3)

    valid_np = np.asarray(valid)
    boxes_np = np.asarray(boxes)[valid_np]
    assert valid_np.any(), "no detections survived on the real JPEG"
    # boxes are in ORIGINAL image coordinates (demo overlays on the raw frame)
    h0, w0 = im_bgr.shape[:2]
    assert (boxes_np[:, 0] >= 0).all() and (boxes_np[:, 1] >= 0).all()
    assert (boxes_np[:, 2] <= w0 + 1).all() and (boxes_np[:, 3] <= h0 + 1).all()
    assert np.isfinite(np.asarray(scores)[valid_np]).all()


def test_demo_cli_reference_images(tmp_path):
    """tools/demo.py over the reference's images dir writes one *_det.jpg per
    input (the committed-golden filenames), leaving the read-only source dir
    untouched via --out_dir."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["RLOD_FORCE_CPU"] = "1"
    out_dir = str(tmp_path / "dets")
    r = subprocess.run(
        [sys.executable, "tools/demo.py", "--net", "tiny",
         "--image_dir", REF_IMAGES, "--out_dir", out_dir,
         # fixed canvas: all four mixed-aspect images share ONE compile
         "--vis_thresh", "0.0", "--pad_to", "192", "192", "--set"] + TINY_SET,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    outs = sorted(os.listdir(out_dir))
    assert outs == ["img1_det.jpg", "img2_det.jpg",
                    "img3_det.jpg", "img4_det.jpg"], outs
    import cv2

    ref = cv2.imread(os.path.join(REF_IMAGES, "img1.jpg"))
    got = cv2.imread(os.path.join(out_dir, "img1_det.jpg"))
    assert got is not None and got.shape == ref.shape
