"""Blob assembly: image read → BGR → mean-subtract → resize → pad.

Rebuild of /root/reference/lib/roi_data_layer/minibatch.py +
/root/reference/lib/model/utils/blob.py with the reference's exact conventions:
RGB→BGR channel flip (minibatch.py:73), BGR caffe pixel means subtracted
(PIXEL_MEANS, utils/config.py:257), shortest-side resize to the sampled scale
with the MAX_SIZE clamp disabled (blob.py:46-47 — commented out upstream, so the
detector path resizes purely by shortest side), gt boxes scaled by im_scale
(minibatch.py:44-46).

TPU addition: `pad_shape` quantizes padded blob sizes (default multiples of 32)
so the jit cache sees a bounded set of shapes (SURVEY.md §7 "recompilation
control").
"""

from __future__ import annotations

import numpy as np
from PIL import Image

PIXEL_MEANS_BGR = np.array([[[102.9801, 115.9465, 122.7717]]], dtype=np.float32)


def read_image_bgr(path: str) -> np.ndarray:
    """[H, W, 3] float32 BGR."""
    img = Image.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    arr = np.asarray(img, dtype=np.float32)
    return arr[:, :, ::-1].copy()


def prep_im_for_blob(im: np.ndarray, pixel_means, target_size: int,
                     max_size: int | None = None):
    """Mean-subtract + shortest-side resize (blob.py:35-52). The reference's
    MAX_SIZE clamp is commented out (blob.py:46-47); pass max_size to opt back in
    (the RL transform uses it, RL_coco_dataset.py:181-184)."""
    im = im.astype(np.float32, copy=False) - pixel_means
    im_shape = im.shape
    im_size_min = np.min(im_shape[0:2])
    im_size_max = np.max(im_shape[0:2])
    im_scale = float(target_size) / float(im_size_min)
    if max_size is not None and np.round(im_scale * im_size_max) > max_size:
        im_scale = float(max_size) / float(im_size_max)
    im = _resize(im, im_scale)
    return im, im_scale


def _resize(im: np.ndarray, scale: float) -> np.ndarray:
    import cv2

    return cv2.resize(im, None, None, fx=scale, fy=scale,
                      interpolation=cv2.INTER_LINEAR)


def pad_shape(h: int, w: int, multiple: int = 32) -> tuple[int, int]:
    """Round up to a multiple to bound the number of compiled shapes."""
    r = lambda x: ((x + multiple - 1) // multiple) * multiple
    return r(h), r(w)


def im_list_to_blob(ims, multiple: int = 32) -> np.ndarray:
    """Zero-pad a list of [H, W, 3] images to a common (quantized) max shape
    (blob.py:20-33), NHWC."""
    max_shape = np.array([im.shape[:2] for im in ims]).max(axis=0)
    ph, pw = pad_shape(int(max_shape[0]), int(max_shape[1]), multiple)
    blob = np.zeros((len(ims), ph, pw, 3), dtype=np.float32)
    for i, im in enumerate(ims):
        blob[i, : im.shape[0], : im.shape[1], :] = im
    return blob


def load_entry_image_gt(entry, scales, rng):
    """Per-entry image/gt prep shared by get_minibatch and RoiBatchLoader:
    read + flip + random-scale-pick + BGR-mean resize, gt from non-background
    classes scaled to image coords. Returns (im, gt_boxes [G, 5], im_scale)."""
    im = read_image_bgr(entry["image"])
    if entry.get("flipped", False):
        im = im[:, ::-1, :]
    scale = scales[rng.randint(0, len(scales))]
    im, im_scale = prep_im_for_blob(im, PIXEL_MEANS_BGR, scale)
    return im, gt_from_entry(entry, im_scale), im_scale


def gt_from_entry(entry, im_scale: float) -> np.ndarray:
    """gt boxes [G, 5] = all non-background entries scaled to image coords
    (minibatch.py:44-46; crowd boxes included, like USE_ALL_GT upstream)."""
    gt_inds = np.where(entry["gt_classes"] != 0)[0]
    gt_boxes = np.zeros((len(gt_inds), 5), dtype=np.float32)
    gt_boxes[:, :4] = entry["boxes"][gt_inds, :].astype(np.float32) * im_scale
    gt_boxes[:, 4] = entry["gt_classes"][gt_inds]
    return gt_boxes


def get_minibatch(roidb_entries, scales, multiple: int = 32,
                  rng: np.random.RandomState | None = None):
    """Single/multi-image minibatch (minibatch.py:21-56): scale sampled per
    image, blob padded + quantized; gt boxes are all foreground entries
    (gt_classes != 0 — COCO crowd boxes included, like USE_ALL_GT upstream),
    scaled to image coords.

    Returns dict(data [N,H,W,3], im_info [N,3], gt_boxes list of [G,5]).
    """
    rng = rng or np.random
    ims = []
    im_scales = []
    gt_list = []
    for entry in roidb_entries:
        im, gt_boxes, im_scale = load_entry_image_gt(entry, scales, rng)
        ims.append(im)
        im_scales.append(im_scale)
        gt_list.append(gt_boxes)

    blob = im_list_to_blob(ims, multiple)
    im_info = np.array(
        [[im.shape[0], im.shape[1], s] for im, s in zip(ims, im_scales)],
        dtype=np.float32,
    )
    return {"data": blob, "im_info": im_info, "gt_boxes": gt_list}


def pad_gt_boxes(gt_list, max_num: int) -> tuple[np.ndarray, np.ndarray]:
    """Fixed-pad per-image gt boxes to [N, max_num, 5] + counts
    (roibatchLoader.py:193-197)."""
    n = len(gt_list)
    out = np.zeros((n, max_num, 5), dtype=np.float32)
    num = np.zeros((n,), dtype=np.int32)
    for i, g in enumerate(gt_list):
        k = min(len(g), max_num)
        out[i, :k] = g[:k]
        num[i] = k
    return out, num
