"""RL refinement dataset: ΔIoU action labels over base-detector outputs.

Rebuild of /root/reference/lib/datasets/RL_coco_dataset.py (COCODataset +
COCOTransform), /root/reference/lib/datasets/RL_coco_loader.py (padding
collate), and a re-specification of the MISSING `datasets.tools.pnw_static.
get_weights_statistics` module (imported at RL_coco_dataset.py:19 but absent
from the repo — SURVEY.md §2.3): it computes, over the whole dataset, the
total count and wtrans-weight mass of positive (ΔIoU > iou_thres) and negative
action labels, used to balance the loss
(pos_wratio = (pos_tot + neg_tot) / pos_weights / 2, RL_coco_dataset.py:68-69).

Per-detection labeling (RL_coco_dataset.py:107-145): for each detection box and
each of the 56 actions, move the xywh box by delta·[w,h,w,h], recompute max IoU
vs same-category gt (crowd-aware), label +1 if ΔIoU > thres else −1, weight
wtrans(ΔIoU)·{pos,neg}_wratio. The dataset keeps the reference's coordinate
convention: boxes are converted to xyxy for the network (x2 = x + w, l.144 —
note: NO −1 here, unlike the detector path).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import numpy as np
from PIL import Image

from .coco_api import COCO, iou_xywh


def action_dious(bbox_action, bbox, gts):
    """Per-action ΔIoU of one detection against its (image, category) gt
    list — the single shared core of the online labeler, the weight
    statistics, and the offline label generator (reference
    RL_coco_dataset.py:119-126, generate_labels.py:99-134). Empty gt lists
    fall back to one degenerate zero box (IoU 0 everywhere, the reference's
    behavior). Returns (origin_iou, dious[num_acts])."""
    gtb = [g["bbox"] for g in gts] or [[0, 0, 0, 0]]
    iscrowd = [int(g.get("iscrowd", 0)) for g in gts] or [0]
    bbox = np.asarray(bbox, dtype=np.float64)
    w, h = bbox[2], bbox[3]
    origin = iou_xywh([bbox], gtb, iscrowd).max()
    moved = bbox[None, :] + bbox_action.actDeltas * np.array([w, h, w, h])
    dious = iou_xywh(moved, gtb, iscrowd).max(axis=1) - origin
    return float(origin), dious


def _stat_chunk(chunk, gt_boxes, bbox_action):
    """Partial (pos_tot, neg_tot, pos_w, neg_w) over a chunk of detections."""
    pos_tot = neg_tot = 0
    pos_weights = neg_weights = 0.0
    for (img_id, cat_id), dt in chunk:
        _, dious = action_dious(bbox_action, dt["bbox"], gt_boxes[img_id, cat_id])
        pos = dious > bbox_action.iou_thres
        wts = np.array([bbox_action.wtrans(d) for d in dious])
        pos_tot += int(pos.sum())
        neg_tot += int((~pos).sum())
        pos_weights += float(wts[pos].sum())
        neg_weights += float(wts[~pos].sum())
    return pos_tot, neg_tot, pos_weights, neg_weights


def get_weights_statistics(imgIds, catIds, dt_boxes, gt_boxes, bbox_action,
                           shuffle: bool = True, maxDets: int | None = None,
                           num_workers: int = 0):
    """Dataset-wide pos/neg label count + wtrans weight mass.

    Re-specified from its call site (RL_coco_dataset.py:61-69): returns
    (pos_tot, neg_tot, pos_weights, neg_weights) where *_tot are label counts
    and *_weights are sums of wtrans(ΔIoU) over those labels.

    The reference call site subsamples with shuffle=True, maxDets=5000
    (RL_coco_dataset.py:63-66) — a uniform sample of the pos/neg mass that
    bounds startup cost; COCODataset passes 5000 by default for call-site
    parity. `maxDets=None` runs the FULL pass instead (the exact statistic).
    `num_workers` > 1 splits the pass across threads (the IoU math is numpy,
    which releases the GIL); the counts are identical for any worker count and
    the weight sums equal up to float-addition reassociation.
    """
    rng = np.random.RandomState(3)
    # iterate existing keys only — probing the caller's defaultdict for the
    # full imgIds×catIds product would insert millions of empty lists (and a
    # materialized product set costs ~1 GB on train2014)
    img_set, cat_set = set(imgIds), set(catIds)
    flat = [(key, dt) for key, dts in dt_boxes.items()
            if key[0] in img_set and key[1] in cat_set
            for dt in dts]
    if shuffle:
        rng.shuffle(flat)
    if maxDets is not None:
        flat = flat[:maxDets]

    if num_workers and num_workers > 1 and len(flat) > 64:
        from concurrent.futures import ThreadPoolExecutor

        chunks = [flat[i::num_workers] for i in range(num_workers)]
        with ThreadPoolExecutor(num_workers) as pool:
            parts = list(pool.map(
                lambda c: _stat_chunk(c, gt_boxes, bbox_action), chunks))
    else:
        parts = [_stat_chunk(flat, gt_boxes, bbox_action)]

    pos_tot = sum(p[0] for p in parts)
    neg_tot = sum(p[1] for p in parts)
    pos_weights = max(sum(p[2] for p in parts), 1e-8)
    neg_weights = max(sum(p[3] for p in parts), 1e-8)
    return pos_tot, neg_tot, pos_weights, neg_weights


class COCOTransform:
    """Random short-side resize + max-size cap + optional flip
    (RL_coco_dataset.py:174-205).

    Accepts an optional per-item `rng`; when the loader supplies one keyed by
    (seed, epoch, index), a resumed run replays exactly the transforms the
    uninterrupted run would have drawn (deterministic resume — the internal
    stateful stream is only the fallback for direct calls)."""

    def __init__(self, sizes, max_size, flip: bool = False, seed: int = 3):
        if not isinstance(sizes, (list, tuple)):
            sizes = [sizes]
        self.scale_min = min(sizes)
        self.scale_max = max(sizes)
        self.max_size = max_size
        self.flip = flip
        self.rng = np.random.RandomState(seed)

    def __call__(self, img: Image.Image, bboxes: np.ndarray,
                 rng: np.random.RandomState | None = None):
        rng = self.rng if rng is None else rng
        image_w, image_h = img.size
        short = min(image_w, image_h)
        large = max(image_w, image_h)
        size = rng.randint(self.scale_min, self.scale_max + 1)
        scale = min(size / short, self.max_size / large)
        new_w, new_h = int(np.floor(image_w * scale)), int(np.floor(image_h * scale))
        img = img.resize((new_w, new_h))
        if bboxes.shape[0] > 0:
            bboxes = bboxes.copy()
            bboxes[:, :4] *= scale
        if self.flip and rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
            if bboxes.shape[0] > 0:
                x1 = bboxes[:, 0].copy()
                bboxes[:, 0] = new_w - scale - bboxes[:, 2]
                bboxes[:, 2] = new_w - scale - x1
        return scale, img, bboxes


class COCODataset:
    """RL training dataset over (gt annotations, base-detector detections)."""

    def __init__(self, root_dir, ann_file, dt_file, bbox_action,
                 transform_fn=None, normalize_mean=None, normalize_std=None,
                 max_stat_dets: int | None = 5000, stat_workers: int = 0):
        self.root_dir = root_dir
        self.transform_fn = transform_fn
        self.normalize_mean = (
            np.asarray(normalize_mean, dtype=np.float32) if normalize_mean is not None else None
        )
        self.normalize_std = (
            np.asarray(normalize_std, dtype=np.float32) if normalize_std is not None else None
        )
        self.cocoGt = COCO(ann_file, quiet=True)
        self.imgIds = sorted(self.cocoGt.getImgIds())
        self.catIds = sorted(self.cocoGt.getCatIds())
        self.cat2cls = {c: i for i, c in enumerate(self.catIds)}
        self.cls2cat = {i: c for i, c in enumerate(self.catIds)}

        annIds = self.cocoGt.getAnnIds(imgIds=self.imgIds, catIds=self.catIds)
        self.gt_boxes = defaultdict(list)
        for gt in self.cocoGt.loadAnns(annIds):
            self.gt_boxes[gt["image_id"], gt["category_id"]].append(gt)

        with open(dt_file) as f:
            dt_list = json.load(f)
        self.dt_boxes = defaultdict(list)
        for dt in dt_list:
            self.dt_boxes[dt["image_id"], dt["category_id"]].append(dt)

        self.bbox_action = bbox_action
        self.pos_tot, self.neg_tot, self.pos_weights, self.neg_weights = (
            get_weights_statistics(
                self.imgIds, self.catIds, self.dt_boxes, self.gt_boxes,
                bbox_action, shuffle=True, maxDets=max_stat_dets,
                num_workers=stat_workers,
            )
        )
        self.pos_wratio = (self.pos_tot + self.neg_tot) / self.pos_weights / 2.0
        self.neg_wratio = (self.pos_tot + self.neg_tot) / self.neg_weights / 2.0

    def __len__(self):
        return len(self.imgIds)

    def label_detections(self, img_id):
        """All (bbox, per-action labels) for one image — the RL_coco_dataset
        labeling core (l.107-145), vectorized over actions."""
        bboxes_out = []
        labels_out = []
        for cat_id in self.catIds:
            # .get, not [] — probing the defaultdicts for every (image,
            # category) pair would permanently insert ~6.6M empty lists
            # over a train2014 epoch
            for dt_box in self.dt_boxes.get((img_id, cat_id), ()):
                bbox = np.asarray(dt_box["bbox"], dtype=np.float64)
                _, dious = action_dious(
                    self.bbox_action, bbox,
                    self.gt_boxes.get((img_id, cat_id), []))
                pos = dious > self.bbox_action.iou_thres
                wts = np.array([self.bbox_action.wtrans(d) for d in dious])
                wts = np.where(pos, wts * self.pos_wratio, wts * self.neg_wratio)
                lab = np.stack(
                    [np.arange(self.bbox_action.num_acts),
                     np.where(pos, 1.0, -1.0), wts], axis=1,
                )
                # xywh → xyxy via x2 = x + w (RL convention, l.144: no −1)
                xyxy = [bbox[0], bbox[1], bbox[0] + bbox[2], bbox[1] + bbox[3]]
                bboxes_out.append(xyxy + [dt_box["score"], cat_id, img_id])
                labels_out.append(lab)
        if not bboxes_out:
            return (np.zeros((0, 7), dtype=np.float32),
                    np.zeros((0, self.bbox_action.num_acts, 3), dtype=np.float32))
        return (np.asarray(bboxes_out, dtype=np.float32),
                np.asarray(labels_out, dtype=np.float32))

    def __getitem__(self, idx, rng: np.random.RandomState | None = None):
        img_id = self.imgIds[idx]
        meta = self.cocoGt.imgs[img_id]
        filename = os.path.join(self.root_dir, meta["file_name"])
        oh, ow = meta["height"], meta["width"]
        img = Image.open(filename)
        if img.mode != "RGB":
            img = img.convert("RGB")

        bboxes, labels = self.label_detections(img_id)

        if self.transform_fn and rng is not None:
            scale, img, bboxes = self.transform_fn(img, bboxes, rng=rng)
        elif self.transform_fn:
            scale, img, bboxes = self.transform_fn(img, bboxes)
        else:
            scale = 1.0
        rw, rh = img.size
        img_data = np.asarray(img, dtype=np.float32) / 255.0      # RGB, ToTensor conv.
        if self.normalize_mean is not None:
            img_data = (img_data - self.normalize_mean) / self.normalize_std

        im_info = [rh, rw, scale, oh, ow, filename]
        return img_data, bboxes, labels, im_info


class COCODataLoader:
    """Padding batcher (RL_coco_loader.py:8-76): images zero-padded to the batch
    max H/W (quantized), boxes/labels padded to max N with a batch-id column
    prepended → bboxes [B, N, 8] = (batch_id, x1, y1, x2, y2, score, cat, img_id).
    """

    def __init__(self, dataset: COCODataset, batch_size: int, shuffle: bool = True,
                 pad_multiple: int = 32, seed: int = 3):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.pad_multiple = pad_multiple
        self.seed = seed
        self._epoch = 0  # next __iter__()'s epoch stream (see set_epoch)

    def __len__(self):
        return int(np.ceil(len(self.dataset) / self.batch_size))

    def set_epoch(self, epoch: int) -> None:
        """Pin the NEXT __iter__() to epoch's stream. The batch order and every
        per-item transform draw are pure functions of (seed, epoch, index), so
        a resumed run replays exactly the batches an uninterrupted run would
        have produced — the same repair-by-spec the detector loader got
        (loader.py::set_epoch); the reference RL loop re-draws from one global
        torch stream and cannot replay (trainval_net.py:129-133)."""
        self._epoch = int(epoch)

    def __iter__(self):
        epoch = self._epoch
        self._epoch += 1
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState([self.seed, epoch]).shuffle(order)
        for s in range(0, len(order), self.batch_size):
            idxs = order[s : s + self.batch_size]
            yield self.collate(
                [self.dataset.__getitem__(
                    i, rng=np.random.RandomState([self.seed, epoch, int(i)]))
                 for i in idxs])

    def collate(self, samples):
        from .minibatch import pad_shape

        b = len(samples)
        max_h = max(s[0].shape[0] for s in samples)
        max_w = max(s[0].shape[1] for s in samples)
        ph, pw = pad_shape(max_h, max_w, self.pad_multiple)
        # quantize the detection axis like the image axes: the raw per-batch
        # max would give nearly every batch its own jitted shape (the repo's
        # fixed-shape invariant; padded rows carry zero label weight either way)
        max_n = max(max(s[1].shape[0] for s in samples), 1)
        max_n = -(-max_n // 16) * 16
        num_acts = self.dataset.bbox_action.num_acts

        imgs = np.zeros((b, ph, pw, 3), dtype=np.float32)
        bboxes = np.zeros((b, max_n, 8), dtype=np.float32)
        labels = np.zeros((b, max_n, num_acts, 3), dtype=np.float32)
        num_dts = np.zeros((b,), dtype=np.int32)
        im_infos = []
        for i, (img, bx, lb, info) in enumerate(samples):
            imgs[i, : img.shape[0], : img.shape[1]] = img
            n = bx.shape[0]
            num_dts[i] = n
            if n:
                bboxes[i, :n, 0] = i
                bboxes[i, :n, 1:] = bx
                labels[i, :n] = lb
            im_infos.append(info)
        return {
            "data": imgs, "bboxes": bboxes, "labels": labels,
            "num_dts": num_dts, "im_info": im_infos,
        }
