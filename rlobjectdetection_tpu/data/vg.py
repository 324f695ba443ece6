"""Visual Genome imdb + eval.

Rebuild of /root/reference/lib/datasets/vg.py and vg_eval.py: a VG detection
imdb over the standard VG release layout (per-image XML annotations à la VOC in
`<data_dir>/xml`, class vocabularies in `<data_dir>/<split>.txt` object lists,
e.g. objects_vocab_1600.txt), with the reference's 2500-class default and
AP-based evaluation (vg_eval mirrors voc_eval with pickle-cached annotations).
"""

from __future__ import annotations

import os
import pickle
import xml.etree.ElementTree as ET

import numpy as np

from .imdb import imdb
from .voc_eval import voc_ap


class vg(imdb):
    def __init__(self, version, image_set, data_path=None):
        super().__init__(f"vg_{version}_{image_set}")
        self._version = version
        self._image_set = image_set
        self._data_path = data_path or os.path.join(self._data_root(), "genome")
        self._img_dir = os.path.join(self._data_path, "images")
        self._ann_dir = os.path.join(self._data_path, "xml")
        # vocab: objects_vocab_<N>.txt with one name per line
        vocab_size = version.split("-")[0]
        vocab_file = os.path.join(self._data_path, f"objects_vocab_{vocab_size}.txt")
        classes = ["__background__"]
        if os.path.exists(vocab_file):
            with open(vocab_file) as f:
                classes.extend(line.strip() for line in f if line.strip())
        self._classes = classes
        self._class_to_ind = {c: i for i, c in enumerate(classes)}
        self._image_index = self._load_image_set_index()
        self._roidb_handler = self.gt_roidb

    def _load_image_set_index(self):
        split_file = os.path.join(self._data_path, f"{self._image_set}.txt")
        if os.path.exists(split_file):
            with open(split_file) as f:
                return [line.strip() for line in f if line.strip()]
        # fall back to all annotated images
        if os.path.isdir(self._ann_dir):
            return sorted(
                os.path.splitext(f)[0] for f in os.listdir(self._ann_dir)
                if f.endswith(".xml")
            )
        raise FileNotFoundError(f"no VG split file {split_file}")

    def image_path_at(self, i):
        return os.path.join(self._img_dir, self._image_index[i] + ".jpg")

    def gt_roidb(self):
        cache_file = os.path.join(self.cache_path, self.name + "_gt_roidb.pkl")
        if os.path.exists(cache_file):
            with open(cache_file, "rb") as fid:
                return pickle.load(fid)
        roidb = [self._load_vg_annotation(ix) for ix in self.image_index]
        with open(cache_file, "wb") as fid:
            pickle.dump(roidb, fid, pickle.HIGHEST_PROTOCOL)
        return roidb

    def _load_vg_annotation(self, index):
        filename = os.path.join(self._ann_dir, index + ".xml")
        tree = ET.parse(filename)
        size = tree.find("size")
        width = int(size.find("width").text)
        height = int(size.find("height").text)
        objs = []
        for obj in tree.findall("object"):
            name = obj.find("name").text
            if name is None:
                continue
            name = name.lower().strip()
            if name in self._class_to_ind:
                objs.append((obj, self._class_to_ind[name]))
        num = len(objs)
        boxes = np.zeros((num, 4), dtype=np.uint16)
        gt_classes = np.zeros((num,), dtype=np.int32)
        overlaps = np.zeros((num, self.num_classes), dtype=np.float32)
        seg_areas = np.zeros((num,), dtype=np.float32)
        for ix, (obj, cls) in enumerate(objs):
            bb = obj.find("bndbox")
            x1 = max(float(bb.find("xmin").text) - 1, 0)
            y1 = max(float(bb.find("ymin").text) - 1, 0)
            x2 = min(float(bb.find("xmax").text) - 1, width - 1)
            y2 = min(float(bb.find("ymax").text) - 1, height - 1)
            if x2 < x1 or y2 < y1:
                continue
            boxes[ix] = [x1, y1, x2, y2]
            gt_classes[ix] = cls
            overlaps[ix, cls] = 1.0
            seg_areas[ix] = (x2 - x1 + 1) * (y2 - y1 + 1)
        return {
            "width": width, "height": height, "boxes": boxes,
            "gt_classes": gt_classes, "gt_overlaps": overlaps,
            "flipped": False, "seg_areas": seg_areas,
        }

    def evaluate_detections(self, all_boxes, output_dir):
        return vg_eval_all(self, all_boxes, output_dir)


def vg_eval_all(db: vg, all_boxes, output_dir, ovthresh: float = 0.5):
    """Per-class AP over the imdb's gt (rebuild of vg_eval.py:22-123)."""
    aps = []
    roidb = db.roidb
    for cls_ind in range(1, db.num_classes):
        npos = 0
        recs = []
        for i in range(db.num_images):
            gt = roidb[i]
            sel = gt["gt_classes"] == cls_ind
            boxes = gt["boxes"][sel].astype(float)
            npos += len(boxes)
            recs.append({"bbox": boxes, "det": [False] * len(boxes)})
        dets = []
        for i in range(db.num_images):
            for d in all_boxes[cls_ind][i]:
                dets.append((d[4], i, d[:4]))
        if npos == 0 or not dets:
            continue
        dets.sort(key=lambda x: -x[0])
        tp = np.zeros(len(dets))
        fp = np.zeros(len(dets))
        for k, (score, i, bb) in enumerate(dets):
            R = recs[i]
            BBGT = R["bbox"]
            ovmax = -np.inf
            jmax = -1
            if len(BBGT):
                ixmin = np.maximum(BBGT[:, 0], bb[0])
                iymin = np.maximum(BBGT[:, 1], bb[1])
                ixmax = np.minimum(BBGT[:, 2], bb[2])
                iymax = np.minimum(BBGT[:, 3], bb[3])
                iw = np.maximum(ixmax - ixmin + 1.0, 0.0)
                ih = np.maximum(iymax - iymin + 1.0, 0.0)
                inters = iw * ih
                uni = (
                    (bb[2] - bb[0] + 1.0) * (bb[3] - bb[1] + 1.0)
                    + (BBGT[:, 2] - BBGT[:, 0] + 1.0) * (BBGT[:, 3] - BBGT[:, 1] + 1.0)
                    - inters
                )
                overlaps = inters / uni
                ovmax = overlaps.max()
                jmax = overlaps.argmax()
            if ovmax > ovthresh and not R["det"][jmax]:
                tp[k] = 1.0
                R["det"][jmax] = True
            else:
                fp[k] = 1.0
        fp = np.cumsum(fp)
        tp = np.cumsum(tp)
        rec = tp / float(npos)
        prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
        aps.append(voc_ap(rec, prec))
    mean_ap = float(np.mean(aps)) if aps else 0.0
    print(f"VG mean AP = {mean_ap:.4f} over {len(aps)} classes")
    return mean_ap
