"""COCO imdb.

Rebuild of /root/reference/lib/datasets/coco.py: 81-class detection imdb over
the COCO json annotations (crowd boxes get -1 overlaps, l.132-188), results-json
writing (l.267-301) and COCOeval-based `evaluate_detections` (l.254-265,303-325)
— using this package's self-contained COCO API instead of the vendored
pycocotools.
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np

from .coco_api import COCO
from .coco_eval import COCOeval
from .imdb import imdb


class coco(imdb):
    def __init__(self, image_set, year, data_path=None):
        super().__init__(f"coco_{year}_{image_set}")
        self._year = year
        self._image_set = image_set
        self._data_path = data_path or os.path.join(self._data_root(), "coco")
        self._view_map = {
            "minival2014": "val2014",
            "valminusminival2014": "val2014",
            "test-dev2015": "test2015",
        }
        self._COCO = COCO(self._get_ann_file())
        cats = self._COCO.loadCats(self._COCO.getCatIds())
        self._classes = tuple(["__background__"] + [c["name"] for c in cats])
        self._class_to_ind = dict(zip(self.classes, range(self.num_classes)))
        self._class_to_coco_cat_id = dict(
            zip([c["name"] for c in cats], self._COCO.getCatIds())
        )
        self._image_index = self._load_image_set_index()
        coco_name = image_set + year
        self._data_name = self._view_map.get(coco_name, coco_name)
        self._gt_splits = ("train", "val", "minival")
        self._roidb_handler = self.gt_roidb

    def _get_ann_file(self):
        prefix = "instances" if "test" not in self._image_set else "image_info"
        return os.path.join(
            self._data_path, "annotations",
            f"{prefix}_{self._image_set}{self._year}.json",
        )

    def _load_image_set_index(self):
        return self._COCO.getImgIds()

    def image_path_at(self, i):
        return self.image_path_from_index(self._image_index[i])

    def image_id_at(self, i):
        return self._image_index[i]

    def image_path_from_index(self, index):
        # images/<data_name>/COCO_<data_name>_<12-digit id>.jpg (coco.py:99-107)
        file_name = "COCO_" + self._data_name + "_" + str(index).zfill(12) + ".jpg"
        image_path = os.path.join(self._data_path, "images", self._data_name, file_name)
        if not os.path.exists(image_path):
            # 2017-style layout fallback: images/<data_name>/<12-digit id>.jpg
            fallback = os.path.join(
                self._data_path, "images", self._data_name, str(index).zfill(12) + ".jpg"
            )
            assert os.path.exists(fallback), (
                f"image {index} not found under either layout: "
                f"{image_path} / {fallback}")   # reference coco.py asserts too
            image_path = fallback
        return image_path

    def gt_roidb(self):
        cache_file = os.path.join(self.cache_path, self.name + "_gt_roidb.pkl")
        if os.path.exists(cache_file):
            with open(cache_file, "rb") as fid:
                roidb = pickle.load(fid)
            print(f"{self.name} gt roidb loaded from {cache_file}")
            return roidb
        gt_roidb = [
            self._load_coco_annotation(index) for index in self._image_index
        ]
        with open(cache_file, "wb") as fid:
            pickle.dump(gt_roidb, fid, pickle.HIGHEST_PROTOCOL)
        print(f"wrote gt roidb to {cache_file}")
        return gt_roidb

    def _load_coco_annotation(self, index):
        """annotation → roidb entry; crowd boxes get overlap −1 (coco.py:132-188)."""
        im_ann = self._COCO.loadImgs(index)[0]
        width = im_ann["width"]
        height = im_ann["height"]

        annIds = self._COCO.getAnnIds(imgIds=index, iscrowd=None)
        objs = self._COCO.loadAnns(annIds)
        valid_objs = []
        for obj in objs:
            x1 = np.max((0, obj["bbox"][0]))
            y1 = np.max((0, obj["bbox"][1]))
            x2 = np.min((width - 1, x1 + np.max((0, obj["bbox"][2] - 1))))
            y2 = np.min((height - 1, y1 + np.max((0, obj["bbox"][3] - 1))))
            if obj["area"] > 0 and x2 >= x1 and y2 >= y1:
                obj["clean_bbox"] = [x1, y1, x2, y2]
                valid_objs.append(obj)
        objs = valid_objs
        num_objs = len(objs)

        boxes = np.zeros((num_objs, 4), dtype=np.uint16)
        gt_classes = np.zeros((num_objs), dtype=np.int32)
        overlaps = np.zeros((num_objs, self.num_classes), dtype=np.float32)
        seg_areas = np.zeros((num_objs), dtype=np.float32)

        coco_cat_id_to_class_ind = dict(
            [
                (self._class_to_coco_cat_id[cls], self._class_to_ind[cls])
                for cls in self._classes[1:]
            ]
        )
        for ix, obj in enumerate(objs):
            cls = coco_cat_id_to_class_ind[obj["category_id"]]
            boxes[ix, :] = obj["clean_bbox"]
            gt_classes[ix] = cls
            seg_areas[ix] = obj["area"]
            if obj.get("iscrowd", 0):
                overlaps[ix, :] = -1.0
            else:
                overlaps[ix, cls] = 1.0

        return {
            "width": width,
            "height": height,
            "boxes": boxes,
            "gt_classes": gt_classes,
            "gt_overlaps": overlaps,
            "flipped": False,
            "seg_areas": seg_areas,
        }

    def _get_box_file(self, index):
        file_name = "COCO_" + self._data_name + "_" + str(index).zfill(12) + ".mat"
        return os.path.join("boxes", self._data_name, file_name)

    def _coco_results_one_category(self, boxes, cat_id):
        results = []
        for im_ind, index in enumerate(self.image_index):
            dets = np.array(boxes[im_ind]).astype(float)
            if dets.size == 0:
                continue
            scores = dets[:, -1]
            xs = dets[:, 0]
            ys = dets[:, 1]
            ws = dets[:, 2] - xs + 1
            hs = dets[:, 3] - ys + 1
            results.extend(
                [
                    {
                        "image_id": index,
                        "category_id": cat_id,
                        "bbox": [xs[k], ys[k], ws[k], hs[k]],
                        "score": scores[k],
                    }
                    for k in range(dets.shape[0])
                ]
            )
        return results

    def _write_coco_results_file(self, all_boxes, res_file):
        results = []
        for cls_ind, cls in enumerate(self.classes):
            if cls == "__background__":
                continue
            print(
                f"Collecting {cls} results ({cls_ind}/{self.num_classes - 1})"
            )
            coco_cat_id = self._class_to_coco_cat_id[cls]
            results.extend(
                self._coco_results_one_category(all_boxes[cls_ind], coco_cat_id)
            )
        print(f"Writing results json to {res_file}")
        with open(res_file, "w") as fid:
            json.dump(results, fid)

    def _print_detection_eval_metrics(self, coco_eval):
        """Mean + per-category AP over IoU [0.5, 0.95] in the reference's
        print format (coco.py:221-252)."""
        lo, hi = 0.5, 0.95

        def thr_ind(thr):
            return int(np.where(np.isclose(coco_eval.params.iouThrs, thr))[0][0])

        ind_lo, ind_hi = thr_ind(lo), thr_ind(hi)
        # precision dims: (iou, recall, cls, area, maxdets); area 0 = all,
        # maxdets 2 = 100
        precision = coco_eval.eval["precision"][ind_lo:ind_hi + 1, :, :, 0, 2]
        ap_default = np.mean(precision[precision > -1]) if (precision > -1).any() else -1
        print(f"~~~~ Mean and per-category AP @ IoU=[{lo:.2f},{hi:.2f}] ~~~~")
        print(f"{100 * ap_default:.1f}")
        for cls_ind, cls in enumerate(self.classes):
            if cls == "__background__":
                continue
            p = coco_eval.eval["precision"][ind_lo:ind_hi + 1, :, cls_ind - 1, 0, 2]
            ap = np.mean(p[p > -1]) if (p > -1).any() else -1
            print(f"{100 * ap:.1f}")
        print("~~~~ Summary metrics ~~~~")

    def _do_detection_eval(self, res_file, output_dir):
        coco_dt = self._COCO.loadRes(res_file)
        coco_eval = COCOeval(self._COCO, coco_dt, iouType="bbox")
        coco_eval.evaluate()
        coco_eval.accumulate()
        self._print_detection_eval_metrics(coco_eval)
        stats = coco_eval.summarize()
        eval_file = os.path.join(output_dir, "detection_results.pkl")
        with open(eval_file, "wb") as fid:
            pickle.dump(coco_eval, fid, pickle.HIGHEST_PROTOCOL)
        print(f"Wrote COCO eval results to: {eval_file}")
        return stats

    def evaluate_detections(self, all_boxes, output_dir):
        res_file = os.path.join(
            output_dir, "detections_" + self._image_set + self._year + "_results.json"
        )
        self._write_coco_results_file(all_boxes, res_file)
        if self._image_set.find("test") == -1:
            return self._do_detection_eval(res_file, output_dir)
        return None

    def competition_mode(self, on):
        pass
