#!/usr/bin/env python
"""Offline ΔIoU label generation.

Rebuild of /root/reference/lib/generate_labels/generate_labels.py: enrich a
detection-results json with per-action ΔIoU fields — for each detection, for
each action, recompute the IoU of the moved box against same-category gt and
store `dious` (list of ΔIoU per action) and `act` (argmax action). The
committed reference script contains a debug `sys.exit` mid-loop (l.161,
SURVEY.md §2.7) making it non-runnable; this version is the repaired spec. The
reference hardcodes 4 single-axis −2% moves (l.99-134); the action set here is
configurable and defaults to the RL workload's 56-action space.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser("offline ΔIoU label generation")
    p.add_argument("--ann_file", required=True, help="COCO gt annotations json")
    p.add_argument("--dt_file", required=True, help="detections results json")
    p.add_argument("--out", required=True, help="enriched output json")
    p.add_argument("--delta", type=float, nargs="+",
                   default=[0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625, 0.008])
    p.add_argument("--alpha", type=float, default=1.0)
    args = p.parse_args()

    from collections import defaultdict

    from rlobjectdetection_tpu.data.coco_api import COCO
    from rlobjectdetection_tpu.data.rl_coco import action_dious
    from rlobjectdetection_tpu.models.rl import Action

    action = Action(args.delta, alpha=args.alpha)
    gt = COCO(args.ann_file)
    gt_by_key = defaultdict(list)
    for ann in gt.dataset.get("annotations", []):
        gt_by_key[ann["image_id"], ann["category_id"]].append(ann)

    with open(args.dt_file) as f:
        dts = json.load(f)

    out = []
    for k, dt in enumerate(dts):
        origin, dious = action_dious(
            action, dt["bbox"], gt_by_key[dt["image_id"], dt["category_id"]])
        dious = dious.tolist()
        enriched = dict(dt)
        enriched["iou"] = float(origin)
        enriched["dious"] = [float(x) for x in dious]
        enriched["act"] = int(np.argmax(dious))
        out.append(enriched)
        if k % 10000 == 0:
            print(f"{k}/{len(dts)}")

    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.out} ({len(out)} detections × {action.num_acts} actions)")


if __name__ == "__main__":
    main()
