#!/usr/bin/env python
"""Re-layout MCG proposal files into the directory scheme the VOC proposal
loaders expect (rebuild of /root/reference/lib/datasets/tools/mcg_munge.py).

MCG box files are downloaded flat (<image_id>.mat); the selective-search /
proposal roidb path expects MCG/mat/<subdir-from-id>/<image_id>.mat.
"""

import os
import shutil
import sys


def munge(src_dir: str):
    files = os.listdir(src_dir)
    for fn in files:
        base, ext = os.path.splitext(fn)
        if ext != ".mat":
            continue
        # VOC2007-style ids: 000005 → first 4 chars as subdir; VOC2012-style:
        # 2007_000032 → year_prefix subdir
        first = base[:4]
        dst_dir = os.path.join("MCG", "mat", first)
        os.makedirs(dst_dir, exist_ok=True)
        src = os.path.join(src_dir, fn)
        dst = os.path.join(dst_dir, fn)
        print(f"MV: {src} -> {dst}")
        shutil.move(src, dst)


if __name__ == "__main__":
    munge(sys.argv[1])
