#!/usr/bin/env python
"""Host-side input-pipeline throughput at COCO-like shapes.

Measures RoiBatchLoader batch assembly (JPEG decode -> BGR -> mean-subtract ->
scale-800 resize -> pad) serial vs AsyncLoader thread-pool overlap, on
synthetic 640x480 JPEGs (the COCO modal source size; scale 800 resizes to
~800x1067). The reference hides this cost behind 6-25 DataLoader worker
processes (RCNN_bases/trainval_net.py:217); here decode/resize release the
GIL so threads suffice (data/prefetch.py).

Run:  python tools/bench_loader.py [num_images] [batch_size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_jpegs(root, n, w=640, h=480):
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        p = os.path.join(root, f"im{i:04d}.jpg")
        if not os.path.exists(p):
            # smooth low-frequency content + noise: realistic JPEG entropy
            yy, xx = np.mgrid[0:h, 0:w]
            base = 96 + 80 * np.sin(xx / (20 + i % 7)) * np.cos(yy / (25 + i % 5))
            img = (base[..., None] + rng.randn(h, w, 3) * 12
                   + rng.randint(0, 60)).clip(0, 255).astype(np.uint8)
            Image.fromarray(img).save(p, quality=90)
        paths.append(p)
    return paths


def build_roidb(paths, w=640, h=480):
    rng = np.random.RandomState(1)
    roidb = []
    for p in paths:
        nb = rng.randint(1, 8)
        boxes = np.zeros((nb, 4), dtype=np.uint16)
        x1 = rng.randint(0, w - 60, nb)
        y1 = rng.randint(0, h - 60, nb)
        boxes[:, 0], boxes[:, 1] = x1, y1
        boxes[:, 2] = x1 + rng.randint(20, 55, nb)
        boxes[:, 3] = y1 + rng.randint(20, 55, nb)
        roidb.append({
            "image": p, "flipped": False, "boxes": boxes,
            "gt_classes": rng.randint(1, 81, nb).astype(np.int32),
            "width": w, "height": h, "need_crop": 0,
        })
    return roidb


def main():
    from rlobjectdetection_tpu.data.loader import RoiBatchLoader
    from rlobjectdetection_tpu.data.prefetch import AsyncLoader

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    paths = make_jpegs("/tmp/loader_bench", n)
    roidb = build_roidb(paths)
    ratios = np.array([e["width"] / e["height"] for e in roidb])
    order = np.argsort(ratios)

    def fresh():
        return RoiBatchLoader(roidb, ratios[order], order, batch_size=bs,
                              scales=(800,), max_num_gt=20)

    # pre-packed pipeline (data/packed.py): assembly = mmap read + canvas copy
    from rlobjectdetection_tpu.data.packed import PackedRoiBatchLoader, pack_roidb

    pack_root = "/tmp/loader_bench_pack"
    t0 = time.perf_counter()
    pack_roidb(roidb, (800,), pack_root, verbose=False)
    print(f"pack build: {time.perf_counter() - t0:.1f}s "
          f"(one-time, offline)", flush=True)

    def fresh_packed():
        return PackedRoiBatchLoader(roidb, ratios[order], order, batch_size=bs,
                                    scales=(800,), max_num_gt=20,
                                    pack_root=pack_root)

    # warm the page cache so every config reads hot files
    for _ in fresh():
        pass
    for _ in fresh_packed():
        pass

    rows = []
    for label, wrap in [("serial", lambda l: l),
                       ("packed", lambda l: l, ),
                       ("packed async nw=1", lambda l: AsyncLoader(l, 1)),
                       ("async nw=1", lambda l: AsyncLoader(l, 1)),
                       ("async nw=4", lambda l: AsyncLoader(l, 4)),
                       ("async nw=8", lambda l: AsyncLoader(l, 8))]:
        mk = fresh_packed if label.startswith("packed") else fresh
        t0 = time.perf_counter()
        count = 0
        for _ in range(3):
            for batch in wrap(mk()):
                count += batch["data"].shape[0]
        dt = time.perf_counter() - t0
        rows.append((label, count / dt))
        print(f"{label:12s} {count / dt:7.1f} img/s host-side", flush=True)

    base = rows[0][1]
    print(f"\nscale-800 assembly (640x480 JPEG -> ~800x1067 f32 blob): "
          f"serial {base:.0f} img/s; best async {max(r[1] for r in rows):.0f} "
          f"img/s over {os.cpu_count()} cores")


if __name__ == "__main__":
    main()
