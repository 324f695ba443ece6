"""Pre-packed input format: feed the chip from ONE host core.

The live pipeline (JPEG decode → BGR → mean-subtract → f32 resize) assembles
44-48 img/s on a single core while the device consumes ~88 (DESIGN.md "Host
input pipeline") — the reference hides the same cost behind 6-25 DataLoader
worker processes (RCNN_bases/trainval_net.py:217). This module moves the
per-pixel work OFFLINE: `pack_roidb` stores each entry's fully prepared
post-resize float32 BGR-mean image (one memory-mappable .npy per
(image, flipped, scale)), and `PackedRoiBatchLoader` swaps it in behind the
loader interface. Batch assembly then degrades to an mmap read + canvas
copy, which one core drives well past the device rate.

Bit-identity contract: the stored array IS the live `load_entry_image_gt`
output (same op order: u8 → BGR f32 → flip → −mean → cv2 f32 resize), and the
loader override consumes the same rng draws, so every downstream random
choice (gt shuffle, crop windows, straddle trims) — and therefore every
batch — is bit-identical to the live path (tests/test_packed.py).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

from .loader import RoiBatchLoader
from .minibatch import (PIXEL_MEANS_BGR, gt_from_entry, prep_im_for_blob,
                        read_image_bgr)

_INDEX = "pack_index.json"
_VERSION = 1


def _key(image_path: str, flipped: bool, scale: int) -> str:
    h = hashlib.sha1(f"{image_path}|{int(bool(flipped))}|{int(scale)}"
                     .encode()).hexdigest()[:20]
    return f"{h}_s{int(scale)}{'_f' if flipped else ''}"


def pack_roidb(roidb, scales, root: str, verbose: bool = True) -> str:
    """Prepare every (entry, scale) combination of `roidb` into `root`.

    Entries that share an image path but differ in `flipped` pack separately
    (the flip happens before the resize, so the pixels differ). Existing
    entries are kept (resumable / incremental)."""
    os.makedirs(root, exist_ok=True)
    index_path = os.path.join(root, _INDEX)
    index = {}
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        assert index.get("__version__", _VERSION) == _VERSION
    index.setdefault("__version__", _VERSION)

    done = 0
    for entry in roidb:
        flipped = bool(entry.get("flipped", False))
        base = read_image_bgr(entry["image"])
        if flipped:
            base = base[:, ::-1, :]
        for scale in scales:
            key = _key(entry["image"], flipped, scale)
            if key in index:
                continue
            im, im_scale = prep_im_for_blob(base, PIXEL_MEANS_BGR, scale)
            np.save(os.path.join(root, key + ".npy"),
                    np.ascontiguousarray(im, dtype=np.float32))
            index[key] = {"im_scale": im_scale,
                          "shape": [int(s) for s in im.shape]}
            done += 1
    with open(index_path, "w") as f:
        json.dump(index, f)
    if verbose:
        print(f"packed {done} new arrays into {root} "
              f"({len(index) - 1} total)")
    return root


class PackedImageStore:
    """Read side of `pack_roidb`: mmap-backed lookups, zero decode work."""

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, _INDEX)) as f:
            self.index = json.load(f)
        assert self.index.get("__version__", _VERSION) == _VERSION

    def get(self, image_path: str, flipped: bool, scale: int):
        """-> (float32 [H, W, 3] read-only mmap view, im_scale)."""
        key = _key(image_path, flipped, scale)
        meta = self.index.get(key)
        if meta is None:
            raise KeyError(
                f"{image_path} (flipped={flipped}, scale={scale}) is not in "
                f"the pack at {self.root} — re-run pack_roidb with this "
                f"roidb/scales")
        arr = np.load(os.path.join(self.root, key + ".npy"), mmap_mode="r")
        return arr, float(meta["im_scale"])


class PackedRoiBatchLoader(RoiBatchLoader):
    """RoiBatchLoader whose image source is a PackedImageStore.

    Consumes the same rng draws as the live `_image_gt` (one randint for the
    scale pick), so batches are bit-identical to the live loader under the
    same seed/plan (tests/test_packed.py pins it, crops and straddle
    included)."""

    def __init__(self, *args, pack_root: str, **kwargs):
        super().__init__(*args, **kwargs)
        self.store = PackedImageStore(pack_root)

    def _image_gt(self, entry, rng):
        scale = self.scales[rng.randint(0, len(self.scales))]
        im, im_scale = self.store.get(entry["image"],
                                      bool(entry.get("flipped", False)), scale)
        return im, gt_from_entry(entry, im_scale), im_scale
