"""ctypes binding + on-demand build of the native RLE mask library.

C++ rebuild of the vendored pycocotools mask core
(/root/reference/lib/pycocotools/maskApi.{h,c} + _mask.pyx): encode/decode/
merge/area/iou/toBbox/frBbox/frPoly on column-major RLE masks. Built lazily
with g++ on first use and cached next to the source (content-hash gated).
Only the segm paths need this library — bbox IoU/eval runs on the pure-numpy
coco_api.iou_xywh without importing it; a g++-less host fails here with the
compiler's error the first time a segm path is used.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "maskrle.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libmaskrle.so")
_HASH = _SO + ".srchash"


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build():
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", _SRC, "-o", _SO], check=True,
        capture_output=True,
    )
    with open(_HASH, "w") as f:
        f.write(_src_hash())


def _built_lib_is_current() -> bool:
    # Reuse is gated on a content hash of the source, NOT mtimes — after a
    # fresh clone mtimes are arbitrary and a stale .so could be dlopen'ed.
    # (.so/.srchash are build artifacts, gitignored.)
    if not os.path.exists(_SO) or not os.path.exists(_HASH):
        return False
    with open(_HASH) as f:
        return f.read().strip() == _src_hash()


def get_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _built_lib_is_current():
        _build()
    lib = ctypes.CDLL(_SO)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.rle_encode.restype = ctypes.c_int
    lib.rle_encode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u32p]
    lib.rle_decode.restype = None
    lib.rle_decode.argtypes = [u32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
    lib.rle_area.restype = ctypes.c_uint64
    lib.rle_area.argtypes = [u32p, ctypes.c_int]
    lib.rle_merge2.restype = ctypes.c_int
    lib.rle_merge2.argtypes = [u32p, ctypes.c_int, u32p, ctypes.c_int,
                               ctypes.c_int, u32p]
    lib.rle_iou_pair.restype = ctypes.c_double
    lib.rle_iou_pair.argtypes = [u32p, ctypes.c_int, u32p, ctypes.c_int, ctypes.c_int]
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.rle_iou_matrix.restype = None
    lib.rle_iou_matrix.argtypes = [u32p, i32p, i32p, ctypes.c_int,
                                   u32p, i32p, i32p, ctypes.c_int, u8p, dp]
    lib.bb_iou.restype = None
    lib.bb_iou.argtypes = [dp, ctypes.c_int, dp, ctypes.c_int, u8p, dp]
    lib.rle_to_bbox.restype = None
    lib.rle_to_bbox.argtypes = [u32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, dp]
    lib.rle_from_bbox.restype = ctypes.c_int
    lib.rle_from_bbox.argtypes = [dp, ctypes.c_int, ctypes.c_int, u32p]
    lib.rle_from_poly.restype = ctypes.c_int
    lib.rle_from_poly.argtypes = [dp, ctypes.c_int, ctypes.c_int, ctypes.c_int, u32p]
    _LIB = lib
    return lib


class RLE:
    """An RLE mask: (h, w, counts uint32 array, column-major runs)."""

    __slots__ = ("h", "w", "counts")

    def __init__(self, h: int, w: int, counts: np.ndarray):
        self.h = h
        self.w = w
        self.counts = np.ascontiguousarray(counts, dtype=np.uint32)


def _u32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def encode(mask: np.ndarray) -> RLE:
    """mask: [H, W] (row-major array; internally column-major like COCO)."""
    lib = get_lib()
    h, w = mask.shape
    col = np.asfortranarray(mask.astype(np.uint8)).reshape(-1, order="F")
    col = np.ascontiguousarray(col)
    counts = np.zeros(h * w + 2, dtype=np.uint32)
    m = lib.rle_encode(_u8p(col), h, w, _u32p(counts))
    return RLE(h, w, counts[:m].copy())


def decode(rle: RLE) -> np.ndarray:
    lib = get_lib()
    out = np.zeros(rle.h * rle.w, dtype=np.uint8)
    lib.rle_decode(_u32p(rle.counts), len(rle.counts), rle.h, rle.w, _u8p(out))
    return out.reshape((rle.h, rle.w), order="F")


def area(rle: RLE) -> int:
    return int(get_lib().rle_area(_u32p(rle.counts), len(rle.counts)))


def merge(a: RLE, b: RLE, intersect: bool = False) -> RLE:
    lib = get_lib()
    out = np.zeros(len(a.counts) + len(b.counts) + 2, dtype=np.uint32)
    m = lib.rle_merge2(_u32p(a.counts), len(a.counts), _u32p(b.counts),
                       len(b.counts), int(intersect), _u32p(out))
    return RLE(a.h, a.w, out[:m].copy())


def iou(dt, gt, iscrowd=None) -> np.ndarray:
    """IoU matrix. dt/gt: lists of RLE, or [N,4] xywh arrays (bbox mode)."""
    lib = get_lib()

    def _crowd(k):
        if iscrowd is None:
            return np.zeros(k, dtype=np.uint8)
        c = np.ascontiguousarray(np.asarray(iscrowd, dtype=np.uint8))
        if len(c) != k:
            # the C side indexes iscrowd[0..k): a short array would be an
            # out-of-bounds read (pycocotools asserts the same)
            raise ValueError(f"iscrowd length {len(c)} != number of gt {k}")
        return c

    if isinstance(dt, np.ndarray) or (dt and isinstance(dt[0], (list, np.ndarray))):
        dtb = np.ascontiguousarray(np.asarray(dt, dtype=np.float64)).reshape(-1, 4)
        gtb = np.ascontiguousarray(np.asarray(gt, dtype=np.float64)).reshape(-1, 4)
        n, k = len(dtb), len(gtb)
        out = np.zeros((n, k), dtype=np.float64)
        lib.bb_iou(_dp(dtb), n, _dp(gtb), k, _u8p(_crowd(k)), _dp(out))
        return out
    n, k = len(dt), len(gt)
    out = np.zeros((n, k), dtype=np.float64)
    if n == 0 or k == 0:
        return out

    def _pack(rles):
        lens = np.array([len(r.counts) for r in rles], dtype=np.int32)
        offs = np.zeros(len(rles), dtype=np.int32)
        np.cumsum(lens[:-1], out=offs[1:])
        flat = np.concatenate([r.counts for r in rles]).astype(np.uint32)
        return np.ascontiguousarray(flat), offs, lens

    i32 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    dflat, doff, dlen = _pack(dt)
    gflat, goff, glen = _pack(gt)
    # one ctypes crossing for the whole matrix (segm-eval hot path)
    lib.rle_iou_matrix(_u32p(dflat), i32(doff), i32(dlen), n,
                       _u32p(gflat), i32(goff), i32(glen), k,
                       _u8p(_crowd(k)), _dp(out))
    return out


def to_bbox(rle: RLE) -> np.ndarray:
    lib = get_lib()
    bb = np.zeros(4, dtype=np.float64)
    lib.rle_to_bbox(_u32p(rle.counts), len(rle.counts), rle.h, rle.w, _dp(bb))
    return bb


def from_bbox(bb, h: int, w: int) -> RLE:
    lib = get_lib()
    bbd = np.ascontiguousarray(np.asarray(bb, dtype=np.float64))
    counts = np.zeros(2 * w + 4, dtype=np.uint32)
    m = lib.rle_from_bbox(_dp(bbd), h, w, _u32p(counts))
    return RLE(h, w, counts[:m].copy())


def from_poly(xy, h: int, w: int) -> RLE:
    lib = get_lib()
    pts = np.ascontiguousarray(np.asarray(xy, dtype=np.float64)).reshape(-1)
    counts = np.zeros(h * w + 2, dtype=np.uint32)
    m = lib.rle_from_poly(_dp(pts), len(pts) // 2, h, w, _u32p(counts))
    return RLE(h, w, counts[:m].copy())
