from .anchors import generate_anchors, shifted_anchors
from .boxes import (
    bbox_overlaps,
    bbox_overlaps_masked,
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
)
from .nms import nms, nms_select, nms_sorted_mask
from .roi_align import roi_align, roi_align_avg, roi_align_max
from .roi_crop import bilinear_sample, roi_crop
from .roi_pool import roi_pool

__all__ = [
    "generate_anchors", "shifted_anchors",
    "bbox_transform", "bbox_transform_inv", "clip_boxes",
    "bbox_overlaps", "bbox_overlaps_masked",
    "nms", "nms_select", "nms_sorted_mask",
    "roi_align", "roi_align_avg", "roi_align_max",
    "roi_pool", "roi_crop", "bilinear_sample",
]
