"""ImageNet DET and Visual Genome imdb tests over synthetic on-disk fixtures."""

import os

import numpy as np
import pytest
from PIL import Image


def _write_xml(path, width, height, objs, name_key):
    body = "".join(
        f"""
  <object>
    <name>{o[name_key]}</name>
    <bndbox><xmin>{o['x1']}</xmin><ymin>{o['y1']}</ymin><xmax>{o['x2']}</xmax><ymax>{o['y2']}</ymax></bndbox>
  </object>"""
        for o in objs
    )
    with open(path, "w") as f:
        f.write(
            f"""<annotation>
  <size><width>{width}</width><height>{height}</height><depth>3</depth></size>{body}
</annotation>"""
        )


@pytest.fixture(scope="module")
def ilsvrc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ilsvrc")
    dev = root / "ILSVRC" / "devkit" / "data"
    dev.mkdir(parents=True)
    (dev / "synsets_det.txt").write_text(
        "n00000001 widget\nn00000002 gadget\nn00000003 gizmo\n"
    )
    base = root / "ILSVRC"
    (base / "ImageSets" / "DET").mkdir(parents=True)
    (base / "Annotations" / "DET" / "val").mkdir(parents=True)
    (base / "Data" / "DET" / "val").mkdir(parents=True)
    rng = np.random.RandomState(0)
    ids = []
    for i in range(4):
        img_id = f"val_{i:06d}"
        ids.append(img_id)
        Image.fromarray(
            (rng.rand(100, 120, 3) * 255).astype(np.uint8)
        ).save(base / "Data" / "DET" / "val" / f"{img_id}.JPEG")
        objs = [
            {"wnid": f"n0000000{rng.randint(1, 4)}", "x1": 10, "y1": 10,
             "x2": 60, "y2": 50}
        ]
        _write_xml(base / "Annotations" / "DET" / "val" / f"{img_id}.xml",
                   120, 100, objs, "wnid")
    (base / "ImageSets" / "DET" / "val.txt").write_text("\n".join(ids) + "\n")
    os.environ["RLOD_DATA_DIR"] = str(root)
    yield str(root)
    os.environ.pop("RLOD_DATA_DIR", None)


def test_imagenet_imdb(ilsvrc_root):
    from rlobjectdetection_tpu.data.imagenet import imagenet

    db = imagenet("val")
    assert db.num_classes == 4  # bg + 3 synsets
    assert db.num_images == 4
    roidb = db.gt_roidb()
    assert all(len(e["boxes"]) == 1 for e in roidb)
    assert all(1 <= e["gt_classes"][0] <= 3 for e in roidb)
    # gt-as-detections → mean AP 1.0
    all_boxes = [[np.empty((0, 5), np.float32) for _ in range(4)]
                 for _ in range(db.num_classes)]
    for i, e in enumerate(roidb):
        b = e["boxes"][0]
        all_boxes[e["gt_classes"][0]][i] = np.array(
            [[b[0], b[1], b[2], b[3], 0.9]], np.float32
        )
    ap = db.evaluate_detections(all_boxes, None)
    assert ap > 0.99


@pytest.fixture(scope="module")
def vg_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vg")
    g = root / "genome"
    (g / "images").mkdir(parents=True)
    (g / "xml").mkdir()
    (g / "objects_vocab_1600.txt").write_text("widget\ngadget\ngizmo\n")
    rng = np.random.RandomState(0)
    ids = []
    names = ["widget", "gadget", "gizmo"]
    for i in range(3):
        img_id = f"{100 + i}"
        ids.append(img_id)
        Image.fromarray(
            (rng.rand(90, 110, 3) * 255).astype(np.uint8)
        ).save(g / "images" / f"{img_id}.jpg")
        objs = [{"name": names[i % 3], "x1": 6, "y1": 6, "x2": 50, "y2": 40}]
        _write_xml(g / "xml" / f"{img_id}.xml", 110, 90, objs, "name")
    (g / "minival.txt").write_text("\n".join(ids) + "\n")
    os.environ["RLOD_DATA_DIR"] = str(root)
    yield str(root)
    os.environ.pop("RLOD_DATA_DIR", None)


def test_vg_imdb(vg_root):
    from rlobjectdetection_tpu.data.vg import vg

    db = vg("1600-400-20", "minival")
    assert db.num_classes == 4
    assert db.num_images == 3
    roidb = db.gt_roidb()
    assert all(len(e["boxes"]) == 1 for e in roidb)
    all_boxes = [[np.empty((0, 5), np.float32) for _ in range(3)]
                 for _ in range(db.num_classes)]
    for i, e in enumerate(roidb):
        b = e["boxes"][0]
        all_boxes[e["gt_classes"][0]][i] = np.array(
            [[b[0], b[1], b[2], b[3], 0.9]], np.float32
        )
    ap = db.evaluate_detections(all_boxes, None)
    assert ap > 0.99


def test_factory_registers_all():
    from rlobjectdetection_tpu.data.factory import list_imdbs

    names = list_imdbs()
    assert "voc_2007_trainval" in names
    assert "coco_2014_minival" in names
    assert "imagenet_val" in names
    assert "vg_1600-400-20_minival" in names or "vg_1600-400-20_val" in names
