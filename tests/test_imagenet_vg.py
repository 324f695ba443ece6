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


def _write_rich_vg_xml(path, width, height, objects, relations):
    """objects: list of (object_id, name, box, [attributes])."""
    parts = [f"<annotation><size><width>{width}</width>"
             f"<height>{height}</height><depth>3</depth></size>"]
    for oid, name, (x1, y1, x2, y2), atts in objects:
        att_xml = "".join(f"<attribute>{a}</attribute>" for a in atts)
        parts.append(
            f"<object><name>{name}</name><object_id>{oid}</object_id>{att_xml}"
            f"<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin>"
            f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>")
    for sub, pred, obj in relations:
        parts.append(
            f"<relation><subject_id>{sub}</subject_id>"
            f"<predicate>{pred}</predicate><object_id>{obj}</object_id></relation>")
    parts.append("</annotation>")
    with open(path, "w") as f:
        f.write("".join(parts))


@pytest.fixture(scope="module")
def vg_rich_root(tmp_path_factory):
    """Reference-layout fixture: versioned synonym vocab + attributes +
    relations + 'im_file ann_file' split lines over two image dirs."""
    root = tmp_path_factory.mktemp("vg_rich")
    g = root / "genome"
    vdir = g / "150-50-20"
    vdir.mkdir(parents=True)
    (g / "xml").mkdir()
    (root / "vg" / "VG_100K").mkdir(parents=True)
    (root / "vg" / "VG_100K_2").mkdir()
    (vdir / "objects_vocab.txt").write_text("widget,doohickey\ngadget\n")
    (vdir / "attributes_vocab.txt").write_text("red\nshiny,glossy\n")
    (vdir / "relations_vocab.txt").write_text("on\nnear\n")
    rng = np.random.RandomState(0)
    lines = []
    for i, folder in enumerate(["VG_100K", "VG_100K_2", "VG_100K"]):
        img_id = 200 + i
        Image.fromarray((rng.rand(90, 110, 3) * 255).astype(np.uint8)).save(
            root / "vg" / folder / f"{img_id}.jpg")
        objs = [
            (1, "doohickey" if i == 0 else "widget", (6, 6, 50, 40), ["red"]),
            (2, "gadget", (30, 20, 80, 70), ["glossy", "unknownatt"]),
        ]
        rels = [(1, "on", 2), (1, "on", 2), (2, "badpred", 1)]
        _write_rich_vg_xml(g / "xml" / f"{img_id}.xml", 110, 90, objs, rels)
        lines.append(f"{folder}/{img_id}.jpg xml/{img_id}.xml")
    (g / "val.txt").write_text("\n".join(lines) + "\n")
    os.environ["RLOD_DATA_DIR"] = str(root)
    yield str(root)
    os.environ.pop("RLOD_DATA_DIR", None)


def test_vg_rich_layout(vg_rich_root):
    from rlobjectdetection_tpu.data.vg import vg

    db = vg("150-50-20", "minival", data_path=os.path.join(vg_rich_root, "genome"))
    # synonym vocab: 'doohickey' maps to 'widget' (class 1)
    assert db.classes == ["__background__", "widget", "gadget"]
    assert db.attributes == ["__no_attribute__", "red", "shiny"]
    assert db.num_images == 3                    # minival caps val at 100
    # two-directory image layout resolved through the split file
    assert "VG_100K_2" in db.image_path_at(1)
    roidb = db.gt_roidb()
    e = roidb[0]
    assert list(e["gt_classes"]) == [1, 2]
    assert e["gt_attributes"][0, 0] == 1          # red
    assert e["gt_attributes"][1, 0] == 2          # glossy → shiny (synonym)
    # duplicate + unknown-predicate relations dropped; one triple survives
    assert e["gt_relations"].shape == (1, 3)
    assert tuple(e["gt_relations"][0]) == (0, 1, 1)   # widget -on-> gadget


def test_vg_attribute_eval(vg_rich_root, tmp_path):
    from rlobjectdetection_tpu.data.vg import vg

    db = vg("150-50-20", "minival", data_path=os.path.join(vg_rich_root, "genome"))
    roidb = db.gt_roidb()
    n_att = len(db.attributes)
    all_boxes = [[np.empty((0, 5), np.float32) for _ in range(db.num_images)]
                 for _ in range(n_att)]
    for i, e in enumerate(roidb):
        for k in range(len(e["boxes"])):
            att = e["gt_attributes"][k, 0]
            b = e["boxes"][k]
            all_boxes[att][i] = np.concatenate(
                [all_boxes[att][i],
                 np.array([[b[0], b[1], b[2], b[3], 0.9]], np.float32)])
    ap = db.evaluate_attributes(all_boxes, str(tmp_path / "out"))
    assert ap > 0.99
    assert (tmp_path / "out" / "attribute_thresholds_minival.txt").exists()
