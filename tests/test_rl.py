"""RL refinement extension tests: action space, ΔIoU labeler, policy net."""

import json
import os

import numpy as np
import pytest

from rlobjectdetection_tpu.config import RLConfig
from rlobjectdetection_tpu.models.rl import Action


def test_action_space_structure():
    cfg = RLConfig()
    a = Action(list(cfg.act_delta), alpha=1.0, iou_thres=0.0, wtrans=cfg.act_wtrans)
    assert a.num_acts == 56  # 4 coords × 7 deltas × 2 signs (action.py:11)
    d = a.actDeltas
    assert d.shape == (56, 4)
    # each action touches exactly one coordinate
    assert ((d != 0).sum(axis=1) == 1).all()
    # sign pairs: consecutive actions are +δ, −δ on the same coord
    np.testing.assert_allclose(d[0::2], -d[1::2])
    # first 14 actions act on x1, next 14 on y1, etc.
    for i in range(4):
        block = d[i * 14 : (i + 1) * 14]
        assert (block[:, i] != 0).all()


def test_move_from_act_teacher_forced():
    a = Action([0.5, 0.25], alpha=1.0)
    n_act = a.num_acts
    boxes = np.array([[[10.0, 10.0, 20.0, 20.0]]])  # xywh
    preds = np.zeros((1, 1, n_act))
    targets = np.zeros((1, 1, n_act))
    preds[0, 0, 0] = 5.0     # predict action 0 (+0.5 on x)
    targets[0, 0, 0] = 1.0   # action is labeled good
    moved, prec = a.move_from_act(boxes.copy(), preds, targets, maxk=1)
    assert prec == 100.0
    np.testing.assert_allclose(moved[0, 0], [10 + 0.5 * 20, 10, 20, 20])
    # teacher says bad → box unchanged
    targets[0, 0, 0] = -1.0
    moved2, prec2 = a.move_from_act(boxes.copy(), preds, targets, maxk=1)
    assert prec2 == 0.0
    np.testing.assert_allclose(moved2[0, 0], boxes[0, 0])


@pytest.fixture(scope="module")
def rl_fixture(tmp_path_factory):
    """Tiny COCO gt + detections json for the RL dataset."""
    from rlobjectdetection_tpu.data.synthetic import make_coco_dataset

    root = tmp_path_factory.mktemp("rl")
    ann = make_coco_dataset(str(root), num_images=4, split="val", year="2014")
    # detections: gt boxes jittered
    with open(ann) as f:
        gt = json.load(f)
    rng = np.random.RandomState(0)
    dets = []
    for a in gt["annotations"]:
        b = list(a["bbox"])
        b[0] += rng.randn() * 2
        b[1] += rng.randn() * 2
        dets.append(
            {"image_id": a["image_id"], "category_id": a["category_id"],
             "bbox": [float(x) for x in b], "score": 0.8}
        )
    dt_file = str(root / "dets.json")
    with open(dt_file, "w") as f:
        json.dump(dets, f)
    img_dir = os.path.join(str(root), "coco", "images", "val2014")
    return ann, dt_file, img_dir


def test_rl_dataset_labels(rl_fixture):
    ann, dt_file, img_dir = rl_fixture
    from rlobjectdetection_tpu.data.rl_coco import COCODataset, COCOTransform

    cfg = RLConfig()
    action = Action(list(cfg.act_delta), wtrans=cfg.act_wtrans)
    ds = COCODataset(img_dir, ann, dt_file, action,
                     transform_fn=COCOTransform([120], 200),
                     normalize_mean=cfg.normalize_mean,
                     normalize_std=cfg.normalize_std)
    assert ds.pos_tot + ds.neg_tot > 0
    img, bboxes, labels, im_info = ds[0]
    assert img.ndim == 3 and img.shape[2] == 3
    n = bboxes.shape[0]
    assert labels.shape == (n, 56, 3)
    # labels are ±1 with positive weights
    assert set(np.unique(labels[..., 1])) <= {-1.0, 1.0}
    assert (labels[..., 2] > 0).all()
    # a detection with a nonzero offset from gt must have at least one positive
    # action (moving toward the gt raises IoU)
    assert (labels[..., 1] == 1).any()
    # bbox row: (x1, y1, x2, y2, score, cat, img_id) scaled by resize scale —
    # coords must live in RESIZED-image space (im_info = (h', w', scale))
    h_r, w_r, scale = im_info[0], im_info[1], im_info[2]
    assert scale > 0 and (h_r <= 200 and w_r <= 200)   # transform max_size
    assert (bboxes[:, 2] > bboxes[:, 0]).all()
    assert (bboxes[:, 0] >= 0).all() and (bboxes[:, 1] >= 0).all()
    assert (bboxes[:, 2] <= w_r + 1e-3).all(), "x2 beyond resized width"
    assert (bboxes[:, 3] <= h_r + 1e-3).all(), "y2 beyond resized height"
    assert bboxes[:, 4].max() <= 1.0


def test_rl_labels_match_brute_force(rl_fixture):
    """ΔIoU labels agree with a brute-force recomputation (RL_coco_dataset.py:107-137)."""
    ann, dt_file, img_dir = rl_fixture
    from rlobjectdetection_tpu.data.coco_api import iou_xywh
    from rlobjectdetection_tpu.data.rl_coco import COCODataset

    action = Action([0.25, 0.125])
    ds = COCODataset(img_dir, ann, dt_file, action)
    img_id = ds.imgIds[1]
    bboxes, labels = ds.label_detections(img_id)
    # verify a random detection row
    row = 0
    x1, y1, x2, y2 = bboxes[row, :4]
    cat = int(bboxes[row, 5])
    bbox = np.array([x1, y1, x2 - x1, y2 - y1])
    gts = [g["bbox"] for g in ds.gt_boxes[img_id, cat]]
    origin = iou_xywh([bbox], gts).max()
    for k in range(action.num_acts):
        delta = action.actDeltas[k]
        nb = bbox + delta * np.array([bbox[2], bbox[3], bbox[2], bbox[3]])
        dio = iou_xywh([nb], gts).max() - origin
        want = 1.0 if dio > 0 else -1.0
        assert labels[row, k, 1] == want, k


def test_rl_loader_padding(rl_fixture):
    ann, dt_file, img_dir = rl_fixture
    from rlobjectdetection_tpu.data.rl_coco import COCODataLoader, COCODataset, COCOTransform

    action = Action([0.25])
    ds = COCODataset(img_dir, ann, dt_file, action,
                     transform_fn=COCOTransform([96], 160))
    dl = COCODataLoader(ds, batch_size=2, shuffle=False)
    batch = next(iter(dl))
    b, n = batch["bboxes"].shape[:2]
    assert b == 2
    assert batch["data"].shape[1] % 32 == 0
    assert batch["labels"].shape == (b, n, action.num_acts, 3)
    # batch-id column
    for i in range(b):
        k = batch["num_dts"][i]
        assert (batch["bboxes"][i, :k, 0] == i).all()


def test_rl_loader_epoch_keyed_determinism(rl_fixture):
    """set_epoch pins the batch order AND the per-item transform draws to a
    pure function of (seed, epoch, index): a loader resumed at epoch k yields
    byte-identical batches to an uninterrupted loader at epoch k (the RL
    deterministic-resume contract, mirroring loader.py::set_epoch)."""
    ann, dt_file, img_dir = rl_fixture
    from rlobjectdetection_tpu.data.rl_coco import COCODataLoader, COCODataset, COCOTransform

    action = Action([0.25])
    # a genuinely random transform (size range + flips) — determinism must
    # come from the keyed rng, not from a degenerate parameterization
    ds = COCODataset(img_dir, ann, dt_file, action,
                     transform_fn=COCOTransform([80, 120], 200, flip=True))

    def epoch_batches(dl, epoch):
        dl.set_epoch(epoch)
        return list(dl)

    a = COCODataLoader(ds, batch_size=2, shuffle=True)
    b = COCODataLoader(ds, batch_size=2, shuffle=True)
    ran_a = [epoch_batches(a, e) for e in (0, 1)]
    # "resumed" loader: fresh object, jumps straight to epoch 1
    ran_b1 = epoch_batches(b, 1)
    for ba, bb in zip(ran_a[1], ran_b1):
        for k in ("data", "bboxes", "labels", "num_dts"):
            np.testing.assert_array_equal(ba[k], bb[k])
    # different epochs draw different streams (shuffle or flips must differ)
    diff = any(
        ba["data"].shape != bb["data"].shape or not np.array_equal(ba["data"], bb["data"])
        for ba, bb in zip(ran_a[0], ran_a[1])
    )
    assert diff, "epoch 0 and 1 produced identical batches — rng not epoch-keyed"


def test_rl_policy_net_forward_and_grad():
    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.models.rl import RLPolicyNet

    model = RLPolicyNet(num_acts=8, num_layers=50)
    rng = np.random.RandomState(0)
    b, n = 1, 3
    img = jnp.asarray(rng.randn(b, 64, 64, 3).astype(np.float32))
    bboxes = np.zeros((b, n, 8), dtype=np.float32)
    bboxes[:, :, 1:5] = [4, 4, 40, 40]
    targets = jnp.asarray(rng.choice([-1.0, 1.0], size=(b, n, 8)).astype(np.float32))
    weights = jnp.ones((b, n, 8), jnp.float32)

    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, img, jnp.asarray(bboxes), targets, weights
    )["params"]
    pred, loss, noweight = jax.jit(model.apply)(
        {"params": params}, img, jnp.asarray(bboxes), targets, weights
    )
    assert pred.shape == (b * n, 8)
    assert np.isfinite(float(loss)) and float(loss) > 0

    def loss_fn(p):
        _, l, _ = model.apply({"params": p}, img, jnp.asarray(bboxes), targets, weights)
        return l

    g = jax.jit(jax.grad(loss_fn))(params)
    # head trainable grads nonzero; base conv1 grad is zero (frozen BN folds,
    # but conv grads flow — freezing happens in the optimizer for RL)
    gl = jax.tree_util.tree_leaves(g["fc"])
    assert any(np.abs(np.asarray(x)).sum() > 0 for x in gl)

    # layer4 BN affine TRAINS (reference freeze_layer stops at layer3,
    # Reinforcement/resnet.py:139-147): scale/bias grads nonzero, stats cut
    bn = g["head"]["layer4"]["block0"]["bn1"]
    assert np.abs(np.asarray(bn["scale"])).sum() > 0
    assert np.abs(np.asarray(bn["bias"])).sum() > 0
    assert np.abs(np.asarray(bn["mean"])).sum() == 0
    assert np.abs(np.asarray(bn["var"])).sum() == 0


def test_warm_start_from_detector():
    """The RL trunk warm-start must copy matching detector weights
    (trainval_net.py:96-99 strict=False semantics)."""
    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.config import Config, TestConfig, TrainConfig
    from rlobjectdetection_tpu.models import FasterRCNN
    from rlobjectdetection_tpu.models.rl import RLPolicyNet, warm_start_from_detector

    cfg = Config(TRAIN=TrainConfig(RPN_PRE_NMS_TOP_N=64, RPN_POST_NMS_TOP_N=16,
                                   BATCH_SIZE=8),
                 TEST=TestConfig(RPN_PRE_NMS_TOP_N=64, RPN_POST_NMS_TOP_N=16),
                 DTYPE="float32", NMS_TILE=64)
    det = FasterRCNN(num_classes=4, backbone="resnet50", cfg=cfg)
    key = jax.random.PRNGKey(0)
    det_params = jax.jit(det.init, static_argnames="train")(
        {"params": key, "sampling": key, "dropout": key},
        jnp.zeros((1, 64, 64, 3)), jnp.asarray([[64.0, 64.0, 1.0]]), train=False,
    )["params"]

    rl = RLPolicyNet(num_acts=8, num_layers=50)
    bboxes = jnp.zeros((1, 2, 8))
    rl_params = jax.jit(rl.init)(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 64, 64, 3)), bboxes,
        jnp.zeros((1, 2, 8)), jnp.ones((1, 2, 8)),
    )["params"]

    import numpy as np

    before = np.asarray(rl_params["base"]["conv1"]["kernel"])
    warm = warm_start_from_detector(rl_params, det_params)
    np.testing.assert_array_equal(
        np.asarray(warm["base"]["conv1"]["kernel"]),
        np.asarray(det_params["base"]["conv1"]["kernel"]),
    )
    assert not np.array_equal(before, np.asarray(warm["base"]["conv1"]["kernel"]))
    # RL-only heads untouched
    np.testing.assert_array_equal(
        np.asarray(warm["fc8"]["kernel"]), np.asarray(rl_params["fc8"]["kernel"])
    )
    # detector head layer4 (stride 2) vs RL head (stride 1): same param shapes →
    # copied too
    np.testing.assert_array_equal(
        np.asarray(warm["head"]["layer4"]["block0"]["conv1"]["kernel"]),
        np.asarray(det_params["head"]["layer4"]["block0"]["conv1"]["kernel"]),
    )


def test_move_predicted_free_running():
    """Deployment-mode move: top-k boxes move by their own argmax action
    regardless of targets (the spec-repaired free-running eval)."""
    a = Action([0.5])
    boxes = np.array([[[10.0, 10.0, 20.0, 20.0],
                       [50.0, 50.0, 10.0, 10.0]]])
    preds = np.zeros((1, 2, a.num_acts))
    preds[0, 0, 0] = 9.0   # box 0: strong vote for +0.5 on x
    preds[0, 1, 2] = 1.0   # box 1: weaker vote
    moved = a.move_predicted(boxes, preds, maxk=1)
    np.testing.assert_allclose(moved[0, 0], [10 + 0.5 * 20, 10, 20, 20])
    np.testing.assert_allclose(moved[0, 1], boxes[0, 1])  # beyond maxk: untouched
