"""Numerical parity vs torch: backbone forwards must match after weight
conversion.

This is the strongest available proxy for "caffe-pretrained mAP parity"
without the actual .pth files: hand-built torch modules with
torchvision-compatible parameter names (the layout tools/convert_torch_weights.py
expects) are randomly initialized, converted to our flax trees, and both
frameworks' forward passes are compared elementwise. Covers conv padding
conventions, the ceil-mode maxpool, frozen-BN math, bottleneck wiring, and the
NCHW→NHWC weight transposes.
"""

import os
import sys

import numpy as np
import pytest

# a hard import, not importorskip: torch is baked into this image and a
# silent skip would hide the strongest mAP-parity proxy (conversion oracle)
import torch  # noqa: E402
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.convert_torch_weights import convert_resnet, convert_vgg16, merge_pretrained  # noqa: E402


class TorchBottleneck(tnn.Module):
    """Mirrors the reference Bottleneck VERBATIM (faster_rcnn/resnet.py:66-102):
    caffe flavor — stride on the 1×1 conv1, conv2 stride 1 (the '# change'
    comments at resnet.py:71-73). NOT torchvision (which strides the 3×3)."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, stride=stride, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=1, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNetBase(tnn.Module):
    """conv1..layer3 with torchvision parameter names; the reference's
    ceil-mode maxpool (faster_rcnn/resnet.py:113)."""

    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=0, ceil_mode=True)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
        mods = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            mods.append(TorchBottleneck(self.inplanes, planes))
        return tnn.Sequential(*mods)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer3(self.layer2(self.layer1(x)))


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.tensor(rng.randn(m.num_features) * 0.3,
                                                  dtype=torch.float32))
                m.running_var.copy_(torch.tensor(rng.rand(m.num_features) + 0.5,
                                                 dtype=torch.float32))
                m.weight.copy_(torch.tensor(rng.rand(m.num_features) + 0.5,
                                            dtype=torch.float32))
                m.bias.copy_(torch.tensor(rng.randn(m.num_features) * 0.2,
                                          dtype=torch.float32))


def test_resnet_base_forward_parity(rng):
    tmodel = TorchResNetBase()
    _randomize_bn_stats(tmodel, rng)
    tmodel.eval()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    tree = convert_resnet(sd, num_layers=50)

    from rlobjectdetection_tpu.models.backbones.resnet import ResNetBase

    model = ResNetBase(num_layers=50, dtype=jnp.float32)
    x = rng.randn(1, 3, 96, 128).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    variables = {"params": merge_pretrained(variables["params"], tree["base"])}

    with torch.no_grad():
        want = tmodel(torch.tensor(x)).numpy()          # [1, 1024, H/16, W/16]
    got = np.asarray(
        jax.jit(model.apply)(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    )
    got = np.transpose(got, (0, 3, 1, 2))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


class TorchVGGFeatures(tnn.Module):
    """torchvision vgg16 layout: features.{0,2,5,7,10,12,14,17,19,21,24,26,28}
    conv indices + classifier.{0,3} linears."""

    def __init__(self):
        super().__init__()
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512]
        layers = []
        in_c = 3
        for v in cfg:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers.append(tnn.Conv2d(in_c, v, 3, padding=1))
                layers.append(tnn.ReLU(inplace=True))
                in_c = v
        self.features = tnn.Sequential(*layers)       # NOTE: no final maxpool
        self.classifier = tnn.Sequential(
            tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(inplace=True), tnn.Dropout(),
            tnn.Linear(4096, 4096), tnn.ReLU(inplace=True), tnn.Dropout(),
            tnn.Linear(4096, 1000),
        )

    def forward(self, x):
        return self.features(x)


def test_vgg_base_forward_parity(rng):
    tmodel = TorchVGGFeatures()
    tmodel.eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    tree = convert_vgg16(sd)

    from rlobjectdetection_tpu.models.backbones.vgg import VGGBase, VGGHead

    model = VGGBase(dtype=jnp.float32)
    x = (rng.randn(1, 3, 96, 128).astype(np.float32)) * 0.1
    xn = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), xn)
    variables = {"params": merge_pretrained(variables["params"], tree["base"])}

    with torch.no_grad():
        want = tmodel(torch.tensor(x)).numpy()
    got = np.transpose(np.asarray(jax.jit(model.apply)(variables, xn)), (0, 3, 1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_vgg_head_parity(rng):
    """fc6/fc7 on NCHW-flattened pool5 must match torch's classifier[:6]."""
    tmodel = TorchVGGFeatures()
    tmodel.eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    tree = convert_vgg16(sd)

    from rlobjectdetection_tpu.models.backbones.vgg import VGGHead

    head = VGGHead(dtype=jnp.float32)
    pooled_nchw = rng.randn(3, 512, 7, 7).astype(np.float32) * 0.1
    pooled_nhwc = jnp.asarray(np.transpose(pooled_nchw, (0, 2, 3, 1)))
    params = jax.jit(lambda k, p: head.init(k, p, train=False))(
        jax.random.PRNGKey(0), pooled_nhwc
    )["params"]
    params = merge_pretrained({"params": params}, {"params": tree["head"]})["params"]

    with torch.no_grad():
        t = torch.tensor(pooled_nchw).reshape(3, -1)
        for layer in list(tmodel.classifier.children())[:6]:
            t = layer(t)
        want = t.numpy()
    got = np.asarray(head.apply({"params": params}, pooled_nhwc, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def _make_res_layer(inplanes, planes, blocks, stride=1):
    downsample = None
    if stride != 1 or inplanes != planes * 4:
        downsample = tnn.Sequential(
            tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(planes * 4),
        )
    mods = [TorchBottleneck(inplanes, planes, stride, downsample)]
    for _ in range(1, blocks):
        mods.append(TorchBottleneck(planes * 4, planes))
    return tnn.Sequential(*mods)


class TorchRPN(tnn.Module):
    """RPN head convs with the reference's names (rpn.py:28-36)."""

    def __init__(self, din=1024, num_anchors=9):
        super().__init__()
        self.RPN_Conv = tnn.Conv2d(din, 512, 3, 1, 1, bias=True)
        self.RPN_cls_score = tnn.Conv2d(512, num_anchors * 2, 1, 1, 0)
        self.RPN_bbox_pred = tnn.Conv2d(512, num_anchors * 4, 1, 1, 0)

    def forward(self, x):
        h = torch.relu(self.RPN_Conv(x))
        return self.RPN_cls_score(h), self.RPN_bbox_pred(h)


class TorchDetector(tnn.Module):
    """_fasterRCNN-shaped (resnet flavor) with the reference's state_dict key
    layout: RCNN_base Sequential(conv1,bn1,relu,maxpool,layer1..3), RCNN_top
    Sequential(layer4), RPN convs, cls/bbox Linears (resnet.py:229-247)."""

    def __init__(self, n_classes=4, layers=(3, 4, 6, 3), num_anchors=9):
        super().__init__()
        b = TorchResNetBase(layers)
        self.RCNN_base = tnn.Sequential(b.conv1, b.bn1, b.relu, b.maxpool,
                                        b.layer1, b.layer2, b.layer3)
        self.RCNN_top = tnn.Sequential(_make_res_layer(1024, 512, layers[3], stride=2))
        self.RCNN_rpn = TorchRPN(1024, num_anchors)
        self.RCNN_cls_score = tnn.Linear(2048, n_classes)
        self.RCNN_bbox_pred = tnn.Linear(2048, 4 * n_classes)


def test_full_detector_chain_parity(rng):
    """Every converted parameter of a full reference-layout checkpoint is
    exercised end-to-end: image → base → RPN conv maps, and (shared pooled
    features) → layer4 head → cls/bbox logits. VERDICT r1 item 2."""
    from tools.convert_torch_weights import convert_detector

    n_classes = 4
    tdet = TorchDetector(n_classes=n_classes)
    _randomize_bn_stats(tdet, rng)
    tdet.eval()
    sd = {k: v.numpy() for k, v in tdet.state_dict().items()}
    tree = convert_detector(sd, net="res50")

    from rlobjectdetection_tpu.config import Config
    from rlobjectdetection_tpu.models.faster_rcnn import FasterRCNN

    import dataclasses
    cfg = dataclasses.replace(Config(), DTYPE="float32")
    model = FasterRCNN(num_classes=n_classes, backbone="resnet50", cfg=cfg)

    def chain(m, img, pooled):
        feat = m.base(img)
        cls_map, bbox_map = m.rpn(feat)
        fc7 = m.head(pooled)
        return feat, cls_map, bbox_map, m.cls_score(fc7), m.bbox_pred(fc7)

    img = rng.randn(1, 3, 96, 128).astype(np.float32)
    pooled = (rng.randn(6, 7, 7, 1024) * 0.1).astype(np.float32)   # NHWC
    img_nhwc = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    variables = jax.jit(
        lambda k, a, b: model.init(k, a, b, method=chain)
    )(jax.random.PRNGKey(0), img_nhwc, jnp.asarray(pooled))
    variables = {"params": merge_pretrained(variables["params"], tree)}

    feat, cls_map, bbox_map, cls_logit, bbox_logit = jax.jit(
        lambda v, a, b: model.apply(v, a, b, method=chain)
    )(variables, img_nhwc, jnp.asarray(pooled))

    with torch.no_grad():
        tfeat = tdet.RCNN_base(torch.tensor(img))
        tcls_map, tbbox_map = tdet.RCNN_rpn(tfeat)
        tfc7 = tdet.RCNN_top(torch.tensor(
            np.transpose(pooled, (0, 3, 1, 2)))).mean(3).mean(2)
        tcls = tdet.RCNN_cls_score(tfc7).numpy()
        tbox = tdet.RCNN_bbox_pred(tfc7).numpy()

    def nchw(x):
        return np.transpose(np.asarray(x), (0, 3, 1, 2))

    np.testing.assert_allclose(nchw(feat), tfeat.numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(nchw(cls_map), tcls_map.numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(nchw(bbox_map), tbbox_map.numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(cls_logit), tcls, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(bbox_logit), tbox, rtol=1e-3, atol=2e-3)


def test_rl_net_conversion_parity(rng):
    """RL policy checkpoint conversion: stride-1 layer4 + fc8/fc heads
    (Reinforcement/resnet.py:105-125)."""
    from tools.convert_torch_weights import convert_rl

    class TorchRLNet(tnn.Module):
        def __init__(self, num_acts=56, layers=(3, 4, 6, 3)):
            super().__init__()
            b = TorchResNetBase(layers)
            self.conv1, self.bn1 = b.conv1, b.bn1
            self.layer1, self.layer2, self.layer3 = b.layer1, b.layer2, b.layer3
            self.layer4 = _make_res_layer(1024, 512, layers[3], stride=1)
            self.fc8 = tnn.Linear(2048, 4096)
            self.fc = tnn.Linear(4096, num_acts)

    tnet = TorchRLNet()
    _randomize_bn_stats(tnet, rng)
    tnet.eval()
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    tree = convert_rl(sd)
    assert set(tree) == {"base", "head", "fc8", "fc"}

    from rlobjectdetection_tpu.models.rl.policy import RLPolicyNet

    model = RLPolicyNet(num_acts=56, num_layers=50)

    def head_chain(m, pooled):
        h = m.head(pooled)
        return m.fc(jax.nn.relu(m.fc8(h)))

    pooled = (rng.randn(3, 7, 7, 1024) * 0.1).astype(np.float32)
    variables = jax.jit(
        lambda k, p: model.init(k, p, method=head_chain)
    )(jax.random.PRNGKey(0), jnp.asarray(pooled))
    variables = {"params": merge_pretrained(variables["params"], tree)}
    got = jax.jit(
        lambda v, p: model.apply(v, p, method=head_chain)
    )(variables, jnp.asarray(pooled))

    with torch.no_grad():
        t = tnet.layer4(torch.tensor(np.transpose(pooled, (0, 3, 1, 2))))
        t = t.mean(3).mean(2)
        want = tnet.fc(torch.relu(tnet.fc8(t))).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-3)


def test_conv1_s2d_equivalence(rng):
    """Space-to-depth stem (CONV1_S2D) matches the plain 7×7/2 conv exactly,
    including odd input sizes."""
    import jax.numpy as jnp
    from jax import lax

    from rlobjectdetection_tpu.models.backbones.resnet import conv1_space_to_depth

    for h, w in [(64, 96), (67, 93)]:
        x = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
        k = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.05)
        want = lax.conv_general_dilated(
            x, k, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = conv1_space_to_depth(x, k, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
