#!/usr/bin/env python
"""Convert torch checkpoints (caffe-pretrained backbones or reference detector
checkpoints) into this framework's param pytree.

The reference loads vgg16_caffe.pth / resnet101_caffe.pth
(/root/reference/lib/model/faster_rcnn/{vgg16.py:21,resnet.py:224}, README.md:137-147);
this tool maps those state_dicts onto our flax trees:

  torch Conv2d weight [O, I, kH, kW]  → flax Conv kernel [kH, kW, I, O]
  torch Linear weight [O, I]          → flax Dense kernel [I, O]
  torch BatchNorm {weight, bias, running_mean, running_var}
                                      → FrozenBatchNorm {scale, bias, mean, var}

Run: python tools/convert_torch_weights.py --src vgg16_caffe.pth --net vgg16 --out ckpt_dir
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def conv_w(t):
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def dense_w(t):
    return np.transpose(np.asarray(t), (1, 0))


def convert_vgg16(sd):
    """torchvision vgg16 state_dict → {base: ..., head: ...}."""
    # features conv indices in torchvision vgg16
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    names = [
        "conv1_1", "conv1_2", "conv2_1", "conv2_2",
        "conv3_1", "conv3_2", "conv3_3",
        "conv4_1", "conv4_2", "conv4_3",
        "conv5_1", "conv5_2", "conv5_3",
    ]
    base = {}
    for idx, name in zip(conv_idx, names):
        base[name] = {
            "kernel": conv_w(sd[f"features.{idx}.weight"]),
            "bias": np.asarray(sd[f"features.{idx}.bias"]),
        }
    head = {
        "fc6": {"kernel": dense_w(sd["classifier.0.weight"]),
                "bias": np.asarray(sd["classifier.0.bias"])},
        "fc7": {"kernel": dense_w(sd["classifier.3.weight"]),
                "bias": np.asarray(sd["classifier.3.bias"])},
    }
    return {"base": base, "head": head}


def _bn(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def convert_resnet(sd, num_layers=101):
    """torch resnet state_dict → {base: conv1..layer3, head: layer4}."""
    specs = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[num_layers]
    base = {
        "conv1": {"kernel": conv_w(sd["conv1.weight"])},
        "bn1": _bn(sd, "bn1"),
    }

    def one_block(name, b):
        blk = {}
        for ci in (1, 2, 3):
            blk[f"conv{ci}"] = {"kernel": conv_w(sd[f"{name}.{b}.conv{ci}.weight"])}
            blk[f"bn{ci}"] = _bn(sd, f"{name}.{b}.bn{ci}")
        if f"{name}.{b}.downsample.0.weight" in sd:
            blk["downsample_conv"] = {
                "kernel": conv_w(sd[f"{name}.{b}.downsample.0.weight"])
            }
            blk["downsample_bn"] = _bn(sd, f"{name}.{b}.downsample.1")
        return blk

    def layer(name, blocks):
        return {f"block{b}": one_block(name, b) for b in range(blocks)}

    base["layer1"] = layer("layer1", specs[0])
    base["layer2"] = layer("layer2", specs[1])
    base["layer3"] = layer("layer3", specs[2])
    out = {"base": base}
    if "layer4.0.conv1.weight" in sd:  # base-only dumps have no head
        out["head"] = {"layer4": layer("layer4", specs[3])}
    return out


def _linear(sd, prefix):
    return {"kernel": dense_w(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _conv(sd, prefix):
    out = {"kernel": conv_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def convert_rpn(sd, prefix="RCNN_rpn."):
    """RPN head convs (reference rpn.py:28-36) → RPNHead params.

    Channel layouts carry over directly: the 2A cls channels stay [A bg, A fg]
    and the 4A bbox channels stay A groups of (dx, dy, dw, dh) — our RPNHead
    consumes NCHW-checkpoint channel order (models/rpn.py:13-15).
    """
    return {
        "RPN_Conv": _conv(sd, prefix + "RPN_Conv"),
        "RPN_cls_score": _conv(sd, prefix + "RPN_cls_score"),
        "RPN_bbox_pred": _conv(sd, prefix + "RPN_bbox_pred"),
    }


def convert_detector(sd, net="res101"):
    """Full reference detector checkpoint (the 'model' state_dict saved at
    RCNN_bases/trainval_net.py:374-394) → complete FasterRCNN param tree:
    backbone + RPN convs + RCNN_cls_score/RCNN_bbox_pred heads, so a
    reference-trained .pth is evaluable here (test_net.py:169-172 flow).

    Key layout (resnet.py:238-247 / vgg16.py:29-53):
      RCNN_base.{0,1,4,5,6} → conv1, bn1, layer1..3     (resnet)
      RCNN_base.{i}         → features.{i}              (vgg, indices unchanged)
      RCNN_top.0 / RCNN_top.{0,3} → layer4 / fc6, fc7
      RCNN_rpn.*, RCNN_cls_score, RCNN_bbox_pred → heads
    """
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    if net == "vgg16":
        remapped = {}
        for k, v in sd.items():
            if k.startswith("RCNN_base."):
                remapped["features." + k[len("RCNN_base."):]] = v
            elif k.startswith("RCNN_top."):
                remapped["classifier." + k[len("RCNN_top."):]] = v
        tree = convert_vgg16(remapped)
    else:
        num_layers = {"res50": 50, "res101": 101, "res152": 152}[net]
        seq_map = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
                   "6": "layer3"}
        remapped = {}
        for k, v in sd.items():
            if k.startswith("RCNN_base."):
                idx, rest = k[len("RCNN_base."):].split(".", 1)
                remapped[f"{seq_map[idx]}.{rest}"] = v
            elif k.startswith("RCNN_top.0."):
                remapped["layer4." + k[len("RCNN_top.0."):]] = v
        tree = convert_resnet(remapped, num_layers)

    params = {"base": tree["base"], "rpn": convert_rpn(sd)}
    if "head" in tree:
        params["head"] = tree["head"]
    if "RCNN_cls_score.weight" in sd:
        params["RCNN_cls_score"] = _linear(sd, "RCNN_cls_score")
        params["RCNN_bbox_pred"] = _linear(sd, "RCNN_bbox_pred")
    return params


def convert_rl(sd):
    """Reference RL policy checkpoint (Reinforcement/resnet.py:105-125;
    saved as {'epoch','state_dict'} at trainval_net.py:159-172) →
    RLPolicyNet params: conv1..layer3 → base, layer4 → head, fc8/fc heads."""
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    tree = convert_resnet(sd, num_layers=101 if "layer3.22.conv1.weight" in sd
                          else 50)
    params = {"base": tree["base"], "head": tree["head"],
              "fc8": _linear(sd, "fc8"), "fc": _linear(sd, "fc")}
    return params


def merge_pretrained(params, pretrained):
    """Graft pretrained subtrees into an initialized param tree where paths and
    shapes match (the strict=False load of the reference)."""
    import jax

    params = jax.tree_util.tree_map(lambda x: x, params)

    def merge(dst, src, path=""):
        for k, v in src.items():
            if k not in dst:
                print(f"skip (missing): {path}{k}")
                continue
            if isinstance(v, dict):
                merge(dst[k], v, path + k + "/")
            else:
                if tuple(dst[k].shape) == tuple(np.shape(v)):
                    dst[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)
                else:
                    print(f"skip (shape): {path}{k} {dst[k].shape} vs {np.shape(v)}")

    merge(params, pretrained)
    return params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help=".pth state_dict")
    p.add_argument("--net", required=True, choices=["vgg16", "res50", "res101", "res152", "rl"])
    p.add_argument("--out", required=True, help="output orbax checkpoint dir")
    args = p.parse_args()

    import torch

    sd = torch.load(args.src, map_location="cpu")
    for wrap in ("model", "state_dict"):   # full detector / RL checkpoint dicts
        if wrap in sd:
            sd = sd[wrap]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    if args.net == "rl":
        tree = convert_rl(sd)
    elif any(k.startswith(("RCNN_base.", "module.RCNN_base.")) for k in sd):
        tree = convert_detector(sd, args.net)   # trained detector checkpoint
    elif args.net == "vgg16":
        tree = convert_vgg16(sd)                # caffe-pretrained backbone
    else:
        layers = {"res50": 50, "res101": 101, "res152": 152}[args.net]
        tree = convert_resnet(sd, layers)

    from rlobjectdetection_tpu.engine.checkpoint import save_params

    save_params(args.out, tree)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
