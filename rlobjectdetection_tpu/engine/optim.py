"""Optimizer construction with the reference's per-param-group semantics.

Rebuild of RCNN_bases/trainval_net.py:262-276: SGD(momentum=0.9) where biases
get 2× learning rate (TRAIN.DOUBLE_BIAS) and no weight decay (TRAIN.BIAS_DECAY
False), weights get TRAIN.WEIGHT_DECAY; frozen parameters (fixed backbone
blocks + all frozen-BN constants) receive no updates at all. Step-decay LR
(×GAMMA every lr_decay_step epochs, trainval_net.py:307-310) is an optax
schedule. Global-norm grad clipping (net_utils.clip_gradient, used for VGG at
clip=10, trainval_net.py:331-332) is optional.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..models.backbones.resnet import resnet_param_trainable
from ..models.backbones.vgg import vgg_param_trainable


def param_labels(params, backbone: str, fixed_blocks: int = 1):
    """Label each param leaf 'frozen' | 'weight' | 'bias'."""

    def label_of(path):
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        # backbone freezing
        if keys and keys[0] == "base":
            sub = keys[1:]
            if backbone == "vgg16":
                # VGG freeze depth is fixed by the reference (conv blocks 1-2
                # always, vgg16.py:41-42); RESNET.FIXED_BLOCKS does not apply
                if not vgg_param_trainable(sub, fixed_blocks=2):
                    return "frozen"
            elif backbone.startswith("resnet"):
                if not resnet_param_trainable(sub, fixed_blocks=fixed_blocks):
                    return "frozen"
            # 'tiny' (test backbone): nothing frozen
        # frozen BN constants anywhere (head layer4 included)
        if any(k.startswith("bn") or k.endswith("_bn") for k in keys):
            return "frozen"
        if keys and keys[-1] in ("mean", "var"):
            return "frozen"
        if keys and keys[-1] == "bias":
            return "bias"
        return "weight"

    return jax.tree_util.tree_map_with_path(lambda p, _: label_of(p), params)


def make_lr_schedule(base_lr: float, decay_step_iters: int, gamma: float = 0.1):
    """Step decay every decay_step_iters optimizer steps."""

    def schedule(count):
        n = count // decay_step_iters
        return base_lr * (gamma ** n)

    return schedule


def build_optimizer(
    params,
    backbone: str,
    base_lr: float,
    *,
    momentum: float = 0.9,
    weight_decay: float = 0.0005,
    double_bias: bool = True,
    bias_decay: bool = False,
    fixed_blocks: int = 1,
    lr_schedule: Callable | None = None,
    clip_norm: float | None = None,
):
    labels = param_labels(params, backbone, fixed_blocks)
    sched = lr_schedule or (lambda _: base_lr)

    def sgd(lr_mult: float, wd: float):
        chain = []
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.trace(decay=momentum, nesterov=False))
        chain.append(optax.scale_by_schedule(lambda c: -sched(c) * lr_mult))
        return optax.chain(*chain)

    tx = optax.multi_transform(
        {
            "weight": sgd(1.0, weight_decay),
            "bias": sgd(2.0 if double_bias else 1.0, weight_decay if bias_decay else 0.0),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    if clip_norm is not None:
        # trainable-only global norm: the reference clips over params that
        # have grads (net_utils.clip_gradient); including frozen leaves would
        # shrink trainable updates whenever the frozen norm dominates AND
        # keep the frozen backward alive (set_to_zero otherwise lets XLA
        # delete it)
        trainable = jax.tree_util.tree_map(lambda l: l != "frozen", labels)
        tx = optax.chain(
            optax.masked(optax.clip_by_global_norm(clip_norm), trainable), tx)
    return tx, labels


def count_trainable(labels) -> dict:
    counts = {"weight": 0, "bias": 0, "frozen": 0}
    for leaf in jax.tree_util.tree_leaves(labels):
        counts[leaf] += 1
    return counts
