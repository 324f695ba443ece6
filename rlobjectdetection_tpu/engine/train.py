"""Training engine: one jitted step, sharded over the mesh.

Rebuild of the training loops in RCNN_bases/trainval_net.py:300-397 and
trainval_net.py:265-307. The reference's step = H2D copies + forward (with
no-grad numpy target layers) + backward + clip + SGD; here the entire step —
including proposal generation, NMS, and target sampling — is one compiled XLA
program. Loss is the mean-summed four-term total (RCNN_bases/trainval_net.py:324-325).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.faster_rcnn import FasterRCNN


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model: FasterRCNN, tx, sample_batch, seed: int = 3):
    """Initialize params with a sample batch (shapes only matter)."""
    key = jax.random.PRNGKey(seed)
    init_rngs = {"params": key, "sampling": key, "dropout": key}
    variables = model.init(
        init_rngs,
        jnp.asarray(sample_batch["data"]),
        jnp.asarray(sample_batch["im_info"]),
        jnp.asarray(sample_batch["gt_boxes"]),
        jnp.asarray(sample_batch["num_boxes"]),
        train=True,
    )
    params = variables["params"]
    opt_state = tx.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.int32(0))


def make_train_step(model: FasterRCNN, tx, skip_nonfinite: bool = False,
                    donate: bool = False):
    """Returns train_step(state, batch, rng) → (state, metrics), jittable.

    Under a sharded batch + replicated params, XLA inserts the gradient
    all-reduce (the DataParallel loss `.mean()` of
    RCNN_bases/trainval_net.py:324 becomes a psum over the mesh for free).

    skip_nonfinite=True keeps the old params whenever the gradients contain
    NaN/Inf (utils/guards.py) — the TPU-native replacement for the reference's
    nonexistent failure detection (SURVEY.md §5).
    """

    def loss_fn(params, batch, rng):
        k_samp, k_drop = jax.random.split(rng)
        out = model.apply(
            {"params": params},
            batch["data"], batch["im_info"], batch["gt_boxes"], batch["num_boxes"],
            train=True,
            rngs={"sampling": k_samp, "dropout": k_drop},
        )
        loss = (
            out["rpn_loss_cls"] + out["rpn_loss_box"]
            + out["rcnn_loss_cls"] + out["rcnn_loss_bbox"]
        )
        fg_cnt = (out["rois_label"] > 0).sum()
        bg_cnt = (out["rois_label"] == 0).sum()
        metrics = {
            "loss": loss,
            "rpn_cls": out["rpn_loss_cls"],
            "rpn_box": out["rpn_loss_box"],
            "rcnn_cls": out["rcnn_loss_cls"],
            "rcnn_box": out["rcnn_loss_bbox"],
            "fg_cnt": fg_cnt,
            "bg_cnt": bg_cnt,
        }
        return loss, metrics

    # donate=True reuses the state buffers for the outputs (halves the
    # train-state HBM footprint) but currently triggers a pathological XLA
    # compile-time blowup on the v5e toolchain in this image — opt-in only.
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if skip_nonfinite:
            from ..utils.guards import finite_mask, skip_nonfinite_update

            params, opt_state = skip_nonfinite_update(
                state.params, params, grads, state.opt_state, opt_state)
            metrics["skipped"] = (~finite_mask(grads)).astype(jnp.float32)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_forward_fn(model: FasterRCNN):
    """Inference forward (eval path of _fasterRCNN.forward)."""

    @jax.jit
    def forward(params, data, im_info):
        return model.apply({"params": params}, data, im_info, train=False)

    return forward
