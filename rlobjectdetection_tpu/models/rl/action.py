"""RL action space: 56 discrete box perturbations.

Rebuild of /root/reference/lib/model/Reinforcement/action.py: 4 coords ×
len(delta) × 2 signs actions; `actDeltas[num_acts, 4]` scaled by alpha (l.16-22);
`move_from_act` greedy top-k action selection with teacher-forced moves
(boxes move only when the target says the action helps, l.25-59) returning
precision@k.

`move_from_act` here is a single vectorized pass (argmax-action + top-k box
ranking + masked scatter) rather than the reference's python walk over the
flattened score sort — identical outputs including tie-breaking.
"""

from __future__ import annotations

import numpy as np


def identify(x):
    return x


class Action:
    def __init__(self, delta, alpha: float = 1.0, iou_thres: float = 0.0, wtrans=None):
        self.delta = list(delta)
        self.alpha = alpha
        self.iou_thres = iou_thres
        self.num_acts = 4 * len(delta) * 2
        self.wtrans = identify if wtrans is None else wtrans
        # action table built in one shot: per coord, magnitudes interleaved
        # +δ0, -δ0, +δ1, -δ1, ... (the reference's enumeration order) on that
        # coord's column, zeros elsewhere
        mags = np.asarray(self.delta, np.float32) * alpha
        signed = (mags[:, None] * np.array([1.0, -1.0], np.float32)).ravel()
        per_coord = signed[:, None, None] * np.eye(4, dtype=np.float32)[None, :, :]
        self.actDeltas = per_coord.transpose(2, 0, 1).reshape(self.num_acts, 4)

    def move_from_act(self, bboxes: np.ndarray, preds: np.ndarray,
                      targets: np.ndarray, maxk: int):
        """Teacher-forced greedy refinement (semantics of Reinforcement/
        action.py:25-59), fully vectorized.

        bboxes [B, N, 4] xywh (mutated in place, as callers expect);
        preds/targets [B, N, num_acts]. Returns (bboxes, precision@maxk·100).

        Equivalence to the reference's flattened descending-score walk: a box
        is processed the first time any of its (box, action) scores appears in
        that walk, i.e. the top-maxk boxes ranked by their best action score,
        each paired with its own best action. On exact score ties the
        reference's order is unspecified (plain np.argsort + flip); here ties
        break deterministically toward the LARGER flattened index, both in the
        per-box action choice and in the box ranking. Oracle-tested equal to
        the reference module on tie-free scores (tests/test_eval_oracle.py).
        """
        b, n, _ = bboxes.shape
        assert preds.shape == targets.shape == (b, n, self.num_acts)
        # Per-box best action with reverse-index tie-breaking.
        act = self.num_acts - 1 - np.argmax(preds[:, :, ::-1], axis=2)   # [B, N]
        score = np.take_along_axis(preds, act[:, :, None], axis=2)[..., 0]
        # Box processing order: descending score; equal scores toward the box
        # whose flattened (box·A + act) position is larger.
        flat_pos = np.arange(n)[None, :] * self.num_acts + act
        by_pos = np.argsort(-flat_pos, axis=1, kind="stable")
        by_score = np.argsort(-np.take_along_axis(score, by_pos, axis=1),
                              axis=1, kind="stable")
        order = np.take_along_axis(by_pos, by_score, axis=1)             # [B, N]

        top = order[:, : min(maxk, n)]                                   # [B, K]
        top_act = np.take_along_axis(act, top, axis=1)                   # [B, K]
        tgt = np.take_along_axis(
            np.take_along_axis(targets, top[:, :, None], axis=1),
            top_act[:, :, None], axis=2,
        )[..., 0]
        helped = tgt == 1                                                # [B, K]

        cur = np.take_along_axis(bboxes, top[:, :, None], axis=1)        # [B, K, 4]
        step = self.actDeltas[top_act] * cur[:, :, [2, 3, 2, 3]]
        np.put_along_axis(bboxes, top[:, :, None],
                          cur + np.where(helped[:, :, None], step, 0.0), axis=1)
        return bboxes, int(helped.sum()) * 100.0 / (b * maxk)

    def move_predicted(self, bboxes: np.ndarray, preds: np.ndarray, maxk: int):
        """Deployment-mode variant (no teacher forcing): move each of the top-k
        boxes by its own argmax action. The committed reference eval is
        teacher-forced (and crashes — SURVEY.md §2.7); this is the spec-repaired
        free-running counterpart."""
        out = bboxes.copy()
        b, n, _ = bboxes.shape
        for bid in range(b):
            order = np.argsort(-preds[bid].max(axis=1), kind="stable")[:maxk]
            for idx in order:
                act_id = int(np.argmax(preds[bid][idx]))
                x, y, w, h = out[bid][idx]
                out[bid][idx] += self.actDeltas[act_id] * np.array([w, h, w, h])
        return out
