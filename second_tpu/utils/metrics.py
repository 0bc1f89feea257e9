"""Streaming training metrics (reference torchplus/metrics.py:7-281 +
VoxelNet.update_metrics, voxelnet.py:654-686).

Device side: ``classification_metrics`` computes the per-batch
sufficient statistics (TP/FP/FN per threshold, correct/total) inside
the jitted train step.  Host side: ``RunningMetrics`` accumulates them
between ``clear`` calls (the reference clears every epoch when
``clear_metrics_every_epoch`` is set).
"""

import jax.numpy as jnp
import numpy as np

DEFAULT_THRESHOLDS = (0.1, 0.3, 0.5, 0.7, 0.8, 0.9, 0.95)


def classification_metrics(cls_preds, labels, thresholds=DEFAULT_THRESHOLDS,
                           encode_background_as_zeros=True):
    """Per-batch stats. cls_preds [B, A, C] logits, labels [B, A].

    Returns dict of scalars/arrays (device): accuracy statistics over
    cared anchors and PR counts at each threshold (foreground iou of
    scores like the reference's sigmoid-score metrics).
    """
    cared = labels >= 0
    if encode_background_as_zeros:
        scores = jnp.max(jnp.asarray(jnp.reciprocal(1 + jnp.exp(-cls_preds))),
                         axis=-1)
        pred_labels = jnp.argmax(cls_preds, axis=-1) + 1
    else:
        probs = jnp.exp(cls_preds - cls_preds.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        scores = 1.0 - probs[..., 0]
        pred_labels = jnp.argmax(cls_preds, axis=-1)
    positives = labels > 0
    num_cared = jnp.maximum(cared.sum(), 1)

    out = {}
    th = jnp.asarray(thresholds)
    score_pos = scores[None] >= th[:, None, None]  # [T, B, A]
    actual_pos = positives[None] & cared[None]
    pred_pos = score_pos & cared[None]
    tp = (pred_pos & actual_pos).sum(axis=(1, 2))
    fp = (pred_pos & ~actual_pos).sum(axis=(1, 2))
    fn = (~pred_pos & actual_pos).sum(axis=(1, 2))
    # accuracy at threshold 0.5-equivalent: predicted fg label correct
    is_fg = scores >= 0.5
    pred_cls = jnp.where(is_fg, pred_labels, 0)
    correct = ((pred_cls == labels) & cared).sum()
    out["prec_tp"] = tp
    out["prec_fp"] = fp
    out["prec_fn"] = fn
    out["acc_correct"] = correct
    out["acc_total"] = num_cared
    return out


class RunningMetrics:
    """Host accumulator for the device stats above."""

    def __init__(self, thresholds=DEFAULT_THRESHOLDS):
        self.thresholds = thresholds
        self.clear()

    def clear(self):
        n = len(self.thresholds)
        self._tp = np.zeros(n, np.int64)
        self._fp = np.zeros(n, np.int64)
        self._fn = np.zeros(n, np.int64)
        self._correct = 0
        self._total = 0

    def update(self, stats):
        self._tp += np.asarray(stats["prec_tp"])
        self._fp += np.asarray(stats["prec_fp"])
        self._fn += np.asarray(stats["prec_fn"])
        self._correct += int(stats["acc_correct"])
        self._total += int(stats["acc_total"])

    def value(self):
        prec = self._tp / np.maximum(self._tp + self._fp, 1)
        rec = self._tp / np.maximum(self._tp + self._fn, 1)
        out = {"acc": self._correct / max(self._total, 1)}
        for i, t in enumerate(self.thresholds):
            out[f"prec@{t}"] = float(prec[i])
            out[f"rec@{t}"] = float(rec[i])
        return out
