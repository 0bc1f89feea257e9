"""Host (numpy) NMS variants.

The device path (ops/nms.py + ops/pallas_nms.py) covers everything the
shipped configs use; this module provides the remaining reference CPU
surface: greedy standup NMS (spec: nms_cpu.py:31-61 ``nms_jit``) and
soft-NMS (spec: second/core/non_max_suppression/nms_cpu.py:64-154
``soft_nms_jit`` — linear / gaussian / hard decay), re-derived
vectorized over the suppression pass instead of the reference's
pairwise scalar loops.

Boxes here are axis-aligned standup rectangles [N, 4] (x1, y1, x2, y2);
the legacy +1 pixel-area convention of the reference kernels is kept so
outputs match numerically.
"""

import numpy as np


def _iou_row(box, boxes, eps=1.0):
    """IoU of one box against [M, 4] boxes (legacy +eps pixel areas)."""
    iw = np.minimum(box[2], boxes[:, 2]) - np.maximum(box[0], boxes[:, 0]) + eps
    ih = np.minimum(box[3], boxes[:, 3]) - np.maximum(box[1], boxes[:, 1]) + eps
    iw = np.maximum(iw, 0.0)
    ih = np.maximum(ih, 0.0)
    inter = iw * ih
    area = (box[2] - box[0] + eps) * (box[3] - box[1] + eps)
    areas = (boxes[:, 2] - boxes[:, 0] + eps) * (boxes[:, 3] - boxes[:, 1] + eps)
    return inter / (area + areas - inter)


def nms(dets, thresh, eps=1.0):
    """Greedy standup NMS. dets: [N, 5] (x1, y1, x2, y2, score).

    Returns kept indices, score-descending (nms_jit semantics,
    nms_cpu.py:31-61).
    """
    dets = np.asarray(dets, np.float64)
    # reference tie ordering: scores.argsort()[::-1] puts the LAST of
    # equal scores first (nms_cpu.py:40)
    order = np.argsort(dets[:, 4], kind="stable")[::-1]
    boxes = dets[order, :4]
    n = len(order)
    alive = np.ones(n, bool)
    keep = []
    for i in range(n):
        if not alive[i]:
            continue
        keep.append(int(order[i]))
        if i + 1 < n:
            iou = _iou_row(boxes[i], boxes[i + 1:], eps=eps)
            # reference suppresses on ovr >= thresh (nms_cpu.py:58)
            alive[i + 1:] &= iou < thresh
    return keep


def soft_nms(boxes, scores, sigma=0.5, nt=0.3, threshold=0.001, method=0,
             eps=1.0):
    """Soft-NMS over standup boxes.

    boxes: [N, 4] (x1, y1, x2, y2); scores: [N].
    method 0: hard suppression at IoU > nt (classic NMS);
    method 1: linear decay 1 - IoU when IoU > nt;
    method 2: gaussian decay exp(-IoU^2 / sigma).
    Matches soft_nms_jit (nms_cpu.py:64-154): iteratively promote the
    highest remaining score, decay the rest against it, and drop boxes
    whose decayed score falls below ``threshold``.

    Returns (keep_indices, kept_scores): original indices in selection
    order with their (possibly decayed) scores.
    """
    boxes = np.asarray(boxes, np.float64)
    scores = np.asarray(scores, np.float64).copy()
    n = len(scores)
    idx = np.arange(n)
    alive = np.ones(n, bool)
    keep = []
    kept_scores = []
    for _ in range(n):
        if not alive.any():
            break
        live = idx[alive]
        i = live[np.argmax(scores[live])]
        keep.append(int(i))
        kept_scores.append(float(scores[i]))
        alive[i] = False
        rest = idx[alive]
        if rest.size == 0:
            break
        iou = _iou_row(boxes[i], boxes[rest], eps=eps)
        if method == 1:  # linear
            weight = np.where(iou > nt, 1.0 - iou, 1.0)
        elif method == 2:  # gaussian
            weight = np.exp(-(iou * iou) / sigma)
        else:  # hard
            weight = np.where(iou > nt, 0.0, 1.0)
        scores[rest] *= weight
        alive[rest] &= scores[rest] >= threshold
    return keep, kept_scores
