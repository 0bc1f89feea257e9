"""On-device, static-shape NMS (greedy, axis-aligned or rotated BEV).

Replaces the reference's per-frame device->host round trip
(second/pytorch/core/box_torch_ops.py:454-515, which copies predictions
to CPU/numpy and calls native NMS kernels every eval frame) and the
numba-CUDA bitmask kernels (nms_gpu.py:35-477).  Here the whole decode
-> score-gate -> top-k -> IoU matrix -> greedy-suppress pipeline is
jitted XLA with fixed shapes, so it fuses into the eval step.

Greedy suppression is inherently sequential in the candidate rank; we
run it as a fori_loop over the top-`pre_max_size` candidates with
vectorized mask updates (O(n^2) work like the reference's bitmask
kernel, with n = pre_max_size <= 1000).
"""

import functools

import jax
import jax.numpy as jnp

from ..core.rotated_iou import box_to_corners, rotated_intersection_area
from . import box_ops_jax


def _standup_iou(boxes_standup):
    """Pairwise IoU of [N, 4] xyxy boxes (eps=0 convention)."""
    b = boxes_standup
    iw = jnp.minimum(b[:, None, 2], b[None, :, 2]) - jnp.maximum(
        b[:, None, 0], b[None, :, 0]
    )
    ih = jnp.minimum(b[:, None, 3], b[None, :, 3]) - jnp.maximum(
        b[:, None, 1], b[None, :, 1]
    )
    inter = jnp.clip(iw, 0, None) * jnp.clip(ih, 0, None)
    area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.where(union <= 0, 1.0, union)


def _rotated_iou_pairwise(boxes):
    """Pairwise rotated IoU of [N, 5] (x, y, w, l, r) boxes.

    Uses the tiled Pallas kernel on TPU (whole clipping pipeline in
    VMEM); falls back to the fused jnp formulation elsewhere.
    """
    from . import pallas_iou

    if pallas_iou.available():
        return pallas_iou.rotated_iou_matrix_pallas(boxes, boxes)
    corners = box_to_corners(boxes, xp=jnp)  # [N, 4, 2]
    n = boxes.shape[0]
    c1 = jnp.broadcast_to(corners[:, None], (n, n, 4, 2))
    c2 = jnp.broadcast_to(corners[None, :], (n, n, 4, 2))
    inter = rotated_intersection_area(c1, c2, xp=jnp)
    area = boxes[:, 2] * boxes[:, 3]
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.where(union <= 0, 1.0, union)


def _greedy_suppress(iou, valid, iou_threshold):
    """Greedy NMS over score-sorted candidates.

    iou: [n, n] pairwise IoU in score order; valid: [n] candidate mask.
    Returns keep mask [n].
    """
    from . import pallas_nms

    if pallas_nms.available():
        # one-kernel VMEM sweep (the XLA fori_loop pays ~4us dispatch
        # per iteration; measured 3.9ms -> <0.5ms at n=1000)
        return pallas_nms.greedy_suppress_pallas(iou, valid, iou_threshold)
    n = iou.shape[0]
    suppress = iou > iou_threshold

    def body(i, state):
        alive, keep = state
        take = alive[i]
        keep = keep.at[i].set(take)
        alive = alive & ~(take & suppress[i])
        alive = alive.at[i].set(False)
        return alive, keep

    keep0 = jnp.zeros((n,), dtype=bool)
    # unrolling amortizes TPU loop-dispatch overhead over the inherently
    # sequential scan (~4x faster at n=1000)
    _, keep = jax.lax.fori_loop(0, n, body, (valid, keep0), unroll=8)
    return keep


@functools.partial(
    jax.jit, static_argnames=("pre_max_size", "post_max_size", "rotated")
)
def nms_bev(boxes,
            scores,
            pre_max_size,
            post_max_size,
            iou_threshold,
            score_threshold=0.0,
            rotated=True):
    """Static-shape BEV NMS.

    Args:
        boxes: [A, 5] (x, y, w, l, r) BEV boxes.
        scores: [A] scores (may contain -inf for masked anchors).
        pre_max_size / post_max_size: static candidate caps.
        iou_threshold: suppression threshold.
        score_threshold: minimum score to be a candidate.
        rotated: exact rotated IoU vs standup-box IoU (reference
            use_rotate_nms switch).

    Returns:
        indices: [post_max_size] int32 into the A axis (-1 padding);
        valid: [post_max_size] bool.
    """
    num = boxes.shape[0]
    k = min(pre_max_size, num)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    # traced-safe: threshold only active when > 0 (reference semantics,
    # voxelnet.py:560-569); -inf rows are masked anchors either way
    cand_valid = jnp.where(
        jnp.asarray(score_threshold) > 0.0,
        top_scores >= score_threshold,
        top_scores > -jnp.inf,
    )
    cand_boxes = boxes[top_idx]

    if rotated:
        iou = _rotated_iou_pairwise(cand_boxes)
    else:
        corners = box_to_corners(cand_boxes, xp=jnp)
        standup = box_ops_jax.corner_to_standup(corners)
        iou = _standup_iou(standup)

    keep = _greedy_suppress(iou, cand_valid, iou_threshold)
    sel = jnp.nonzero(keep, size=post_max_size, fill_value=-1)[0]
    sel_valid = sel >= 0
    indices = jnp.where(sel_valid, top_idx[jnp.maximum(sel, 0)], -1)
    return indices.astype(jnp.int32), sel_valid
