"""Jitted loss functions.

Formula parity with the reference loss zoo
(second/pytorch/core/losses.py): TF-compatible elementwise sigmoid CE,
sigmoid/softmax focal losses, weighted smooth-L1 with sigma +
per-dimension code weights, weighted softmax (direction head), and the
loss-weight preparation / sin-difference machinery from
second/pytorch/models/voxelnet.py:704-830.

All functions are pure and shape-polymorphic: [B, A, ...] in, per-anchor
losses out; reduction happens in the model's loss assembly.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def sigmoid_cross_entropy_with_logits(logits, labels):
    """Elementwise TF-style stable sigmoid CE."""
    return (
        jnp.clip(logits, 0, None)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def softmax_cross_entropy_with_logits(logits, labels_onehot):
    """CE against the argmax of a one-hot target (reference parity)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    hard = jnp.argmax(labels_onehot, axis=-1)
    return -jnp.take_along_axis(log_probs, hard[..., None], axis=-1)[..., 0]


def weighted_smooth_l1_loss(preds, targets, weights=None, sigma=3.0,
                            code_weights=None, codewise=True):
    """[B, A, C] -> [B, A, C] (codewise) or [B, A]."""
    diff = preds - targets
    if code_weights is not None:
        diff = jnp.asarray(code_weights, preds.dtype).reshape(1, 1, -1) * diff
    abs_diff = jnp.abs(diff)
    thresh = 1.0 / (sigma**2)
    loss = jnp.where(
        abs_diff <= thresh,
        0.5 * jnp.square(abs_diff * sigma),
        abs_diff - 0.5 * thresh,
    )
    if codewise:
        if weights is not None:
            loss = loss * weights[..., None]
        return loss
    loss = loss.sum(axis=-1)
    if weights is not None:
        loss = loss * weights
    return loss


def weighted_l2_loss(preds, targets, weights=None, code_weights=None):
    diff = preds - targets
    if code_weights is not None:
        diff = jnp.asarray(code_weights, preds.dtype).reshape(1, 1, -1) * diff
    if weights is not None:
        diff = diff * weights[..., None]
    return (0.5 * diff * diff).sum(axis=-1)


def sigmoid_focal_loss(preds, targets_onehot, weights=None, gamma=2.0, alpha=0.25):
    """[B, A, C] logits + one-hot targets -> [B, A, C] losses."""
    ce = sigmoid_cross_entropy_with_logits(preds, targets_onehot)
    probs = jax.nn.sigmoid(preds)
    p_t = targets_onehot * probs + (1 - targets_onehot) * (1 - probs)
    mod = jnp.power(1.0 - p_t, gamma) if gamma else 1.0
    if alpha is not None:
        alpha_w = targets_onehot * alpha + (1 - targets_onehot) * (1 - alpha)
    else:
        alpha_w = 1.0
    loss = mod * alpha_w * ce
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def softmax_focal_loss(preds, targets_onehot, weights=None, gamma=2.0, alpha=0.25):
    per_row_ce = softmax_cross_entropy_with_logits(preds, targets_onehot)
    probs = jax.nn.softmax(preds, axis=-1)
    p_t = (targets_onehot * probs).sum(axis=-1)
    mod = jnp.power(1.0 - p_t, gamma) if gamma else 1.0
    alpha_w = 1.0
    if alpha is not None:
        # alpha on foreground rows (non-background argmax), reference parity
        is_fg = jnp.argmax(targets_onehot, axis=-1) >= 1
        alpha_w = jnp.where(is_fg, alpha, 1 - alpha)
    loss = mod * alpha_w * per_row_ce
    if weights is not None:
        loss = loss * weights
    return loss


def bootstrapped_sigmoid_loss(preds, targets_onehot, weights=None,
                              alpha=0.5, hard_bootstrap=False):
    """Bootstrapped sigmoid CE (Reed et al. 2015; reference
    losses.py:395-452): targets are a convex mix of labels and the
    model's own (hard or soft) predictions."""
    probs = jax.nn.sigmoid(preds)
    if hard_bootstrap:
        boot = (probs > 0.5).astype(preds.dtype)
    else:
        boot = probs
    mixed = alpha * targets_onehot + (1 - alpha) * boot
    loss = sigmoid_cross_entropy_with_logits(preds, mixed)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_sigmoid_loss(preds, targets_onehot, weights=None):
    loss = sigmoid_cross_entropy_with_logits(preds, targets_onehot)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_softmax_loss(preds, targets_onehot, weights=None, logit_scale=1.0):
    if logit_scale and logit_scale != 1.0:
        preds = preds / logit_scale
    loss = softmax_cross_entropy_with_logits(preds, targets_onehot)
    if weights is not None:
        loss = loss * weights
    return loss


# ---------------------------------------------------------------------------
# loss assembly (reference voxelnet.py:704-830)
# ---------------------------------------------------------------------------

NORM_BY_NUM_EXAMPLES = 0
NORM_BY_NUM_POSITIVES = 1
NORM_BY_NUM_POS_NEG = 2
DONT_NORM = 3


def prepare_loss_weights(labels, pos_cls_weight=1.0, neg_cls_weight=1.0,
                         loss_norm_type=NORM_BY_NUM_POSITIVES,
                         dtype=jnp.float32):
    """labels [B, A] (-1 ignore, 0 bg, >0 class) -> cls/reg weights + cared."""
    cared = labels >= 0
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (
        negatives.astype(dtype) * neg_cls_weight
        + positives.astype(dtype) * pos_cls_weight
    )
    reg_weights = positives.astype(dtype)
    if loss_norm_type == NORM_BY_NUM_EXAMPLES:
        num_examples = jnp.clip(
            cared.astype(dtype).sum(1, keepdims=True), 1.0, None)
        cls_weights = cls_weights / num_examples
        bbox_norm = jnp.clip(
            positives.astype(dtype).sum(1, keepdims=True), 1.0, None)
        reg_weights = reg_weights / bbox_norm
    elif loss_norm_type == NORM_BY_NUM_POSITIVES:
        pos_norm = jnp.clip(
            positives.astype(dtype).sum(1, keepdims=True), 1.0, None)
        reg_weights = reg_weights / pos_norm
        cls_weights = cls_weights / pos_norm
    elif loss_norm_type == NORM_BY_NUM_POS_NEG:
        pos_neg = jnp.stack([positives, negatives], axis=-1).astype(dtype)
        normalizer = pos_neg.sum(1, keepdims=True)  # [B, 1, 2]
        cls_normalizer = jnp.clip((pos_neg * normalizer).sum(-1), 1.0, None)
        normalizer = jnp.clip(normalizer, 1.0, None)
        reg_weights = reg_weights / normalizer[:, 0:1, 0]
        cls_weights = cls_weights / cls_normalizer
    elif loss_norm_type == DONT_NORM:
        pos_norm = jnp.clip(
            positives.astype(dtype).sum(1, keepdims=True), 1.0, None)
        reg_weights = reg_weights / pos_norm
    else:
        raise ValueError(f"unknown loss norm type {loss_norm_type}")
    return cls_weights, reg_weights, cared


def add_sin_difference(boxes1, boxes2, factor=1.0):
    """Replace the two yaw channels with sin-difference encodings."""
    r1 = boxes1[..., 6:7] * factor
    r2 = boxes2[..., 6:7] * factor
    rad_pred = jnp.sin(r1) * jnp.cos(r2)
    rad_tg = jnp.cos(r1) * jnp.sin(r2)
    boxes1 = jnp.concatenate(
        [boxes1[..., :6], rad_pred, boxes1[..., 7:]], axis=-1)
    boxes2 = jnp.concatenate(
        [boxes2[..., :6], rad_tg, boxes2[..., 7:]], axis=-1)
    return boxes1, boxes2


def get_direction_target(anchors, reg_targets, dir_offset=0.0, num_bins=2,
                         one_hot=True, dtype=jnp.float32):
    """Direction-bin classification targets from yaw residuals."""
    rot_gt = reg_targets[..., 6] + anchors[..., 6]
    offset_rot = rot_gt - dir_offset
    offset_rot = offset_rot - jnp.floor(offset_rot / (2 * np.pi)) * (2 * np.pi)
    dir_cls = jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32)
    dir_cls = jnp.clip(dir_cls, 0, num_bins - 1)
    if one_hot:
        return jax.nn.one_hot(dir_cls, num_bins, dtype=dtype)
    return dir_cls


def ghm_c_loss(preds, targets_onehot, weights=None, bins=10):
    """Gradient-harmonized classification loss (GHM-C).

    Reference: second/pytorch/core/ghm_loss.py:17-75 (flagged broken
    upstream; this is a working re-derivation of the paper's momentum=0
    path). The per-bin Python loop becomes a vectorized histogram:
    bucketize gradient norms, count per bin with a scatter-add, and weight
    each example by num_examples / count[bin] / num_valid_bins — fully
    traced, no data-dependent control flow.
    """
    bins = int(bins)
    g = jnp.abs(jax.nn.sigmoid(lax.stop_gradient(preds)) - targets_onehot)
    if weights is None:
        valid = jnp.ones_like(g, dtype=bool)
    else:
        valid = jnp.broadcast_to((weights > 0)[..., None], g.shape)
    num_examples = jnp.maximum(valid.sum().astype(g.dtype), 1.0)
    bin_idx = jnp.clip((g * bins).astype(jnp.int32), 0, bins - 1)
    counts = jnp.zeros((bins,), g.dtype).at[
        jnp.where(valid, bin_idx, 0).reshape(-1)].add(
        valid.reshape(-1).astype(g.dtype))
    num_valid_bins = jnp.maximum((counts > 0).sum().astype(g.dtype), 1.0)
    per_bin_w = jnp.where(counts > 0, num_examples / jnp.maximum(counts, 1.0),
                          0.0)
    w = jnp.where(valid, per_bin_w[bin_idx], 0.0) / num_valid_bins
    ce = sigmoid_cross_entropy_with_logits(preds, targets_onehot)
    return ce * w / num_examples


def ghm_r_loss(preds, targets, weights=None, mu=0.02, bins=10,
               code_weights=None):
    """Gradient-harmonized regression loss (GHM-R, authentic smooth L1).

    Reference: second/pytorch/core/ghm_loss.py:78-141. ASL1 loss
    sqrt(d^2+mu^2)-mu with gradient-norm |d|/sqrt(d^2+mu^2) in [0,1),
    harmonized by the same vectorized histogram as :func:`ghm_c_loss`.
    """
    bins = int(bins)
    if code_weights is not None:
        cw = jnp.asarray(code_weights, preds.dtype)
        preds = preds * cw
        targets = targets * cw
    diff = preds - targets
    loss = jnp.sqrt(diff * diff + mu * mu) - mu
    g = jnp.abs(lax.stop_gradient(diff) /
                jnp.sqrt(mu * mu + lax.stop_gradient(diff) ** 2))
    if weights is None:
        valid = jnp.ones_like(g, dtype=bool)
    else:
        valid = jnp.broadcast_to((weights > 0)[..., None], g.shape)
    num_codes = preds.shape[-1]
    num_examples = jnp.maximum(
        valid.sum().astype(g.dtype) / num_codes, 1.0)
    bin_idx = jnp.clip((g * bins).astype(jnp.int32), 0, bins - 1)
    counts = jnp.zeros((bins,), g.dtype).at[
        jnp.where(valid, bin_idx, 0).reshape(-1)].add(
        valid.reshape(-1).astype(g.dtype))
    num_valid_bins = jnp.maximum((counts > 0).sum().astype(g.dtype), 1.0)
    per_bin_w = jnp.where(counts > 0, num_examples / jnp.maximum(counts, 1.0),
                          0.0)
    w = jnp.where(valid, per_bin_w[bin_idx], 0.0) / num_valid_bins
    return loss * w / num_examples
