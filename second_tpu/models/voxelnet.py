"""VoxelNet: the detector that composes VFE + middle + RPN, plus the
pure loss/predict functions that run inside the jitted train/eval steps.

Composition parity: reference second/pytorch/models/voxelnet.py:57-375
(network), :239-312 (loss), :377-645 (predict).  Unlike the reference —
which mixes nn.Module state, timing and metric buffers into the model —
the TPU design splits:

  * ``VoxelNet`` (flax module): pure network forward,
    voxels -> preds_dict; selected by ``network_class_name``.
  * ``ModelSpec`` (static dataclass): every knob the loss/post-process
    needs, built once from the proto config.
  * ``compute_loss`` / ``predict``: pure jittable functions over
    (spec, preds, example) with fixed-size outputs.
"""

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import box_ops_jax, losses as L
from ..ops.nms import nms_bev
from .registry import (
    get_middle_class,
    get_rpn_class,
    get_vfe_class,
    register_voxelnet,
)


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static model/post-process configuration (hashable, jit-friendly)."""

    num_class: int
    box_code_size: int
    num_anchor_per_loc: int
    # loss
    cls_loss_fn: Callable = None
    loc_loss_fn: Callable = None
    dir_loss_fn: Callable = None
    cls_loss_weight: float = 1.0
    loc_loss_weight: float = 2.0
    direction_loss_weight: float = 0.2
    pos_cls_weight: float = 1.0
    neg_cls_weight: float = 1.0
    loss_norm_type: int = L.NORM_BY_NUM_POSITIVES
    encode_background_as_zeros: bool = True
    encode_rad_error_by_sin: bool = True
    sin_error_factor: float = 1.0
    use_sigmoid_score: bool = True
    use_direction_classifier: bool = True
    num_direction_bins: int = 2
    dir_offset: float = 0.0
    dir_limit_offset: float = 0.0
    # box coder
    linear_dim: bool = False
    vec_encode: bool = False
    bev_coder: bool = False
    bev_z_fixed: float = -1.0
    bev_h_fixed: float = 2.0
    # nms / postprocess
    use_rotate_nms: bool = True
    multiclass_nms: bool = False
    nms_class_agnostic: bool = False
    nms_score_thresholds: Tuple[float, ...] = (0.05,)
    nms_pre_max_sizes: Tuple[int, ...] = (1000,)
    nms_post_max_sizes: Tuple[int, ...] = (100,)
    nms_iou_thresholds: Tuple[float, ...] = (0.5,)
    post_center_range: Tuple[float, ...] = ()
    # per-class anchor index ranges for multiclass NMS (static)
    anchors_ranges: Tuple[Tuple[int, int], ...] = ()

    def decode(self, encodings, anchors):
        if self.bev_coder:
            ret = box_ops_jax.bev_box_decode(
                encodings, anchors[..., [0, 1, 3, 4, 6]],
                self.vec_encode, self.linear_dim)
            z = jnp.full((*ret.shape[:-1], 1), self.bev_z_fixed, ret.dtype)
            h = jnp.full((*ret.shape[:-1], 1), self.bev_h_fixed, ret.dtype)
            return jnp.concatenate(
                [ret[..., :2], z, ret[..., 2:4], h, ret[..., 4:]], axis=-1)
        return box_ops_jax.second_box_decode(
            encodings, anchors, self.vec_encode, self.linear_dim)


@register_voxelnet
class VoxelNet(nn.Module):
    """voxels -> {box_preds, cls_preds, dir_cls_preds} (flattened [B, A, .])."""

    output_shape: Sequence[int]  # [1, nz, ny, nx, C]
    num_class: int = 1
    num_input_features: int = 4
    vfe_class_name: str = "VoxelFeatureExtractor"
    vfe_num_filters: Sequence[int] = (32, 128)
    with_distance: bool = False
    middle_class_name: str = "SparseMiddleExtractor"
    middle_num_input_features: int = -1
    middle_num_filters_d1: Sequence[int] = (64,)
    middle_num_filters_d2: Sequence[int] = (64, 64)
    rpn_class_name: str = "RPNV2"
    rpn_num_input_features: int = -1
    rpn_layer_nums: Sequence[int] = (3, 5, 5)
    rpn_layer_strides: Sequence[int] = (2, 2, 2)
    rpn_num_filters: Sequence[int] = (128, 128, 256)
    rpn_upsample_strides: Sequence[float] = (1, 2, 4)
    rpn_num_upsample_filters: Sequence[int] = (256, 256, 256)
    use_norm: bool = True
    use_groupnorm: bool = False
    num_groups: int = 32
    use_direction_classifier: bool = True
    encode_background_as_zeros: bool = True
    num_direction_bins: int = 2
    num_anchor_per_loc: int = 2
    box_code_size: int = 7
    voxel_size: Sequence[float] = (0.2, 0.2, 4)
    pc_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" mixed precision
    # banded one-hot gather-GEMM inference path for sparse middles
    # (ops.banded_sparse); ignored by dense middles and during training
    use_banded: bool = False

    def setup(self):
        self.voxel_feature_extractor = get_vfe_class(self.vfe_class_name)(
            num_input_features=self.num_input_features,
            use_norm=self.use_norm,
            num_filters=tuple(self.vfe_num_filters),
            with_distance=self.with_distance,
            voxel_size=tuple(self.voxel_size),
            pc_range=tuple(self.pc_range),
        )
        from .sparse_middle import SparseMiddleBase

        mid_cls = get_middle_class(self.middle_class_name)
        mid_kwargs = dict(
            output_shape=tuple(self.output_shape),
            use_norm=self.use_norm,
            num_input_features=self.middle_num_input_features,
            num_filters_down1=tuple(self.middle_num_filters_d1),
            num_filters_down2=tuple(self.middle_num_filters_d2),
            compute_dtype=self.compute_dtype,
        )
        if issubclass(mid_cls, SparseMiddleBase):
            mid_kwargs["use_banded"] = self.use_banded
        self.middle_feature_extractor = mid_cls(**mid_kwargs)
        self.rpn = get_rpn_class(self.rpn_class_name)(
            use_norm=self.use_norm,
            num_class=self.num_class,
            layer_nums=tuple(self.rpn_layer_nums),
            layer_strides=tuple(self.rpn_layer_strides),
            num_filters=tuple(self.rpn_num_filters),
            upsample_strides=tuple(self.rpn_upsample_strides),
            num_upsample_filters=tuple(self.rpn_num_upsample_filters),
            num_input_features=self.rpn_num_input_features,
            num_anchor_per_loc=self.num_anchor_per_loc,
            encode_background_as_zeros=self.encode_background_as_zeros,
            use_direction_classifier=self.use_direction_classifier,
            use_groupnorm=self.use_groupnorm,
            num_groups=self.num_groups,
            box_code_size=self.box_code_size,
            num_direction_bins=self.num_direction_bins,
            compute_dtype=self.compute_dtype,
        )

    def __call__(self, voxels, num_points, coords, train=False,
                 sparse_plan=None):
        """voxels [B, V, T, F], num_points [B, V], coords [B, V, 3] zyx.

        sparse_plan: optional host-built rulebook dict (see
        sparse_middle.build_host_plan); voxels/coords must then be
        sorted by linear id per batch row.
        """
        voxel_features = self.voxel_feature_extractor(
            voxels, num_points, coords, train=train)
        if sparse_plan is not None:
            spatial_features = self.middle_feature_extractor(
                voxel_features, coords, train=train, plan=sparse_plan)
        else:
            spatial_features = self.middle_feature_extractor(
                voxel_features, coords, train=train)
        preds = self.rpn(spatial_features, train=train)
        b = voxels.shape[0]
        out = {
            "box_preds": preds["box_preds"].reshape(b, -1, self.box_code_size),
            "cls_preds": preds["cls_preds"].reshape(
                b, -1,
                self.num_class if self.encode_background_as_zeros
                else self.num_class + 1),
        }
        if self.use_direction_classifier:
            out["dir_cls_preds"] = preds["dir_cls_preds"].reshape(
                b, -1, self.num_direction_bins)
        return out


# ---------------------------------------------------------------------------
# loss (pure function; reference voxelnet.py:239-312 + 704-830)
# ---------------------------------------------------------------------------


def compute_loss(spec: ModelSpec, preds: Dict[str, Any], example: Dict[str, Any]):
    box_preds = preds["box_preds"]
    cls_preds = preds["cls_preds"]
    batch_size = box_preds.shape[0]
    labels = example["labels"]
    reg_targets = example["reg_targets"]
    importance = example.get("importance")
    if importance is None:
        importance = jnp.ones_like(labels, dtype=box_preds.dtype)

    cls_weights, reg_weights, cared = L.prepare_loss_weights(
        labels,
        pos_cls_weight=spec.pos_cls_weight,
        neg_cls_weight=spec.neg_cls_weight,
        loss_norm_type=spec.loss_norm_type,
        dtype=box_preds.dtype,
    )
    cls_targets = labels * cared.astype(labels.dtype)

    one_hot = jax.nn.one_hot(
        cls_targets, spec.num_class + 1, dtype=box_preds.dtype)
    if spec.encode_background_as_zeros:
        one_hot = one_hot[..., 1:]
    bp, rt = box_preds, reg_targets
    if spec.encode_rad_error_by_sin:
        bp, rt = L.add_sin_difference(bp, rt, spec.sin_error_factor)
    loc_losses = spec.loc_loss_fn(bp, rt, weights=reg_weights * importance)
    cls_losses = spec.cls_loss_fn(
        cls_preds, one_hot, weights=cls_weights * importance)

    loc_loss_reduced = loc_losses.sum() / batch_size * spec.loc_loss_weight
    cls_loss_sum = cls_losses.sum(axis=-1)  # [B, A]
    cls_pos = (cls_loss_sum * (labels > 0)).sum() / batch_size
    cls_neg = (cls_loss_sum * (labels == 0)).sum() / batch_size
    cls_loss_reduced = cls_losses.sum() / batch_size * spec.cls_loss_weight
    loss = loc_loss_reduced + cls_loss_reduced

    res = {
        "loss": loss,
        "cls_loss_reduced": cls_loss_reduced,
        "loc_loss_reduced": loc_loss_reduced,
        "cls_pos_loss": cls_pos / spec.pos_cls_weight,
        "cls_neg_loss": cls_neg / spec.neg_cls_weight,
        "cared": cared,
        "cls_preds": cls_preds,
    }
    if spec.use_direction_classifier:
        dir_targets = L.get_direction_target(
            example["anchors"], reg_targets,
            dir_offset=spec.dir_offset, num_bins=spec.num_direction_bins,
            dtype=box_preds.dtype)
        dir_logits = preds["dir_cls_preds"]
        weights = (labels > 0).astype(box_preds.dtype) * importance
        weights = weights / jnp.clip(
            weights.sum(-1, keepdims=True), 1.0, None)
        dir_loss = spec.dir_loss_fn(dir_logits, dir_targets, weights=weights)
        dir_loss = dir_loss.sum() / batch_size
        res["dir_loss_reduced"] = dir_loss
        res["loss"] = loss + dir_loss * spec.direction_loss_weight
    return res


# ---------------------------------------------------------------------------
# predict (pure function, fixed-size outputs; reference voxelnet.py:377-645)
# ---------------------------------------------------------------------------


def _single_frame_predict(spec: ModelSpec, box_preds, cls_preds, dir_preds,
                          anchors, anchors_mask):
    """One frame: [A, code], [A, C], [A, bins], [A, 7+] -> fixed-size dets."""
    box_preds = spec.decode(box_preds, anchors)
    num_class_with_bg = cls_preds.shape[-1]
    if spec.encode_background_as_zeros:
        total_scores = jax.nn.sigmoid(cls_preds)
    else:
        if spec.use_sigmoid_score:
            total_scores = jax.nn.sigmoid(cls_preds)[..., 1:]
        else:
            total_scores = jax.nn.softmax(cls_preds, axis=-1)[..., 1:]
    del num_class_with_bg

    if dir_preds is not None:
        dir_labels = jnp.argmax(dir_preds, axis=-1)
    else:
        dir_labels = jnp.zeros(box_preds.shape[0], jnp.int32)

    neg_inf = jnp.asarray(-jnp.inf, total_scores.dtype)
    if anchors_mask is not None:
        total_scores = jnp.where(anchors_mask[:, None], total_scores, neg_inf)

    bev = box_preds[:, [0, 1, 3, 4, 6]]

    if spec.multiclass_nms:
        outs = []
        for ci in range(spec.num_class):
            if spec.nms_class_agnostic:
                s, e = 0, box_preds.shape[0]
            else:
                s, e = spec.anchors_ranges[ci]
            cls_scores = total_scores[s:e, ci]
            idx, valid = nms_bev(
                bev[s:e], cls_scores,
                pre_max_size=spec.nms_pre_max_sizes[ci],
                post_max_size=spec.nms_post_max_sizes[ci],
                iou_threshold=spec.nms_iou_thresholds[ci],
                score_threshold=spec.nms_score_thresholds[ci],
                rotated=spec.use_rotate_nms,
            )
            gi = jnp.maximum(idx, 0)
            outs.append(
                dict(
                    boxes=box_preds[s:e][gi],
                    scores=jnp.where(valid, cls_scores[gi], 0.0),
                    labels=jnp.full(idx.shape, ci, jnp.int32),
                    dirs=dir_labels[s:e][gi],
                    valid=valid,
                )
            )
        boxes = jnp.concatenate([o["boxes"] for o in outs])
        scores = jnp.concatenate([o["scores"] for o in outs])
        labels = jnp.concatenate([o["labels"] for o in outs])
        dirs = jnp.concatenate([o["dirs"] for o in outs])
        valid = jnp.concatenate([o["valid"] for o in outs])
    else:
        if total_scores.shape[-1] == 1:
            top_scores = total_scores[..., 0]
            top_labels = jnp.zeros(box_preds.shape[0], jnp.int32)
        else:
            top_labels = jnp.argmax(total_scores, axis=-1).astype(jnp.int32)
            top_scores = jnp.max(total_scores, axis=-1)
        idx, valid = nms_bev(
            bev, top_scores,
            pre_max_size=spec.nms_pre_max_sizes[0],
            post_max_size=spec.nms_post_max_sizes[0],
            iou_threshold=spec.nms_iou_thresholds[0],
            score_threshold=spec.nms_score_thresholds[0],
            rotated=spec.use_rotate_nms,
        )
        gi = jnp.maximum(idx, 0)
        boxes = box_preds[gi]
        scores = jnp.where(valid, top_scores[gi], 0.0)
        labels = top_labels[gi]
        dirs = dir_labels[gi]

    if spec.use_direction_classifier:
        # Reference parity (voxelnet.py:598-607): reconstruct with
        # limit_period(yaw - dir_offset, dir_limit_offset, period), honouring
        # the config's direction_limit_offset.  NOTE: training targets
        # (voxelnet.py:814-829) bin with limit offset 0, so a nonzero
        # dir_limit_offset (the fhd configs set 1) flips every yaw by
        # period*limit_offset relative to the ground truth — matching the
        # reference bit-for-bit (required when importing reference-trained
        # checkpoints), at the cost of AOS (3D/BEV AP is unaffected; rotated
        # IoU is pi-symmetric).  Configs that leave direction_limit_offset
        # unset (proto default 0) get the corrected reconstruction that
        # exactly inverts get_direction_target.
        period = 2 * jnp.pi / spec.num_direction_bins
        dir_rot = box_ops_jax.limit_period(
            boxes[..., 6] - spec.dir_offset, spec.dir_limit_offset, period)
        yaw = dir_rot + spec.dir_offset + period * dirs.astype(boxes.dtype)
        boxes = boxes.at[..., 6].set(yaw)

    if len(spec.post_center_range) > 0:
        pcr = jnp.asarray(spec.post_center_range, boxes.dtype)
        in_range = jnp.all(boxes[:, :3] >= pcr[:3], axis=1) & jnp.all(
            boxes[:, :3] <= pcr[3:], axis=1)
        valid = valid & in_range

    return {
        "box3d_lidar": boxes,
        "scores": jnp.where(valid, scores, 0.0),
        "label_preds": labels,
        "valid": valid,
    }


def predict(spec: ModelSpec, preds: Dict[str, Any], example: Dict[str, Any]):
    """Batched fixed-size predictions.

    Returns dict of [B, Nout, ...] arrays with a validity mask; the host
    converts to ragged per-frame detections (data/eval layer).
    """
    anchors = example["anchors"]
    anchors_mask = example.get("anchors_mask")
    dir_preds = preds.get("dir_cls_preds")

    def one(box_p, cls_p, dir_p, anch, amask):
        return _single_frame_predict(spec, box_p, cls_p, dir_p, anch, amask)

    in_axes = [0, 0, 0 if dir_preds is not None else None, 0,
               0 if anchors_mask is not None else None]
    return jax.vmap(one, in_axes=tuple(in_axes))(
        preds["box_preds"], preds["cls_preds"], dir_preds, anchors,
        anchors_mask)
