"""Config -> (flax network, ModelSpec) (reference
second/pytorch/builder/second_builder.py:22-133).

``build_network(pipeline_cfg)`` is the one-stop entry: it builds the
voxel generator, box coder, target assigner, network module and the
static ModelSpec used by the jitted loss/predict functions.
"""

from ..configs import schema
from ..core.box_coders import BevBoxCoder
from ..models import get_voxelnet_class
from ..models.voxelnet import ModelSpec
from ..ops import losses as L
from . import (
    box_coder_builder,
    losses_builder,
    target_assigner_builder,
    voxel_builder,
)


def _nms_params(ta_cfg: schema.TargetAssigner):
    classes_cfg = ta_cfg.class_settings
    num_class = len(classes_cfg)

    def per_class(override, attr):
        if len(override) != 0:
            assert len(override) == num_class
            return list(override)
        return [getattr(c, attr) for c in classes_cfg]

    use_mcnms = [c.use_multi_class_nms for c in classes_cfg]
    use_rot = [c.use_rotate_nms for c in classes_cfg]
    assert all(use_mcnms) or not any(use_mcnms), "mixed multiclass nms"
    assert all(use_rot) or not any(use_rot), "mixed rotate nms"
    pre = per_class(ta_cfg.nms_pre_max_sizes, "nms_pre_max_size")
    post = per_class(ta_cfg.nms_post_max_sizes, "nms_post_max_size")
    score = per_class(ta_cfg.nms_score_thresholds, "nms_score_threshold")
    iou = per_class(ta_cfg.nms_iou_thresholds, "nms_iou_threshold")
    if not any(use_mcnms):
        assert len(set(pre)) == 1 and len(set(post)) == 1
        assert len(set(score)) == 1 and len(set(iou)) == 1
    return all(use_mcnms), all(use_rot), pre, post, score, iou


def build_model_spec(model_cfg: schema.VoxelNet, target_assigner):
    cls_loss_fn, loc_loss_fn, cls_w, loc_w, _ = losses_builder.build(
        model_cfg.loss)
    mcnms, rot_nms, pre, post, score, iou = _nms_params(
        model_cfg.target_assigner)
    box_coder = target_assigner.box_coder
    sin_factor = model_cfg.sin_error_factor or 1.0
    num_class = len(model_cfg.target_assigner.class_settings)
    anchors_ranges = tuple(
        tuple(int(v) for v in target_assigner.anchors_range(i))
        for i in range(num_class)
    )
    return ModelSpec(
        num_class=num_class,
        box_code_size=box_coder.code_size,
        num_anchor_per_loc=target_assigner.num_anchors_per_location,
        cls_loss_fn=cls_loss_fn,
        loc_loss_fn=loc_loss_fn,
        dir_loss_fn=L.weighted_softmax_loss,
        cls_loss_weight=cls_w,
        loc_loss_weight=loc_w,
        direction_loss_weight=model_cfg.direction_loss_weight,
        pos_cls_weight=model_cfg.pos_class_weight,
        neg_cls_weight=model_cfg.neg_class_weight,
        loss_norm_type=int(model_cfg.loss_norm_type),
        encode_background_as_zeros=model_cfg.encode_background_as_zeros,
        encode_rad_error_by_sin=model_cfg.encode_rad_error_by_sin,
        sin_error_factor=sin_factor,
        use_sigmoid_score=model_cfg.use_sigmoid_score,
        use_direction_classifier=model_cfg.use_direction_classifier,
        num_direction_bins=model_cfg.num_direction_bins or 2,
        dir_offset=model_cfg.direction_offset,
        dir_limit_offset=model_cfg.direction_limit_offset,
        linear_dim=getattr(box_coder, "linear_dim", False),
        vec_encode=getattr(box_coder, "vec_encode", False),
        bev_coder=isinstance(box_coder, BevBoxCoder),
        bev_z_fixed=getattr(box_coder, "z_fixed", -1.0),
        bev_h_fixed=getattr(box_coder, "h_fixed", 2.0),
        use_rotate_nms=rot_nms,
        multiclass_nms=mcnms,
        nms_class_agnostic=model_cfg.nms_class_agnostic,
        nms_score_thresholds=tuple(score),
        nms_pre_max_sizes=tuple(int(v) for v in pre),
        nms_post_max_sizes=tuple(int(v) for v in post),
        nms_iou_thresholds=tuple(iou),
        post_center_range=tuple(model_cfg.post_center_limit_range),
        anchors_ranges=anchors_ranges,
    )


def build_network(config, measure_time=False, compute_dtype=None,
                  use_banded=False):
    """pipeline config (or model.second config) -> dict of parts.

    compute_dtype: None (f32) or "bfloat16"; defaults to bfloat16 when a
    full pipeline config sets train_config.enable_mixed_precision (the
    TPU-native stand-in for the reference's apex fp16, train.py:216-227).

    use_banded: sparse-middle convs via the banded one-hot gather-GEMM
    Pallas kernels (ops.banded_sparse) — inference AND training (the
    kernels define a custom VJP); ignored by dense middles.
    """
    if isinstance(config, schema.TrainEvalPipelineConfig):
        model_cfg = config.model.second
        if compute_dtype is None and config.train_config.enable_mixed_precision:
            compute_dtype = "bfloat16"
    else:
        model_cfg = config
    voxel_generator = voxel_builder.build(model_cfg.voxel_generator)
    box_coder = box_coder_builder.build(model_cfg.box_coder)
    target_assigner = target_assigner_builder.build(
        model_cfg.target_assigner, box_coder)

    vfe_num_filters = list(model_cfg.voxel_feature_extractor.num_filters)
    grid_size = voxel_generator.grid_size
    dense_shape = [1] + grid_size[::-1].tolist() + [vfe_num_filters[-1]]

    # resolve per-class feature map sizes + anchors ONCE per run
    # (the reference does this in dataset_builder.py:106-128 and caches)
    from ..utils.config_tool import get_downsample_factor

    out_size_factor = get_downsample_factor(model_cfg)
    feature_map_size = grid_size[:2] // out_size_factor
    feature_map_size = [*feature_map_size, 1][::-1]
    anchor_cache = make_anchor_cache(
        target_assigner, feature_map_size, grid_size)

    spec = build_model_spec(model_cfg, target_assigner)

    net_class = get_voxelnet_class(model_cfg.network_class_name)
    extra = {}
    if model_cfg.network_class_name == "VoxelNetNuscenesMultiHead":
        extra = dict(
            class_names=tuple(target_assigner.classes),
            num_anchor_per_loc_by_class=tuple(
                int(target_assigner.num_anchors_per_location_class(c))
                for c in target_assigner.classes),
        )
    net = net_class(
        **extra,
        output_shape=tuple(dense_shape),
        num_class=spec.num_class,
        num_input_features=model_cfg.num_point_features,
        vfe_class_name=model_cfg.voxel_feature_extractor.module_class_name,
        vfe_num_filters=tuple(vfe_num_filters),
        with_distance=model_cfg.voxel_feature_extractor.with_distance,
        middle_class_name=model_cfg.middle_feature_extractor.module_class_name,
        middle_num_input_features=model_cfg.middle_feature_extractor.num_input_features,
        middle_num_filters_d1=tuple(
            model_cfg.middle_feature_extractor.num_filters_down1),
        middle_num_filters_d2=tuple(
            model_cfg.middle_feature_extractor.num_filters_down2),
        rpn_class_name=model_cfg.rpn.module_class_name,
        rpn_num_input_features=model_cfg.rpn.num_input_features,
        rpn_layer_nums=tuple(model_cfg.rpn.layer_nums),
        rpn_layer_strides=tuple(model_cfg.rpn.layer_strides),
        rpn_num_filters=tuple(model_cfg.rpn.num_filters),
        rpn_upsample_strides=tuple(model_cfg.rpn.upsample_strides),
        rpn_num_upsample_filters=tuple(model_cfg.rpn.num_upsample_filters),
        use_norm=True,
        use_groupnorm=model_cfg.rpn.use_groupnorm,
        num_groups=model_cfg.rpn.num_groups,
        use_direction_classifier=model_cfg.use_direction_classifier,
        encode_background_as_zeros=model_cfg.encode_background_as_zeros,
        num_direction_bins=spec.num_direction_bins,
        num_anchor_per_loc=spec.num_anchor_per_loc,
        box_code_size=spec.box_code_size,
        voxel_size=tuple(voxel_generator.voxel_size.tolist()),
        pc_range=tuple(voxel_generator.point_cloud_range.tolist()),
        compute_dtype=compute_dtype,
        use_banded=use_banded,
    )
    return {
        "net": net,
        "spec": spec,
        "voxel_generator": voxel_generator,
        "target_assigner": target_assigner,
        "box_coder": box_coder,
        "model_cfg": model_cfg,
        "dense_shape": dense_shape,
        "anchor_cache": anchor_cache,
        "out_size_factor": out_size_factor,
        "feature_map_size": feature_map_size,
    }


def make_anchor_cache(target_assigner, feature_map_size, grid_size):
    """Generate anchors once per run (reference
    second/builder/dataset_builder.py:106-128)."""
    import numpy as np

    from ..core import box_ops

    ret = target_assigner.generate_anchors(feature_map_size)
    class_names = target_assigner.classes
    anchors_dict = target_assigner.generate_anchors_dict(feature_map_size)
    anchors = ret["anchors"].reshape([-1, target_assigner.box_ndim])
    anchors_bv = box_ops.rbbox2d_to_near_bbox(anchors[:, [0, 1, 3, 4, 6]])
    return {
        "anchors": anchors,
        "anchors_bv": anchors_bv,
        "matched_thresholds": ret["matched_thresholds"],
        "unmatched_thresholds": ret["unmatched_thresholds"],
        "anchors_dict": anchors_dict,
        "class_names": class_names,
        "feature_map_size": list(feature_map_size),
        "grid_size": np.asarray(grid_size),
    }
