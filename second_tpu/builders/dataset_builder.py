"""InputReader config -> dataset with bound prep function (reference
second/builder/dataset_builder.py:34-135)."""

from functools import partial

from ..configs import schema
from ..data import kitti_dataset  # noqa: F401 - registration side effect
from ..data import nuscenes_dataset  # noqa: F401 - registration side effect
from ..data.dataset import get_dataset_class
from ..data.preprocess import prep_pointcloud
from ..utils.config_tool import get_downsample_factor
from . import dbsampler_builder
from .network_builder import make_anchor_cache


POINTS_BUFFER = 32768  # static padded size for device-voxelize examples


def build(input_reader_config: schema.InputReader,
          model_config: schema.VoxelNet,
          training,
          voxel_generator,
          target_assigner,
          anchor_cache=None,
          device_voxelize=False,
          quantize_points=False,
          compact_targets=None,
          banded_plans=False,
          banded_bwd=False,
          banded_cor_capacity=8192):
    """device_voxelize: ship the augmented point cloud instead of the
    padded voxel buffer; the jitted step voxelizes on device (PP-family
    only — ignored when the sparse middle's host planner is active).

    quantize_points: with device_voxelize, int16-quantize the shipped
    points (~1 mm max error; halves the dominant H2D buffer).
    compact_targets: ship int8 labels + sparse positive regression
    targets instead of the dense [A, code] buffer; defaults to
    device_voxelize (the jitted step reconstructs them)."""
    prep_cfg = input_reader_config.preprocess
    dataset_cfg = input_reader_config.dataset
    num_point_features = model_config.num_point_features
    out_size_factor = get_downsample_factor(model_config)
    assert out_size_factor > 0
    db_sampler_cfg = prep_cfg.database_sampler
    db_sampler = None
    if training and (len(db_sampler_cfg.sample_groups) > 0
                     or db_sampler_cfg.database_info_path != ""):
        db_sampler = dbsampler_builder.build(db_sampler_cfg)
    grid_size = voxel_generator.grid_size
    feature_map_size = grid_size[:2] // out_size_factor
    feature_map_size = [*feature_map_size, 1][::-1]
    assert all(n != "" for n in target_assigner.classes), (
        "you must specify class_name in anchor_generators.")
    dataset_cls = get_dataset_class(dataset_cfg.dataset_class_name)
    assert dataset_cls.NumPointFeatures >= 3
    assert dataset_cls.NumPointFeatures == num_point_features

    if anchor_cache is None:
        anchor_cache = make_anchor_cache(
            target_assigner, feature_map_size, grid_size)

    # host-side sparse-conv planning (C++ rulebooks, the reference's
    # spconv-on-CPU architecture) for the sparse middle family
    sparse_plan_scales = None
    middle_name = model_config.middle_feature_extractor.module_class_name
    from ..models.sparse_middle import SPARSE_MIDDLE_NAMES, plan_scales
    if middle_name in SPARSE_MIDDLE_NAMES:
        from ..native import sparse_plan as native_plan
        if native_plan.available():
            dense_shape = [
                1, *grid_size[::-1].tolist(),
                model_config.middle_feature_extractor.num_input_features]
            sparse_plan_scales = plan_scales(
                middle_name, dense_shape, prep_cfg.max_number_of_voxels)

    prep_func = partial(
        prep_pointcloud,
        root_path=dataset_cfg.kitti_root_path,
        voxel_generator=voxel_generator,
        target_assigner=target_assigner,
        training=training,
        max_voxels=prep_cfg.max_number_of_voxels,
        remove_outside_points=False,
        remove_unknown=prep_cfg.remove_unknown_examples,
        create_targets=training,
        shuffle_points=prep_cfg.shuffle_points,
        # eval configs leave the noise fields unset (empty lists); they
        # are only consumed when training=True
        gt_rotation_noise=(
            list(prep_cfg.groundtruth_rotation_uniform_noise) or [0.0, 0.0]),
        gt_loc_noise_std=(
            list(prep_cfg.groundtruth_localization_noise_std) or [0.0] * 3),
        global_rotation_noise=(
            list(prep_cfg.global_rotation_uniform_noise) or [0.0, 0.0]),
        global_scaling_noise=(
            list(prep_cfg.global_scaling_uniform_noise) or [1.0, 1.0]),
        global_random_rot_range=(
            list(prep_cfg.global_random_rotation_range_per_object)
            or [0.0, 0.0]),
        global_translate_noise_std=(
            list(prep_cfg.global_translate_noise_std) or [0.0] * 3),
        db_sampler=db_sampler,
        num_point_features=dataset_cls.NumPointFeatures,
        anchor_area_threshold=prep_cfg.anchor_area_threshold,
        gt_points_drop=prep_cfg.groundtruth_points_drop_percentage,
        gt_drop_max_keep=prep_cfg.groundtruth_drop_max_keep_points,
        remove_points_after_sample=prep_cfg.remove_points_after_sample,
        remove_environment=prep_cfg.remove_environment,
        use_group_id=prep_cfg.use_group_id,
        out_size_factor=out_size_factor,
        min_points_in_gt=prep_cfg.min_num_of_points_in_gt,
        random_flip_x=prep_cfg.random_flip_x,
        random_flip_y=prep_cfg.random_flip_y,
        sample_importance=prep_cfg.sample_importance,
        anchor_cache=anchor_cache,
        sparse_plan_scales=sparse_plan_scales,
        sparse_plan_banded=banded_plans and sparse_plan_scales is not None,
        sparse_plan_banded_bwd=banded_bwd and training,
        sparse_plan_cor_capacity=banded_cor_capacity,
        emit_points=(
            POINTS_BUFFER
            if device_voxelize and sparse_plan_scales is None else 0),
        quantize_points=quantize_points,
        compact_targets=(
            (device_voxelize and sparse_plan_scales is None and training)
            if compact_targets is None else compact_targets),
    )

    dataset = dataset_cls(
        info_path=dataset_cfg.kitti_info_path,
        root_path=dataset_cfg.kitti_root_path,
        class_names=list(target_assigner.classes),
        prep_func=prep_func,
    )
    return dataset
