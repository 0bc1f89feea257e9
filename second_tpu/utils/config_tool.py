"""Programmatic config helpers (reference
second/utils/config_tool/__init__.py).

Because our configs are plain Python schema objects (not protobufs),
mutation is direct attribute assignment; these helpers mirror the
reference utilities used by scripts and builders.
"""

import numpy as np

from ..configs import schema
from ..configs.textproto import parse_file


def read_config(path) -> schema.TrainEvalPipelineConfig:
    return schema.TrainEvalPipelineConfig.from_raw(parse_file(path))


def get_downsample_factor(model_config: schema.VoxelNet) -> int:
    downsample_factor = np.prod(model_config.rpn.layer_strides)
    if len(model_config.rpn.upsample_strides) > 0:
        downsample_factor /= model_config.rpn.upsample_strides[-1]
    downsample_factor *= model_config.middle_feature_extractor.downsample_factor
    downsample_factor = int(np.round(downsample_factor))
    assert downsample_factor > 0
    return downsample_factor


def change_detection_range(model_config: schema.VoxelNet, new_range):
    """new_range: [x0, y0, x1, y1]; keeps z bounds."""
    assert len(new_range) == 4
    old_pc_range = list(model_config.voxel_generator.point_cloud_range)
    old_pc_range[:2] = new_range[:2]
    old_pc_range[3:5] = new_range[2:]
    model_config.voxel_generator.point_cloud_range = old_pc_range
    for cs in model_config.target_assigner.class_settings:
        if cs.anchor_generator_range is not None:
            old = list(cs.anchor_generator_range.anchor_ranges)
            old[:2] = new_range[:2]
            old[3:5] = new_range[2:]
            cs.anchor_generator_range.anchor_ranges = old
        elif cs.anchor_generator_stride is not None:
            a_cfg = cs.anchor_generator_stride
            old_offset = list(a_cfg.offsets)
            stride = list(a_cfg.strides)
            old_offset[0] = new_range[0] + stride[0] / 2
            old_offset[1] = new_range[1] + stride[1] / 2
            a_cfg.offsets = old_offset
    old_post_range = list(model_config.post_center_limit_range)
    old_post_range[:2] = new_range[:2]
    old_post_range[3:5] = new_range[2:]
    model_config.post_center_limit_range = old_post_range
