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


# ---------------------------------------------------------------------------
# Train-config mutation helpers (reference second/utils/config_tool/train.py)
# ---------------------------------------------------------------------------


def _get_optim_cfg(train_config, optim="adam_optimizer"):
    cfg = getattr(train_config.optimizer, optim, None)
    if cfg is None:
        raise NotImplementedError(optim)
    return cfg


def manual_stepping(train_config, boundaries, rates, optim="adam_optimizer"):
    """Replace the LR schedule with ManualStepping (train.py:19-23)."""
    lr = _get_optim_cfg(train_config, optim).learning_rate
    ms = schema.ManualStepping.from_raw({})
    ms.boundaries = list(boundaries)
    ms.rates = list(rates)
    lr.manual_stepping = ms
    lr.one_cycle = None
    lr.exponential_decay = None


def exp_decay(train_config, init_lr, decay_length, decay_factor,
              staircase=True, optim="adam_optimizer"):
    """Replace the LR schedule with ExponentialDecay (train.py:25-37)."""
    lr = _get_optim_cfg(train_config, optim).learning_rate
    ed = schema.ExponentialDecay.from_raw({})
    ed.initial_learning_rate = init_lr
    ed.decay_length = decay_length
    ed.decay_factor = decay_factor
    ed.staircase = staircase
    lr.exponential_decay = ed
    lr.one_cycle = None
    lr.manual_stepping = None


def one_cycle(train_config, lr_max, moms, div_factor, pct_start,
              optim="adam_optimizer"):
    """Replace the LR schedule with OneCycle (train.py:39-52)."""
    lr = _get_optim_cfg(train_config, optim).learning_rate
    oc = schema.OneCycle.from_raw({})
    oc.lr_max = lr_max
    oc.moms = list(moms)
    oc.div_factor = div_factor
    oc.pct_start = pct_start
    lr.one_cycle = oc
    lr.exponential_decay = None
    lr.manual_stepping = None


def _div_up(a, b):
    return (a + b - 1) // b


def set_train_step(config, epochs, eval_epoch, num_examples=None):
    """Set steps/steps_per_eval from epoch counts (train.py:57-73).

    Unlike the reference we accept `num_examples` directly so the helper
    works without instantiating the dataset (pass len(dataset) to match).
    """
    if num_examples is None:
        from ..data.dataset import get_dataset_class
        input_cfg = config.train_input_reader
        ds = get_dataset_class(input_cfg.dataset.dataset_class_name)(
            root_path=input_cfg.dataset.kitti_root_path,
            info_path=input_cfg.dataset.kitti_info_path)
        num_examples = len(ds)
    batch_size = config.train_input_reader.batch_size
    step_per_epoch = _div_up(num_examples, batch_size)
    config.train_config.steps = step_per_epoch * epochs
    config.train_config.steps_per_eval = step_per_epoch * eval_epoch


def disable_sample(config):
    """Drop the GT-database sampler (train.py:75-77)."""
    config.train_input_reader.preprocess.database_sampler = (
        schema.Sampler.from_raw({}))


def disable_per_gt_aug(config):
    """Zero per-object noise (train.py:79-82)."""
    prep = config.train_input_reader.preprocess
    prep.groundtruth_localization_noise_std = [0.0, 0.0, 0.0]
    prep.groundtruth_rotation_uniform_noise = [0.0, 0.0]


def disable_global_aug(config):
    """Zero global augmentation (train.py:84-89).

    Deliberate deviation: the reference sets
    ``global_scaling_uniform_noise[:] = [0, 0]``, but that field is a
    [min_scale, max_scale] RANGE — scale 0 collapses every point and box
    to the origin, silently turning all anchor labels to -1 (nothing
    trains). The identity scale is [1, 1].
    """
    prep = config.train_input_reader.preprocess
    prep.global_rotation_uniform_noise = [0.0, 0.0]
    prep.global_scaling_uniform_noise = [1.0, 1.0]
    prep.global_random_rotation_range_per_object = [0.0, 0.0]
    prep.global_translate_noise_std = [0.0, 0.0, 0.0]
