import os

import pytest

from second_tpu.configs import load_pipeline_config, loads_pipeline_config
from second_tpu.configs import schema, textproto

REF_CONFIG_DIR = "/root/reference/second/configs"

MINI = """
model: {
  second: {
    network_class_name: "VoxelNet"
    voxel_generator {
      point_cloud_range : [0, -40, -3, 70.4, 40, 1]
      voxel_size : [0.05, 0.05, 0.1]
      max_number_of_points_per_voxel : 5
    }
    loss_norm_type: NormByNumPositives
    box_coder: { ground_box3d_coder: { linear_dim: false } }
    target_assigner: {
      class_settings: {
        anchor_generator_range: {
          sizes: [1.6, 3.9, 1.56]
          anchor_ranges: [0, -40.0, -1.0, 70.4, 40.0, -1.0]
          rotations: [0, 1.57]
        }
        matched_threshold : 0.6
        class_name: "Car"
        region_similarity_calculator: { nearest_iou_similarity: { } }
      }
      sample_positive_fraction : -1
      sample_size : 512
    }
  }
}
train_config: {
  optimizer: {
    adam_optimizer: {
      learning_rate: { one_cycle: { lr_max: 2.25e-3 moms: [0.95, 0.85] } }
      weight_decay: 0.01
    }
    fixed_weight_decay: true
  }
  steps: 23200
  enable_mixed_precision: False
}
"""


def test_parse_mini_config():
    cfg = loads_pipeline_config(MINI)
    m = cfg.model.second
    assert cfg.model.WhichOneof("model") == "second"
    assert m.network_class_name == "VoxelNet"
    assert m.voxel_generator.voxel_size == [0.05, 0.05, 0.1]
    assert m.voxel_generator.max_number_of_points_per_voxel == 5
    assert m.loss_norm_type == schema.LossNormType.NormByNumPositives
    assert m.box_coder.WhichOneof("box_coder") == "ground_box3d_coder"
    cs = m.target_assigner.class_settings[0]
    assert cs.WhichOneof("anchor_generator") == "anchor_generator_range"
    assert cs.anchor_generator_range.sizes == [1.6, 3.9, 1.56]
    assert cs.matched_threshold == pytest.approx(0.6)
    assert (
        cs.region_similarity_calculator.WhichOneof("region_similarity")
        == "nearest_iou_similarity"
    )
    assert m.target_assigner.sample_positive_fraction == -1.0
    opt = cfg.train_config.optimizer
    assert opt.WhichOneof("optimizer") == "adam_optimizer"
    assert opt.fixed_weight_decay is True
    oc = opt.adam_optimizer.learning_rate.one_cycle
    assert oc.lr_max == pytest.approx(2.25e-3)
    assert oc.moms == [0.95, 0.85]
    assert cfg.train_config.steps == 23200
    assert cfg.train_config.enable_mixed_precision is False
    # proto3 defaults for unset fields
    assert m.direction_loss_weight == 0.0
    assert m.use_direction_classifier is False
    assert cfg.train_input_reader.batch_size == 0
    assert cfg.train_input_reader.preprocess.database_sampler.rate == 0.0


def test_textproto_primitives():
    raw = textproto.parse('a: 1 b: "x # y" c { d: [1, 2] } c { d: [] } e: true')
    assert raw["a"] == ["1"]
    assert raw["b"] == ['"x # y']
    assert len(raw["c"]) == 2
    assert raw["c"][0]["d"] == ["1", "2"]
    assert "d" in raw["c"][1] and raw["c"][1]["d"] == []
    assert raw["e"] == ["true"]


def test_map_fields():
    cfg = loads_pipeline_config(
        """
train_input_reader: {
  preprocess: {
    database_sampler {
      sample_groups { name_to_max_num { key: "Car" value: 15 } }
      sample_groups {
        name_to_max_num { key: "Cyclist" value: 8 }
        name_to_max_num { key: "Pedestrian" value: 8 }
      }
      database_prep_steps {
        filter_by_min_num_points { min_num_point_pairs { key: "Car" value: 5 } }
      }
      database_prep_steps {
        filter_by_difficulty { removed_difficulties: [-1] }
      }
      rate: 1.0
    }
  }
}
"""
    )
    s = cfg.train_input_reader.preprocess.database_sampler
    assert s.sample_groups[0].name_to_max_num == {"Car": 15}
    assert s.sample_groups[1].name_to_max_num == {"Cyclist": 8, "Pedestrian": 8}
    steps = s.database_prep_steps
    assert steps[0].WhichOneof("database_preprocessing_step") == "filter_by_min_num_points"
    assert steps[0].filter_by_min_num_points.min_num_point_pairs == {"Car": 5}
    assert steps[1].filter_by_difficulty.removed_difficulties == [-1]


REFERENCE_CONFIGS = []
if os.path.isdir(REF_CONFIG_DIR):
    for root, _, files in os.walk(REF_CONFIG_DIR):
        for f in files:
            # *.deprecated.config predates the current upstream proto schema
            # (has e.g. VoxelNet.use_rotate_nms) and does not parse with the
            # reference's own protos either.
            if f.endswith(".config") and not f.endswith(".deprecated.config"):
                REFERENCE_CONFIGS.append(os.path.join(root, f))


@pytest.mark.parametrize("path", REFERENCE_CONFIGS, ids=lambda p: os.path.basename(p))
def test_parse_all_reference_configs(path):
    """Every upstream .config file must parse unchanged (public API)."""
    cfg = load_pipeline_config(path)
    m = cfg.model.second
    assert m is not None
    assert m.network_class_name.startswith("VoxelNet")
    assert len(m.voxel_generator.point_cloud_range) == 6
    assert len(m.target_assigner.class_settings) >= 1
    assert cfg.train_config.steps > 0
    for cs in m.target_assigner.class_settings:
        assert cs.class_name != ""


def test_config_tool_train_helpers():
    from second_tpu.utils import config_tool

    import pathlib
    cfg = config_tool.read_config(
        pathlib.Path(REF_CONFIG_DIR) / "car.lite.config")
    tc = cfg.train_config

    config_tool.manual_stepping(tc, [0.8, 0.9], [1e-4, 1e-5, 1e-6])
    lr = tc.optimizer.adam_optimizer.learning_rate
    assert lr.WhichOneof("learning_rate") == "manual_stepping"
    assert list(lr.manual_stepping.rates) == [1e-4, 1e-5, 1e-6]

    config_tool.exp_decay(tc, 1e-3, 0.1, 0.8, staircase=False)
    assert lr.WhichOneof("learning_rate") == "exponential_decay"
    assert lr.exponential_decay.decay_factor == 0.8

    config_tool.one_cycle(tc, 3e-3, [0.95, 0.85], 10.0, 0.4)
    assert lr.WhichOneof("learning_rate") == "one_cycle"
    assert lr.one_cycle.lr_max == 3e-3

    config_tool.set_train_step(cfg, epochs=10, eval_epoch=2,
                               num_examples=100)
    bs = cfg.train_input_reader.batch_size
    per_epoch = (100 + bs - 1) // bs
    assert tc.steps == per_epoch * 10
    assert tc.steps_per_eval == per_epoch * 2

    config_tool.disable_sample(cfg)
    assert not (cfg.train_input_reader.preprocess.database_sampler.database_info_path)
    config_tool.disable_per_gt_aug(cfg)
    config_tool.disable_global_aug(cfg)
    prep = cfg.train_input_reader.preprocess
    assert list(prep.global_rotation_uniform_noise) == [0.0, 0.0]

    # schedule builders accept the mutated config
    from second_tpu.train import schedules
    config_tool.manual_stepping(tc, [0.5], [1e-3, 1e-4])
    fn, _ = schedules.build(
        tc.optimizer.adam_optimizer.learning_rate, 100)
    assert abs(float(fn(10)) - 1e-3) < 1e-9
    assert abs(float(fn(90)) - 1e-4) < 1e-9


def test_message_rejects_unknown_attribute():
    from second_tpu.configs import schema

    loss = schema.ClassificationLoss.from_raw({})
    with pytest.raises(AttributeError, match="no field"):
        loss.sigmoid_focal = None  # typo for weighted_sigmoid_focal
    loss.weighted_sigmoid = None  # real field: fine
