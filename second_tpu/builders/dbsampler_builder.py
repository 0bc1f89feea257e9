"""DB sampler from proto config (reference
second/builder/dbsampler_builder.py:9-28 + preprocess_builder.py:3-13)."""

import pickle

from ..configs import schema
from ..core import preprocess as prep
from ..core.sample_ops import DataBaseSamplerV2


def build_db_preprocess(db_prep_config: schema.DatabasePreprocessingStep):
    which = db_prep_config.WhichOneof("database_preprocessing_step")
    if which == "filter_by_difficulty":
        cfg = db_prep_config.filter_by_difficulty
        return prep.DBFilterByDifficulty(list(cfg.removed_difficulties))
    if which == "filter_by_min_num_points":
        cfg = db_prep_config.filter_by_min_num_points
        return prep.DBFilterByMinNumPoint(dict(cfg.min_num_point_pairs))
    raise ValueError("unknown database prep type")


def build(sampler_config: schema.Sampler):
    cfg = sampler_config
    groups = [dict(g.name_to_max_num) for g in cfg.sample_groups]
    prepors = [build_db_preprocess(c) for c in cfg.database_prep_steps]
    db_prepor = prep.DataBasePreprocessor(prepors)
    rate = cfg.rate
    grot_range = list(cfg.global_random_rotation_range_per_object)
    if len(grot_range) == 0:
        grot_range = None
    with open(cfg.database_info_path, "rb") as f:
        db_infos = pickle.load(f)
    return DataBaseSamplerV2(db_infos, groups, db_prepor, rate, grot_range)
