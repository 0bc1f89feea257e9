"""Programmatic multi-run experiment helpers (reference
second/script.py + second/script_server.py): mutate a config in Python,
then train/evaluate each variant.

    python -m second_tpu.script train_multi_rpn_layer_num \
        --config_path=... --base_model_dir=...
"""

from pathlib import Path

from .configs import load_pipeline_config
from .train.__main__ import evaluate, train


def train_multi_rpn_layer_num(config_path, base_model_dir,
                              layer_nums_list=((2, 2, 2), (3, 5, 5))):
    """Train one model per RPN depth setting (reference script.py:8)."""
    for layer_nums in layer_nums_list:
        cfg = load_pipeline_config(config_path)
        cfg.model.second.rpn.layer_nums = list(layer_nums)
        name = "rpn_" + "_".join(str(n) for n in layer_nums)
        model_dir = Path(base_model_dir) / name
        model_dir.mkdir(parents=True, exist_ok=True)
        tmp_cfg = model_dir / "input.config"
        with open(tmp_cfg, "w") as f:
            f.write(cfg.to_text())
        train(str(tmp_cfg), str(model_dir))


def train_configs(config_paths, base_model_dir, resume=False):
    """Sequentially train a list of configs (script_server-style)."""
    for config_path in config_paths:
        name = Path(config_path).stem
        model_dir = Path(base_model_dir) / name
        train(str(config_path), str(model_dir), resume=resume)


def eval_multi_threshold(config_path, model_dir, score_thresholds=(0.3, 0.5)):
    """Evaluate one checkpoint under several score thresholds
    (reference script.py eval helpers)."""
    results = {}
    for thr in score_thresholds:
        cfg = load_pipeline_config(config_path)
        for cs in cfg.model.second.target_assigner.class_settings:
            cs.nms_score_threshold = float(thr)
        tmp_cfg = Path(model_dir) / f"eval_thr{thr}.config"
        with open(tmp_cfg, "w") as f:
            f.write(cfg.to_text())
        results[thr] = evaluate(
            str(tmp_cfg), model_dir,
            result_path=str(Path(model_dir) / f"eval_thr{thr}"))
    return results


def nuscenes_modify_step(config, epochs, eval_epoch, data_sample_factor,
                         num_examples=None):
    """Switch the NuScenes subsample variant and set step counts
    (reference script_server.py:21-50; the train_nuscenes_* wrappers
    there are hardcoded personal paths and are not replicated).
    """
    factor_to_name = {i: f"NuScenesDatasetD{i}" for i in range(2, 9)}
    factor_to_name[1] = "NuScenesDataset"
    dataset_name = factor_to_name[data_sample_factor]
    input_cfg = config.train_input_reader
    input_cfg.dataset.dataset_class_name = dataset_name
    if num_examples is None:
        from .data.dataset import get_dataset_class
        ds = get_dataset_class(dataset_name)(
            root_path=input_cfg.dataset.kitti_root_path,
            info_path=input_cfg.dataset.kitti_info_path)
        num_examples = len(ds)
    from .utils.config_tool import set_train_step
    set_train_step(config, epochs, eval_epoch, num_examples=num_examples)
    return config


def train_nuscenes_variant(config_path, model_dir_root, tag,
                           epochs=50, eval_epoch=5, data_sample_factor=8,
                           pretrained_path=None, resume=False):
    """Dated experiment launcher (the generic shape of every
    script_server.py train_nuscenes_* wrapper, script_server.py:53-221):
    pick a subsample variant, derive step counts, train into
    model_dir_root/tag/test_<datetime> with optional pretrained
    weights."""
    import datetime

    cfg = load_pipeline_config(config_path)
    nuscenes_modify_step(cfg, epochs, eval_epoch, data_sample_factor)
    date_str = datetime.datetime.now().strftime("%y%m%d_%H%M%S")
    model_dir = Path(model_dir_root) / tag / f"test_{date_str}"
    model_dir.mkdir(parents=True, exist_ok=True)
    tmp_cfg = model_dir / "input.config"
    with open(tmp_cfg, "w") as f:
        f.write(cfg.to_text())
    return train(str(tmp_cfg), str(model_dir),
                 pretrained_path=pretrained_path, resume=resume)


def main():
    from .utils.fire_lite import fire

    fire({
        "train_multi_rpn_layer_num": train_multi_rpn_layer_num,
        "train_configs": train_configs,
        "eval_multi_threshold": eval_multi_threshold,
        "train_nuscenes_variant": train_nuscenes_variant,
    })


if __name__ == "__main__":
    main()
