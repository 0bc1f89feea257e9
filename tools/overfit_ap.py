#!/usr/bin/env python
"""Detection-quality proof: overfit PointPillars on a mini KITTI tree
and report official KITTI AP on the training frames.

The strongest end-to-end quality signal available without real KITTI
data: it exercises prep -> (device-voxelize, compact-target) training
-> checkpointing -> the flat-pillar eval path -> lidar->camera
conversion -> the official 41-point AP, and only passes when ALL of
them cooperate (it caught a spatially-biased voxel-truncation bug and
an out-of-range-GT config pitfall on its first runs).

Augmentation is disabled and GT cars are placed inside the clipped
detection range; BatchNorm running statistics need the last ~200
steps to be stable (torch momentum 0.01), hence the decaying-lr tail.

Usage:
  JAX_PLATFORMS=cpu python tools/overfit_ap.py --steps 1000
  (a TPU run is ~20x faster)
"""

import argparse
import re
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def run(steps=1000, frames=4, out=None, seed=3):
    import numpy as np  # noqa: F401

    from kitti_fixture import build_kitti_dir

    from second_tpu.configs import schema
    from second_tpu.data.kitti_dataset import create_kitti_info_file
    from second_tpu.train.__main__ import train
    from second_tpu.utils.config_tool import (
        change_detection_range,
        read_config,
    )

    tmp = Path(out or tempfile.mkdtemp(prefix="overfit_ap_"))
    root = tmp / "kitti"
    ids = build_kitti_dir(
        root, num_frames=frames, seed=seed,
        scene_kwargs=dict(x_range=(5.0, 18.0), y_range=(-8.0, 8.0)))
    create_kitti_info_file(
        str(root), train_img_ids=ids, val_img_ids=ids, test_img_ids=[])

    cfg = read_config(
        "/root/reference/second/configs/pointpillars/car/xyres_16.config")
    change_detection_range(cfg.model.second, [0.0, -10.24, 20.48, 10.24])
    for reader, tr in ((cfg.train_input_reader, True),
                       (cfg.eval_input_reader, False)):
        reader.dataset.kitti_root_path = str(root)
        reader.dataset.kitti_info_path = str(
            root / ("kitti_infos_train.pkl" if tr
                    else "kitti_infos_val.pkl"))
        reader.batch_size = 2
        reader.preprocess.max_number_of_voxels = 6000
        reader.preprocess.num_workers = 0
        reader.preprocess.database_sampler = schema.Sampler.from_raw({})
    p = cfg.train_input_reader.preprocess
    p.groundtruth_localization_noise_std = [0.0, 0.0, 0.0]
    p.groundtruth_rotation_uniform_noise = [0.0, 0.0]
    p.global_rotation_uniform_noise = [0.0, 0.0]
    p.global_scaling_uniform_noise = [1.0, 1.0]
    p.global_random_rotation_range_per_object = [0.0, 0.0]
    p.global_translate_noise_std = [0.0, 0.0, 0.0]
    p.random_flip_x = False
    p.random_flip_y = False
    cfg.train_config.steps = steps
    cfg.train_config.steps_per_eval = steps * 2
    mod = tmp / "pp_overfit.config"
    mod.write_text(cfg.to_text())

    train(str(mod), str(tmp / "model"))
    log = (tmp / "model" / "log.txt").read_text()
    tail = log[log.rfind("Evaluation official"):]
    print(tail[:600])
    m = re.search(r"bev  AP:([0-9.]+)", tail)
    m3d = re.search(r"3d   AP:([0-9.]+)", tail)
    return float(m.group(1)), float(m3d.group(1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    bev, ap3d = run(args.steps, args.frames, args.out)
    print(f"\noverfit AP: bev={bev:.2f} 3d={ap3d:.2f}")
