#!/usr/bin/env python
"""Detection-quality proof: overfit PointPillars on a mini KITTI tree
and report official KITTI AP on the training frames.

The strongest end-to-end quality signal available without real KITTI
data: it exercises prep -> (device-voxelize, compact-target) training
-> checkpointing -> the flat-pillar eval path -> lidar->camera
conversion -> the official 41-point AP, and only passes when ALL of
them cooperate (it caught a spatially-biased voxel-truncation bug and
an out-of-range-GT config pitfall on its first runs).

Fixture constraints that the OFFICIAL metric itself imposes (all
learned the hard way — round 2 ran 4 frames x 4 cars and concluded the
detector was broken when the metric was saturated):

  * >= 41 valid GT total.  The 41-point curve takes one threshold per
    ~1/40 recall step (utils/eval.py get_thresholds, reference
    eval.py:12-31); with N < 41 GT only N of the 41 precision entries
    are ever filled and the 11-point mAP subsample caps at
    ceil(N/4)/11 — e.g. 16 GT caps at 36.36 even for PERFECT
    detections.  This tool uses 8 frames x 8 cars = 64 GT.
  * Non-overlapping cars (make_scene min_gap): rotated NMS and the
    KITTI matcher both assume physically-plausible scenes; GT boxes
    with pairwise IoU > nms_iou can never all be recalled.
  * Cars inside the camera frustum (|azimuth| < ~40 deg for the
    fixture calib): convert_detection_to_kitti_annos drops detections
    that project outside the image (reference kitti_dataset.py:77-80),
    so out-of-frustum GT are unrecallable by construction.
  * direction_limit_offset 0: the xyres_16 config ships with 1, which
    reproduces the reference's yaw-flip bit-for-bit (see README) but
    zeroes AOS; the proof needs the corrected reconstruction.

Usage:
  python tools/overfit_ap.py --steps 1000        (TPU, ~6 min)
  JAX_PLATFORMS=cpu python tools/overfit_ap.py   (CPU, much slower)

Writes OVERFIT_AP.json next to the repo root (or --json PATH).
"""

import argparse
import json
import re
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def run(steps=1000, frames=8, out=None, seed=3, json_path=None):
    import os

    # honor an explicit CPU request like the train CLI does
    # (train/__main__.py:589): the axon TPU plugin overrides the
    # JAX_PLATFORMS env var at interpreter start, and this tool calls
    # train() directly, bypassing the CLI's own honor block
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

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
    # x in [7, 15.48], y in [-5.24, 5.24]: inside both the clipped
    # detection range and the camera frustum; min_gap 4.6 m keeps the
    # 8 cars pairwise disjoint (car diagonal ~4.2 m)
    ids = build_kitti_dir(
        root, num_frames=frames, seed=seed,
        scene_kwargs=dict(num_cars=8, x_range=(2.0, 20.48),
                          y_range=(-10.24, 10.24), min_gap=4.6))
    create_kitti_info_file(
        str(root), train_img_ids=ids, val_img_ids=ids, test_img_ids=[])

    cfg = read_config(
        "/root/reference/second/configs/pointpillars/car/xyres_16.config")
    change_detection_range(cfg.model.second, [0.0, -10.24, 20.48, 10.24])
    cfg.model.second.direction_limit_offset = 0.0
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
    block = tail[:tail.find("@0.70, 0.50")]  # the strict-overlap block
    res = {}
    for key, pat in (("bbox", r"bbox AP:([0-9.]+)"),
                     ("bev", r"bev  AP:([0-9.]+)"),
                     ("3d", r"3d   AP:([0-9.]+)"),
                     ("aos", r"aos  AP:([0-9.]+)")):
        m = re.search(pat, block)
        res[key] = float(m.group(1)) if m else float("nan")
    res.update(steps=steps, frames=frames, num_gt=frames * 8, seed=seed)
    jp = Path(json_path) if json_path else REPO / "OVERFIT_AP.json"
    jp.write_text(json.dumps(res, indent=2) + "\n")
    print(f"wrote {jp}: {res}")
    return res


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    res = run(args.steps, args.frames, args.out, json_path=args.json)
    print(f"\noverfit AP: bev={res['bev']:.2f} 3d={res['3d']:.2f} "
          f"aos={res['aos']:.2f}")
    ok = res["3d"] >= 85.0 and res["aos"] >= 80.0
    print("PASS" if ok else "FAIL", "(targets: 3d >= 85, aos >= 80)")
    sys.exit(0 if ok else 1)
