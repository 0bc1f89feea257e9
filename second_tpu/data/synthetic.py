"""Synthetic LiDAR scenes for tests and benchmarks.

There is no real KITTI data in CI; these helpers build plausible scenes
(ground plane + boxes with interior points) and assemble full static
train examples (voxelization + target assignment) through the same
builder objects the real pipeline uses.
"""

import numpy as np

from ..core import box_ops


def make_scene(rng, num_objects=5, num_bg_points=8000,
               x_range=(0.0, 70.4), y_range=(-40.0, 40.0),
               points_per_object=120, size_mean=(1.6, 3.9, 1.56)):
    """Returns (points [N, 4], gt_boxes [M, 7], gt_names [M])."""
    gx = rng.uniform(x_range[0] + 5, x_range[1] - 5, num_objects)
    gy = rng.uniform(y_range[0] + 5, y_range[1] - 5, num_objects)
    gz = rng.uniform(-1.8, -1.4, num_objects)
    sizes = np.abs(rng.normal(size_mean, [0.1, 0.3, 0.1],
                              (num_objects, 3)))
    yaw = rng.uniform(-np.pi, np.pi, num_objects)
    gt_boxes = np.stack([gx, gy, gz, sizes[:, 0], sizes[:, 1], sizes[:, 2],
                         yaw], axis=1).astype(np.float32)

    bg = np.stack([
        rng.uniform(*x_range, num_bg_points),
        rng.uniform(*y_range, num_bg_points),
        rng.uniform(-2.0, -1.6, num_bg_points),
        rng.uniform(0, 1, num_bg_points),
    ], axis=1)

    obj_points = []
    for b in gt_boxes:
        local = rng.uniform(
            [-b[3] / 2, -b[4] / 2, 0], [b[3] / 2, b[4] / 2, b[5]],
            (points_per_object, 3))
        pts = box_ops.rotation_points_single_angle(
            local.astype(np.float64), -b[6], axis=2)
        pts[:, 0] += b[0]
        pts[:, 1] += b[1]
        pts[:, 2] += b[2]
        inten = rng.uniform(0, 1, (points_per_object, 1))
        obj_points.append(np.concatenate([pts, inten], axis=1))
    points = np.concatenate([bg] + obj_points).astype(np.float32)
    rng.shuffle(points)
    names = np.array(["Car"] * num_objects)
    return points, gt_boxes, names


def assemble_example(parts, scenes, max_voxels=None):
    """scenes: list of (points, gt_boxes, gt_names) -> batched train example.

    Uses the built voxel_generator / target_assigner / anchor_cache from
    builders.build_network, mirroring prep_pointcloud's voxelize +
    assign steps (reference second/data/preprocess.py:302-408) with the
    fixed-shape (multi-gpu style) padding contract.
    """
    gen = parts["voxel_generator"]
    ta = parts["target_assigner"]
    cache = parts["anchor_cache"]
    max_voxels = max_voxels or 12000
    B = len(scenes)
    T = gen.max_num_points_per_voxel
    anchors = cache["anchors"].astype(np.float32)
    A = anchors.shape[0]
    code = ta.box_coder.code_size
    nf = scenes[0][0].shape[1]

    ex = {
        "voxels": np.zeros((B, max_voxels, T, nf), np.float32),
        "num_points": np.zeros((B, max_voxels), np.int32),
        "coordinates": np.full((B, max_voxels, 3), -1, np.int32),
        "anchors": np.broadcast_to(anchors, (B, A, anchors.shape[1])).copy(),
        "labels": np.zeros((B, A), np.int32),
        "reg_targets": np.zeros((B, A, code), np.float32),
        "importance": np.ones((B, A), np.float32),
    }
    for b, (points, gt_boxes, gt_names) in enumerate(scenes):
        res = gen.generate_multi_gpu(points, max_voxels=max_voxels)
        n = res["voxel_num"]
        ex["voxels"][b] = res["voxels"]
        ex["num_points"][b] = res["num_points_per_voxel"]
        ex["coordinates"][b, :n] = res["coordinates"][:n]
        anchors_dict = cache["anchors_dict"]
        gt_classes = np.array(
            [ta.classes.index(n_) + 1 for n_ in gt_names], dtype=np.int32)
        targets = ta.assign(
            anchors, anchors_dict, gt_boxes, anchors_mask=None,
            gt_classes=gt_classes, gt_names=list(gt_names),
            matched_thresholds=cache["matched_thresholds"],
            unmatched_thresholds=cache["unmatched_thresholds"])
        ex["labels"][b] = targets["labels"]
        ex["reg_targets"][b] = targets["bbox_targets"]
        if "importance" in targets:
            ex["importance"][b] = targets["importance"]
    return ex
