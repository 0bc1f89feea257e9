"""Group sampling + per-object global-rotation placement
(reference sample_ops.py:287-353, preprocess.py:317-449, 487-580)."""

import numpy as np
import pytest

from second_tpu.core import preprocess as prep
from second_tpu.core import sample_ops


def _boxes(rng, n, spread=30.0):
    b = np.zeros((n, 7))
    ang = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(10, spread, n)
    b[:, 0] = r * np.sin(ang)
    b[:, 1] = r * np.cos(ang)
    b[:, 2] = -1.0
    b[:, 3:6] = rng.uniform(1.5, 4.0, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_global_rot_placement_preserves_range():
    rng = np.random.RandomState(0)
    boxes = _boxes(rng, 6)
    r_before = np.hypot(boxes[:, 0], boxes[:, 1]).copy()
    np.random.seed(1)
    prep.noise_per_object_v3_(
        boxes, None, None, rotation_perturb=0.0, center_noise_std=0.0,
        global_random_rot_range=[np.pi / 2, np.pi * 3 / 2], num_try=100)
    r_after = np.hypot(boxes[:, 0], boxes[:, 1])
    np.testing.assert_allclose(r_after, r_before, atol=1e-6)
    # at least some boxes actually moved
    assert (np.abs(boxes[:, 6]) > 0).any()


def test_group_noise_coherent():
    """Same-group members share the rotation noise and keep their
    relative geometry (rigid group motion)."""
    rng = np.random.RandomState(2)
    boxes = _boxes(rng, 4)
    # two groups of two, members adjacent
    boxes[1, :2] = boxes[0, :2] + [3.0, 0.0]
    boxes[3, :2] = boxes[2, :2] + [0.0, 3.0]
    group_ids = np.array([0, 0, 1, 1])
    d01 = np.linalg.norm(boxes[0, :2] - boxes[1, :2])
    d23 = np.linalg.norm(boxes[2, :2] - boxes[3, :2])
    np.random.seed(3)
    prep.noise_per_object_v3_(
        boxes, None, None, rotation_perturb=[-0.8, 0.8],
        center_noise_std=[0.5, 0.5, 0.0],
        global_random_rot_range=[0.0, 0.0],
        group_ids=group_ids, num_try=100)
    # rigid: within-group distances preserved
    np.testing.assert_allclose(
        np.linalg.norm(boxes[0, :2] - boxes[1, :2]), d01, atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(boxes[2, :2] - boxes[3, :2]), d23, atol=1e-6)


def test_group_sampler(tmp_path):
    """DataBaseSamplerV2 with a multi-class group: whole groups are
    sampled together with shared group ids."""
    rng = np.random.RandomState(4)
    # fabricate db infos: 6 groups of (car, trailer) pairs
    db_infos = {"car": [], "trailer": []}
    for g in range(6):
        base = rng.uniform(-20, 20, 2)
        for k, name in enumerate(("car", "trailer")):
            pts = rng.randn(30, 4).astype(np.float32) * 0.5
            path = tmp_path / f"{name}_{g}.bin"
            pts.tofile(str(path))
            box = np.array([
                base[0] + 4.0 * k, base[1], -1.0, 1.8, 4.5, 1.5,
                rng.uniform(-np.pi, np.pi)])
            db_infos[name].append({
                "name": name, "path": path.name, "image_idx": g,
                "gt_idx": k, "box3d_lidar": box, "num_points_in_gt": 30,
                "difficulty": 0, "group_id": g,
            })
    sampler = sample_ops.DataBaseSamplerV2(
        db_infos, groups=[{"car": 4, "trailer": 4}], rate=1.0,
        global_rot_range=[0.0, 0.0])
    assert sampler.use_group_sampling

    gt_boxes = _boxes(rng, 2, spread=45.0)
    res = sampler.sample_all(
        str(tmp_path), gt_boxes, np.array(["car", "car"]),
        num_point_features=4,
        gt_group_ids=np.array([0, 1]))
    assert res is not None
    names = list(res["gt_names"])
    gids = list(res["group_ids"])
    # groups arrive whole: every sampled group id appears exactly twice
    # (one car + one trailer) unless rejected entirely
    from collections import Counter
    counts = Counter(gids)
    assert all(v == 2 for v in counts.values())
    for gid in counts:
        members = [n for n, g in zip(names, gids) if g == gid]
        assert sorted(members) == ["car", "trailer"]
    # sampled group ids don't clash with gt group ids
    assert min(counts) > 1
    assert res["points"].shape[1] == 4


def test_group_sampler_with_global_rot(tmp_path):
    rng = np.random.RandomState(5)
    db_infos = {"car": []}
    for g in range(8):
        pts = rng.randn(20, 4).astype(np.float32) * 0.5
        path = tmp_path / f"car_{g}.bin"
        pts.tofile(str(path))
        box = np.array([rng.uniform(-30, 30), rng.uniform(-30, 30),
                        -1.0, 1.8, 4.5, 1.5, 0.0])
        db_infos["car"].append({
            "name": "car", "path": path.name, "image_idx": g,
            "gt_idx": 0, "box3d_lidar": box, "num_points_in_gt": 20,
            "difficulty": 0, "group_id": g,
        })
    sampler = sample_ops.DataBaseSamplerV2(
        db_infos, groups=[{"car": 5}], rate=1.0,
        global_rot_range=[np.pi / 4, np.pi * 7 / 4])
    assert sampler._enable_global_rot
    gt_boxes = _boxes(rng, 1)
    np.random.seed(6)
    res = sampler.sample_all(
        str(tmp_path), gt_boxes, np.array(["car"]), num_point_features=4)
    assert res is not None and len(res["gt_names"]) > 0
    # placement preserves each sample's range from origin
    for s_box in res["gt_boxes"]:
        assert np.isfinite(s_box).all()
