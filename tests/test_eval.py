import numpy as np
import pytest

from second_tpu.native import eval_native
from second_tpu.utils import eval as kitti_eval


def make_anno(boxes_cam, names, scores=None, bbox=None, occluded=None,
              truncated=None, alpha=None):
    """boxes_cam: [N, 7] camera (x, y, z, l, h, w, ry)."""
    n = len(boxes_cam)
    boxes_cam = np.asarray(boxes_cam, np.float64).reshape(n, 7)
    anno = {
        "name": np.array(names),
        "truncated": np.asarray(
            truncated if truncated is not None else np.zeros(n)),
        "occluded": np.asarray(
            occluded if occluded is not None else np.zeros(n, np.int64)),
        "alpha": np.asarray(alpha if alpha is not None else np.zeros(n)),
        "bbox": np.asarray(
            bbox if bbox is not None
            else np.tile([0.0, 0.0, 100.0, 100.0], (n, 1))),
        "location": boxes_cam[:, :3],
        "dimensions": boxes_cam[:, 3:6],
        "rotation_y": boxes_cam[:, 6],
    }
    if scores is not None:
        anno["score"] = np.asarray(scores, np.float64)
    else:
        anno["score"] = np.zeros(n)
    return anno


def random_cam_boxes(rng, n):
    out = np.zeros((n, 7))
    out[:, 0] = rng.uniform(-20, 20, n)
    out[:, 1] = rng.uniform(0, 3, n)
    out[:, 2] = rng.uniform(5, 60, n)
    out[:, 3:6] = rng.uniform(1.2, 4.5, (n, 3))
    out[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return out


class TestOverlaps:
    def test_image_overlap_identity(self):
        b = np.array([[0.0, 0, 10, 10]])
        np.testing.assert_allclose(kitti_eval.image_box_overlap(b, b), [[1.0]])

    def test_bev_overlap_identity(self):
        b = np.array([[0.0, 0, 3, 4, 0.3]])
        np.testing.assert_allclose(
            kitti_eval.bev_box_overlap(b, b), [[1.0]], atol=1e-6)

    def test_3d_overlap_camera_convention(self):
        # camera format: y is height axis, y points DOWN, y = box bottom
        b = np.array([[0.0, 1.0, 10.0, 2.0, 1.5, 4.0, 0.0]])
        np.testing.assert_allclose(
            kitti_eval.box3d_overlap(b, b, z_axis=1, z_center=1.0),
            [[1.0]], atol=1e-6)
        # half-height offset cuts the vertical overlap in half
        b2 = b.copy()
        b2[0, 1] += 0.75
        iou = kitti_eval.box3d_overlap(b, b2, z_axis=1, z_center=1.0)[0, 0]
        np.testing.assert_allclose(iou, 0.5 / 1.5, atol=1e-6)


class TestMatcherParity:
    @pytest.mark.skipif(not eval_native.available(), reason="no native lib")
    @pytest.mark.parametrize("compute_fp", [False, True])
    @pytest.mark.parametrize("metric", [0, 2])
    def test_native_matches_python(self, compute_fp, metric):
        rng = np.random.RandomState(0)
        for trial in range(20):
            num_gt = rng.randint(0, 12)
            num_dt = rng.randint(0, 15)
            overlaps = rng.uniform(0, 1, (num_dt, num_gt))
            gt_datas = rng.uniform(0, 100, (num_gt, 5))
            dt_datas = rng.uniform(0, 1, (num_dt, 6))
            dt_datas[:, :4] = rng.uniform(0, 100, (num_dt, 4))
            ignored_gt = rng.choice([-1, 0, 1], num_gt)
            ignored_det = rng.choice([-1, 0, 1], num_dt)
            num_dc = rng.randint(0, 3)
            dc = rng.uniform(0, 100, (num_dc, 4)) if num_dc else np.zeros((0, 4))
            args = (overlaps, gt_datas, dt_datas,
                    ignored_gt.astype(np.int64), ignored_det.astype(np.int64),
                    dc, metric, 0.5, 0.3, compute_fp, True)
            got = eval_native.compute_statistics(*args)
            want = kitti_eval._compute_statistics_py(*args)
            assert got[:3] == want[:3], f"trial {trial}"
            assert got[3] == pytest.approx(want[3])
            np.testing.assert_allclose(got[4], want[4])


class TestAP:
    def _perfect_annos(self, num_frames=30, per_frame=3, seed=0):
        # >= 41 valid gts so the 41 recall samples all materialize
        # (with fewer gts the trailing samples are 0 — same upstream)
        rng = np.random.RandomState(seed)
        gt, dt = [], []
        for _ in range(num_frames):
            boxes = random_cam_boxes(rng, per_frame)
            gt.append(make_anno(boxes, ["Car"] * per_frame))
            dt.append(make_anno(
                boxes, ["Car"] * per_frame,
                scores=rng.uniform(0.5, 1.0, per_frame),
                alpha=np.full(per_frame, -10.0)))
        return gt, dt

    def test_perfect_detection_ap_100(self):
        gt, dt = self._perfect_annos()
        res = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
        for key, vals in res["detail"]["Car"].items():
            np.testing.assert_allclose(
                vals, [100.0, 100.0, 100.0], atol=0.1, err_msg=key)
        assert "Car AP(Average Precision)@0.70, 0.70, 0.70" in res["result"]

    def test_missed_half_reduces_ap(self):
        rng = np.random.RandomState(1)
        gt, dt = [], []
        for f in range(10):
            boxes = random_cam_boxes(rng, 4)
            gt.append(make_anno(boxes, ["Car"] * 4))
            # detect only the first two
            dt.append(make_anno(
                boxes[:2], ["Car"] * 2, scores=[0.9, 0.8],
                alpha=np.full(2, -10.0)))
        res = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
        ap3d = res["detail"]["Car"]["3d@0.70"]
        assert 40 < ap3d[0] < 60  # ~50% recall, full precision

    def test_false_positives_reduce_precision(self):
        rng = np.random.RandomState(2)
        gt, dt = [], []
        for f in range(10):
            boxes = random_cam_boxes(rng, 2)
            fakes = random_cam_boxes(rng, 2) + 200  # far away, no overlap
            gt.append(make_anno(boxes, ["Car"] * 2))
            dt.append(make_anno(
                np.concatenate([boxes, fakes]), ["Car"] * 4,
                scores=[0.9, 0.85, 0.8, 0.75], alpha=np.full(4, -10.0)))
        res = kitti_eval.get_official_eval_result(gt, dt, ["Car"])
        ap3d = res["detail"]["Car"]["3d@0.70"]
        assert ap3d[0] < 95

    def test_difficulty_filters(self):
        # a tiny gt bbox (height < 40px) is ignored at easy difficulty
        boxes = random_cam_boxes(np.random.RandomState(3), 1)
        gt = [make_anno(boxes, ["Car"], bbox=[[0, 0, 30, 30]])]
        dt = [make_anno(boxes, ["Car"], scores=[0.9],
                        bbox=[[0, 0, 30, 30]], alpha=[-10.0])]
        num_valid, ignored_gt, ignored_dt, dc = kitti_eval.clean_data(
            gt[0], dt[0], 0, 0)
        assert num_valid == 0 and ignored_gt == [1]
        # moderate allows it (height 30 > 25)
        num_valid, ignored_gt, _, _ = kitti_eval.clean_data(gt[0], dt[0], 0, 1)
        assert num_valid == 1 and ignored_gt == [0]
        # hard
        num_valid, ignored_gt, _, _ = kitti_eval.clean_data(gt[0], dt[0], 0, 2)
        assert ignored_gt == [0] and num_valid == 1

    def test_van_is_ignored_not_fp_for_car(self):
        boxes = random_cam_boxes(np.random.RandomState(4), 1)
        gt = [make_anno(boxes, ["Van"])]
        num_valid, ignored_gt, _, _ = kitti_eval.clean_data(
            gt[0], gt[0], 0, 2)
        assert ignored_gt == [1] and num_valid == 0

    def test_coco_eval_runs(self):
        gt, dt = self._perfect_annos(num_frames=30)
        res = kitti_eval.get_coco_eval_result(gt, dt, ["Car"])
        assert "coco AP@0.50:0.05:0.95" in res["result"]
        np.testing.assert_allclose(
            res["detail"]["Car"]["3d"], [100.0] * 3, atol=0.5)


def test_get_thresholds():
    scores = np.linspace(1.0, 0.1, 20)
    th = kitti_eval.get_thresholds(scores.copy(), 20)
    assert len(th) > 0
    assert all(t1 >= t2 for t1, t2 in zip(th, th[1:]))


def test_dataset_evaluation_perfect_detections(tmp_path):
    """Perfect lidar detections through the FULL KittiDataset.evaluation
    chain (lidar z-center -> camera conversion -> image projection ->
    official AP) must score ~100.

    Guards two seams no unit test crosses: the detection->KITTI-anno
    conversion (reference kitti_dataset.py:38-107) and the >=41-GT
    requirement of the 41-point metric (round 2's overfit proof ran
    16 GT and the saturated metric read as a broken detector)."""
    import pickle
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from kitti_fixture import build_kitti_dir

    from second_tpu.core import box_ops
    from second_tpu.data.kitti_dataset import (
        KittiDataset,
        create_kitti_info_file,
    )

    root = tmp_path / "kitti"
    # 8 frames x 8 in-frustum, non-overlapping cars = 64 valid GT
    ids = build_kitti_dir(
        root, num_frames=8, seed=5,
        scene_kwargs=dict(num_cars=8, x_range=(2.0, 20.48),
                          y_range=(-10.24, 10.24), min_gap=4.6))
    create_kitti_info_file(
        str(root), train_img_ids=ids, val_img_ids=ids, test_img_ids=[])
    with open(root / "kitti_infos_val.pkl", "rb") as f:
        infos = pickle.load(f)

    ds = KittiDataset(str(root), str(root / "kitti_infos_val.pkl"),
                      class_names=["Car"])
    rng = np.random.RandomState(0)
    dets = []
    for info in infos:
        annos = info["annos"]
        gt_cam = np.concatenate(
            [annos["location"], annos["dimensions"],
             annos["rotation_y"][:, None]], axis=1)
        gt_lidar = box_ops.box_camera_to_lidar(
            gt_cam, info["calib"]["R0_rect"],
            info["calib"]["Tr_velo_to_cam"])
        gt_lidar[:, 2] += gt_lidar[:, 5] / 2  # bottom -> center
        n = len(gt_lidar)
        dets.append({
            "box3d_lidar": gt_lidar.astype(np.float32),
            "scores": rng.uniform(0.5, 1.0, n).astype(np.float32),
            "label_preds": np.zeros(n, np.int64),
            "metadata": {"image_idx": info["image"]["image_idx"]},
        })
    res = ds.evaluation(dets, str(tmp_path / "eval_out"))
    detail = res["detail"]["eval.kitti"]["official"]["Car"]
    checked = 0
    for key, vals in detail.items():
        if "@0.70" in key or key.startswith("aos"):
            np.testing.assert_allclose(
                vals, [100.0] * 3, atol=1.5, err_msg=key)
            checked += 1
    assert checked >= 4, sorted(detail)
