import pickle

import numpy as np
import pytest

from second_tpu.builders import build_network
from second_tpu.builders import dataset_builder
from second_tpu.data.gt_database import create_groundtruth_database
from second_tpu.data.kitti_dataset import (
    KittiDataset,
    create_kitti_info_file,
    create_reduced_point_cloud,
)
from second_tpu.data.preprocess import merge_second_batch
from second_tpu.utils.config_tool import read_config

from kitti_fixture import build_kitti_dir

XYRES16 = "/root/reference/second/configs/pointpillars/car/xyres_16.config"
pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists(XYRES16), reason="reference configs absent"
)


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    ids = build_kitti_dir(root, num_frames=4)
    create_kitti_info_file(
        str(root), train_img_ids=ids[:3], val_img_ids=ids[3:],
        test_img_ids=[])
    create_reduced_point_cloud(str(root))
    create_groundtruth_database(
        "KittiDataset", str(root),
        info_path=str(root / "kitti_infos_train.pkl"))
    return root


@pytest.fixture(scope="module")
def cfg_and_parts(kitti_root):
    cfg = read_config(XYRES16)
    # point the config at the fixture dataset
    for reader, info in [(cfg.train_input_reader, "kitti_infos_train.pkl"),
                         (cfg.eval_input_reader, "kitti_infos_val.pkl")]:
        reader.dataset.kitti_info_path = str(kitti_root / info)
        reader.dataset.kitti_root_path = str(kitti_root)
    cfg.train_input_reader.preprocess.database_sampler.database_info_path = (
        str(kitti_root / "kitti_dbinfos_train.pkl"))
    parts = build_network(cfg.model.second)
    return cfg, parts


def test_info_files_created(kitti_root):
    with open(kitti_root / "kitti_infos_train.pkl", "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 3
    info = infos[0]
    assert info["image"]["image_shape"].tolist() == [375, 1242]
    assert "annos" in info and "difficulty" in info["annos"]
    assert "num_points_in_gt" in info["annos"]
    # objects have interior points
    assert (info["annos"]["num_points_in_gt"] > 0).any()


def test_reduced_clouds_created(kitti_root):
    reduced = list((kitti_root / "training" / "velodyne_reduced").glob("*.bin"))
    assert len(reduced) == 4
    pts = np.fromfile(str(reduced[0]), np.float32).reshape(-1, 4)
    full = np.fromfile(
        str(kitti_root / "training" / "velodyne" / reduced[0].name),
        np.float32).reshape(-1, 4)
    assert 0 < len(pts) <= len(full)
    # frustum culling keeps only points in front of the camera
    assert pts[:, 0].min() > 0


def test_gt_database_created(kitti_root):
    with open(kitti_root / "kitti_dbinfos_train.pkl", "rb") as f:
        dbinfos = pickle.load(f)
    assert "Car" in dbinfos
    info = dbinfos["Car"][0]
    pts = np.fromfile(
        str(kitti_root / info["path"]), np.float32).reshape(-1, 4)
    assert len(pts) == info["num_points_in_gt"]
    # cropped points are centered on the box
    assert np.abs(pts[:, :2]).max() < 6.0


def test_train_pipeline_example(cfg_and_parts):
    cfg, parts = cfg_and_parts
    dataset = dataset_builder.build(
        cfg.train_input_reader, cfg.model.second, training=True,
        voxel_generator=parts["voxel_generator"],
        target_assigner=parts["target_assigner"],
        anchor_cache=parts["anchor_cache"])
    assert len(dataset) == 3
    ex = dataset[0]
    V = cfg.train_input_reader.preprocess.max_number_of_voxels
    A = parts["anchor_cache"]["anchors"].shape[0]
    assert ex["voxels"].shape == (V, 100, 4)
    assert ex["coordinates"].shape == (V, 3)
    assert ex["num_points"].shape == (V,)
    assert ex["labels"].shape == (A,)
    assert ex["reg_targets"].shape == (A, 7)
    assert ex["anchors_mask"].shape == (A,)
    # db sampler pastes cars: positives exist
    assert (ex["labels"] == 1).sum() > 0
    assert (ex["labels"] == -1).sum() >= 0
    n = int(ex["num_voxels"][0])
    assert 0 < n <= V
    assert np.all(ex["coordinates"][n:] == -1)
    batch = merge_second_batch([dataset[0], dataset[1]])
    assert batch["voxels"].shape[0] == 2
    assert batch["labels"].shape == (2, A)


def test_eval_pipeline_and_perfect_ap(cfg_and_parts, kitti_root):
    cfg, parts = cfg_and_parts
    dataset = dataset_builder.build(
        cfg.eval_input_reader, cfg.model.second, training=False,
        voxel_generator=parts["voxel_generator"],
        target_assigner=parts["target_assigner"],
        anchor_cache=parts["anchor_cache"])
    assert len(dataset) == 1
    ex = dataset[0]
    assert "labels" not in ex
    assert ex["metadata"]["image_idx"] == 3

    # oracle detections = ground truth -> evaluation must run and agree
    sensor = dataset.get_sensor_data(0)
    gt_boxes = sensor["lidar"]["annotations"]["boxes"]
    det = {
        "box3d_lidar": gt_boxes,
        "scores": np.linspace(0.9, 0.5, len(gt_boxes)),
        "label_preds": np.zeros(len(gt_boxes), np.int64),
        "metadata": sensor["metadata"],
    }
    res = dataset.evaluation([det], None)
    assert "official" in res["results"]
    assert "Car AP" in res["results"]["official"]
    detail = res["detail"]["eval.kitti"]["official"]["Car"]
    # with 1 frame & few gts the 41-pt curve is sparse; just require
    # strong hard-difficulty AP (all gts matched)
    assert detail["3d@0.70"][2] > 5


def test_dataset_registry():
    from second_tpu.data.dataset import get_dataset_class

    assert get_dataset_class("KittiDataset") is KittiDataset
    with pytest.raises(KeyError):
        get_dataset_class("NopeDataset")


def test_fhd_pipeline_attaches_sparse_plan(kitti_root):
    """car.fhd through the data pipeline: DataLoader workers must attach
    the C++-built rulebooks (plan_* arrays) AND the per-stage
    (true_active, capacity) counts that the train loop surfaces as
    sparse_util_max (spconv-never-drops contract, middle.py:199-209)."""
    from second_tpu.native import sparse_plan as native_plan

    if not native_plan.available():
        pytest.skip("native library unavailable")

    cfg = read_config("/root/reference/second/configs/car.fhd.config")
    for reader, info in [(cfg.train_input_reader, "kitti_infos_train.pkl")]:
        reader.dataset.kitti_info_path = str(kitti_root / info)
        reader.dataset.kitti_root_path = str(kitti_root)
    cfg.train_input_reader.preprocess.database_sampler.\
        database_info_path = str(kitti_root / "kitti_dbinfos_train.pkl")
    parts = build_network(cfg.model.second)
    dataset = dataset_builder.build(
        cfg.train_input_reader, cfg.model.second, training=True,
        voxel_generator=parts["voxel_generator"],
        target_assigner=parts["target_assigner"],
        anchor_cache=parts["anchor_cache"])
    ex = dataset[0]
    plan_keys = [k for k in ex if k.startswith("plan_")]
    assert any(k.startswith("plan_subm") for k in plan_keys)
    assert any(k.startswith("plan_conv") for k in plan_keys)
    sac = ex["sparse_active_counts"]
    assert sac.ndim == 2 and sac.shape[1] == 2
    assert (sac[:, 0] > 0).all()
    # no overflow on fixture scenes at default capacity_factors
    assert (sac[:, 0] <= sac[:, 1]).all()
    # the train-side convert keeps the counts for metric surfacing
    from second_tpu.data.preprocess import merge_second_batch
    from second_tpu.train.__main__ import example_convert

    batch = example_convert(merge_second_batch([ex, ex]))
    assert batch["sparse_active_counts"].shape == (2,) + sac.shape
