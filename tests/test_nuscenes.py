import pickle

import numpy as np
import pytest

from second_tpu.data.dataset import get_dataset_class


def make_nusc_infos(tmp_path, num_frames=3, sweeps_per_frame=2):
    """Fake NuScenes info pkl + lidar bins (5-feature points)."""
    rng = np.random.RandomState(0)
    infos = []
    lidar_dir = tmp_path / "sweeps"
    lidar_dir.mkdir(exist_ok=True)
    for i in range(num_frames):
        def write_bin(name, n=2000):
            pts = np.concatenate([
                rng.uniform(-40, 40, (n, 2)),
                rng.uniform(-2, 2, (n, 1)),
                rng.uniform(0, 255, (n, 1)),
                np.zeros((n, 1)),
            ], axis=1).astype(np.float32)
            path = lidar_dir / name
            pts.tofile(str(path))
            return str(path)

        sweeps = []
        for s in range(sweeps_per_frame):
            ang = 0.05 * (s + 1)
            c, si = np.cos(ang), np.sin(ang)
            sweeps.append({
                "lidar_path": write_bin(f"{i}_sweep{s}.bin", 500),
                "timestamp": (1e6 * (100 + i)) - 1e5 * (s + 1),
                "sweep2lidar_rotation": np.array(
                    [[c, -si, 0], [si, c, 0], [0, 0, 1]]),
                "sweep2lidar_translation": np.array([0.5 * (s + 1), 0.0, 0.0]),
            })
        n_gt = 4
        gt_boxes = np.concatenate([
            rng.uniform(-30, 30, (n_gt, 2)),
            rng.uniform(-1, 0, (n_gt, 1)),
            rng.uniform(0.5, 4, (n_gt, 3)),
            rng.uniform(-3, 3, (n_gt, 1)),
        ], axis=1)
        infos.append({
            "lidar_path": write_bin(f"{i}_key.bin"),
            "cam_front_path": str(lidar_dir / "nope.jpg"),
            "token": f"tok{i}",
            "sweeps": sweeps,
            "lidar2ego_translation": [0, 0, 1.8],
            "lidar2ego_rotation": [1, 0, 0, 0],
            "ego2global_translation": [100.0 * i, 0, 0],
            "ego2global_rotation": [1, 0, 0, 0],
            "timestamp": 1e6 * (100 + i),
            "gt_boxes": gt_boxes,
            "gt_names": np.array(["car", "pedestrian", "car", "bus"][:n_gt]),
            "gt_velocity": rng.normal(size=(n_gt, 2)),
            "num_lidar_pts": np.array([20, 10, 3, 50]),
            "num_radar_pts": np.zeros(n_gt, np.int64),
        })
    info_path = tmp_path / "infos_train.pkl"
    with open(info_path, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "v1.0-mini"}}, f)
    return info_path


@pytest.fixture()
def nusc(tmp_path):
    info_path = make_nusc_infos(tmp_path)
    cls = get_dataset_class("NuScenesDataset")
    return cls(root_path=tmp_path, info_path=info_path,
               class_names=["car", "pedestrian", "bus"])


def test_sweep_accumulation(nusc):
    data = nusc.get_sensor_data(0)
    pts = data["lidar"]["points"]
    assert pts.shape[1] == 4  # x, y, z, time-lag
    assert pts.shape[0] == 2000 + 2 * 500
    # key frame points have zero lag; sweeps positive lag
    lags = pts[:, 3]
    assert np.all(lags[:2000] == 0)
    assert np.all(lags[2000:] > 0)


def test_annotations_filtered_by_lidar_pts(nusc):
    data = nusc.get_sensor_data(0)
    annos = data["lidar"]["annotations"]
    assert annos["boxes"].shape == (4, 7)  # all have pts > 0


def test_velocity_variant(tmp_path):
    info_path = make_nusc_infos(tmp_path)
    cls = get_dataset_class("NuScenesDatasetVelo")
    ds = cls(root_path=tmp_path, info_path=info_path,
             class_names=["car", "pedestrian", "bus"])
    data = ds.get_sensor_data(0)
    assert data["lidar"]["annotations"]["boxes"].shape == (4, 9)


def test_subsample_variants_registered():
    for n in range(2, 9):
        get_dataset_class(f"NuScenesDatasetD{n}")
    get_dataset_class("NuScenesDatasetD8Velo")
    get_dataset_class("NuScenesDatasetD2Velo")


def test_kitti_style_eval(nusc):
    # oracle detections from gt
    dets = []
    for i in range(len(nusc)):
        data = nusc.get_sensor_data(i)
        boxes = data["lidar"]["annotations"]["boxes"]
        names = data["lidar"]["annotations"]["names"]
        name_to_label = {"car": 0, "pedestrian": 1, "bus": 2}
        dets.append({
            "box3d_lidar": boxes,
            "scores": np.linspace(0.9, 0.5, len(boxes)),
            "label_preds": np.array([name_to_label[n] for n in names]),
            "metadata": data["metadata"],
        })
    res = nusc.evaluation_kitti(dets, None)
    assert "official" in res["results"]
    assert "car AP" in res["results"]["official"]
    # evaluation() falls back to kitti-style when the devkit is absent
    res2 = nusc.evaluation(dets, None)
    assert "kitti.official" in res2["results"] or "nusc" in res2["results"]


def test_inference_context(tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from kitti_fixture import build_kitti_dir

    from second_tpu.core.inference import InferenceContext
    from second_tpu.data.kitti_dataset import create_kitti_info_file
    from second_tpu.utils.config_tool import change_detection_range, read_config

    root = tmp_path / "kitti"
    ids = build_kitti_dir(root, num_frames=1, seed=5)
    create_kitti_info_file(
        str(root), train_img_ids=ids, val_img_ids=[], test_img_ids=[])
    cfg = read_config(
        "/root/reference/second/configs/pointpillars/car/xyres_16.config")
    change_detection_range(cfg.model.second, [0.0, -10.24, 20.48, 10.24])
    cfg.eval_input_reader.preprocess.max_number_of_voxels = 2000
    ctx = InferenceContext()
    ctx.build(cfg)
    ctx.init_random()
    with open(root / "kitti_infos_train.pkl", "rb") as f:
        info = pickle.load(f)[0]
    points = np.fromfile(
        str(root / "training" / "velodyne" / "000000.bin"),
        np.float32).reshape(-1, 4)
    example = ctx.get_inference_input_dict(info, points)
    dets = ctx.inference(example)
    assert len(dets) == 1
    assert dets[0]["box3d_lidar"].shape[1] == 7


def test_nuscenes_cli_train_smoke(tmp_path):
    """Full train->eval loop over the synthetic NuScenes tree through
    the real train() entry point with all.pp.lowa.config (shrunk)."""
    import os

    cfg_path = "/root/reference/second/configs/nuscenes/all.pp.lowa.config"
    if not os.path.exists(cfg_path):
        pytest.skip("reference configs absent")

    from second_tpu.configs import schema
    from second_tpu.utils import config_tool
    from second_tpu.train.__main__ import train

    info_path = make_nusc_infos(tmp_path, num_frames=8)
    cfg = config_tool.read_config(cfg_path)
    config_tool.change_detection_range(
        cfg.model.second, [-20.0, -20.0, 20.0, 20.0])
    for reader, training in ((cfg.train_input_reader, True),
                             (cfg.eval_input_reader, False)):
        reader.dataset.dataset_class_name = "NuScenesDataset"
        reader.dataset.kitti_root_path = str(tmp_path)
        reader.dataset.kitti_info_path = str(info_path)
        reader.batch_size = 1
        reader.preprocess.max_number_of_voxels = 3000
        reader.preprocess.num_workers = 0
        reader.preprocess.database_sampler = schema.Sampler.from_raw({})
    cfg.train_config.steps = 2
    cfg.train_config.steps_per_eval = 100
    mod_cfg = tmp_path / "nusc_small.config"
    mod_cfg.write_text(cfg.to_text())

    model_dir = tmp_path / "model"
    train(str(mod_cfg), str(model_dir))
    assert (model_dir / "checkpoints.json").exists()
    assert (model_dir / "results" / "final" / "result.pkl").exists()
    log_txt = (model_dir / "log.txt").read_text()
    assert "step=1" in log_txt
