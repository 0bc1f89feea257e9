"""Parity: flat-point PointPillars inference path (models/pp_fast.py)
vs the module path (voxelize -> PillarFeatureNet -> scatter)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from second_tpu.builders import build_network
from second_tpu.data.synthetic import make_scene
from second_tpu.models import pp_fast
from second_tpu.models.voxelnet import predict
from second_tpu.ops.voxelize import voxelize
from second_tpu.utils.config_tool import change_detection_range, read_config

XYRES16 = "/root/reference/second/configs/pointpillars/car/xyres_16.config"
pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists(XYRES16), reason="reference configs absent"
)


def test_flat_pillar_bev_matches_module():
    cfg = read_config(XYRES16)
    change_detection_range(cfg.model.second, [0.0, -10.24, 20.48, 10.24])
    parts = build_network(cfg.model.second)
    net, spec, gen = parts["net"], parts["spec"], parts["voxel_generator"]
    model_cfg = parts["model_cfg"]
    grid = tuple(int(x) for x in gen.grid_size)
    vs = tuple(float(x) for x in gen.voxel_size)
    rmin = tuple(float(x) for x in gen.point_cloud_range[:3])
    MAXV, N = 2000, 8192
    T = int(gen.max_num_points_per_voxel)

    rng = np.random.RandomState(0)
    points, _, _ = make_scene(rng, num_objects=3, num_bg_points=3000,
                              x_range=(0, 20.4), y_range=(-10, 10))
    buf = np.zeros((N, 4), np.float32)
    n = min(len(points), N)
    buf[:n] = points[:n]
    pts = jnp.asarray(buf)

    variables = net.init(
        jax.random.PRNGKey(0),
        np.zeros((1, MAXV, T, 4), np.float32),
        np.zeros((1, MAXV), np.int32),
        np.full((1, MAXV, 3), -1, np.int32))

    # module path
    voxels, coords, counts, _ = voxelize(
        pts, n, vs, rmin, grid_size=grid, max_voxels=MAXV,
        max_points_per_voxel=T)
    vfeats = net.apply(
        variables, voxels[None], counts[None], coords[None],
        method=lambda m, a, b, c: m.voxel_feature_extractor(a, b, c))
    bev_mod = net.apply(
        variables, vfeats, coords[None],
        method=lambda m, f, c: m.middle_feature_extractor(f, c))

    # flat path
    pts_s, cpt, vr, pcoords, cnts, _ = pp_fast.flat_pillarize(
        pts, n, vs, rmin, grid_size=grid, max_voxels=MAXV)
    bev_flat = pp_fast.flat_pfn_bev(
        variables, pts_s, cpt, vr, pcoords, cnts,
        num_filters=tuple(
            int(x) for x in model_cfg.voxel_feature_extractor.num_filters),
        max_points_per_voxel=T, voxel_size=vs,
        pc_range=tuple(gen.point_cloud_range), grid_size=grid,
        num_input_features=4)

    np.testing.assert_allclose(
        np.asarray(bev_flat), np.asarray(bev_mod)[0], atol=2e-4, rtol=2e-4)


def test_flat_pillar_overfull_matches_module():
    """A pillar with > max_points_per_voxel points: the flat path must
    apply the same FCFS T-point cap as the voxelizer (ADVICE r2: all
    points of an overfull pillar used to feed the segment-max)."""
    cfg = read_config(XYRES16)
    change_detection_range(cfg.model.second, [0.0, -10.24, 20.48, 10.24])
    parts = build_network(cfg.model.second)
    net, gen = parts["net"], parts["voxel_generator"]
    model_cfg = parts["model_cfg"]
    grid = tuple(int(x) for x in gen.grid_size)
    vs = tuple(float(x) for x in gen.voxel_size)
    rmin = tuple(float(x) for x in gen.point_cloud_range[:3])
    MAXV, N = 64, 512
    T = int(gen.max_num_points_per_voxel)

    rng = np.random.RandomState(7)
    # 150 points inside ONE 0.16 m pillar (cell [4.96, 5.12) x
    # [0.96, 1.12)) + some sparse filler
    dense = np.concatenate([
        rng.uniform([4.97, 0.97, -1.5, 0], [5.11, 1.11, 0.5, 1], (150, 4)),
        rng.uniform([8.0, -3.0, -1.5, 0], [12.0, 3.0, 0.5, 1], (40, 4)),
    ]).astype(np.float32)
    n = len(dense)
    buf = np.zeros((N, 4), np.float32)
    buf[:n] = dense
    pts = jnp.asarray(buf)

    variables = net.init(
        jax.random.PRNGKey(0),
        np.zeros((1, MAXV, T, 4), np.float32),
        np.zeros((1, MAXV), np.int32),
        np.full((1, MAXV, 3), -1, np.int32))

    voxels, coords, counts, _ = voxelize(
        pts, n, vs, rmin, grid_size=grid, max_voxels=MAXV,
        max_points_per_voxel=T)
    assert int(jnp.max(counts)) == T  # the cap actually engages
    vfeats = net.apply(
        variables, voxels[None], counts[None], coords[None],
        method=lambda m, a, b, c: m.voxel_feature_extractor(a, b, c))
    bev_mod = net.apply(
        variables, vfeats, coords[None],
        method=lambda m, f, c: m.middle_feature_extractor(f, c))

    pts_s, cpt, vr, pcoords, cnts, _ = pp_fast.flat_pillarize(
        pts, n, vs, rmin, grid_size=grid, max_voxels=MAXV,
        max_points_per_voxel=T)
    assert int(jnp.max(cnts)) == T
    bev_flat = pp_fast.flat_pfn_bev(
        variables, pts_s, cpt, vr, pcoords, cnts,
        num_filters=tuple(
            int(x) for x in model_cfg.voxel_feature_extractor.num_filters),
        max_points_per_voxel=T, voxel_size=vs,
        pc_range=tuple(gen.point_cloud_range), grid_size=grid,
        num_input_features=4)
    np.testing.assert_allclose(
        np.asarray(bev_flat), np.asarray(bev_mod)[0], atol=2e-4, rtol=2e-4)


def test_flat_e2e_detections_match():
    cfg = read_config(XYRES16)
    change_detection_range(cfg.model.second, [0.0, -10.24, 20.48, 10.24])
    parts = build_network(cfg.model.second)
    net, spec, gen = parts["net"], parts["spec"], parts["voxel_generator"]
    model_cfg = parts["model_cfg"]
    anchors = parts["anchor_cache"]["anchors"].astype(np.float32)
    grid = tuple(int(x) for x in gen.grid_size)
    vs = tuple(float(x) for x in gen.voxel_size)
    rmin = tuple(float(x) for x in gen.point_cloud_range[:3])
    MAXV, N, B = 2000, 8192, 2
    T = int(gen.max_num_points_per_voxel)

    rng = np.random.RandomState(1)
    bufs = np.zeros((B, N, 4), np.float32)
    ns = np.zeros((B,), np.int32)
    for b in range(B):
        points, _, _ = make_scene(rng, num_objects=3, num_bg_points=3000,
                                  x_range=(0, 20.4), y_range=(-10, 10))
        n = min(len(points), N)
        bufs[b, :n] = points[:n]
        ns[b] = n

    variables = net.init(
        jax.random.PRNGKey(0),
        np.zeros((1, MAXV, T, 4), np.float32),
        np.zeros((1, MAXV), np.int32),
        np.full((1, MAXV, 3), -1, np.int32))
    anchors_b = jnp.asarray(
        np.broadcast_to(anchors[None], (B,) + anchors.shape))

    # module path e2e
    def vox(p, n):
        return voxelize(p, n, vs, rmin, grid_size=grid, max_voxels=MAXV,
                        max_points_per_voxel=T)
    voxels, coords, counts, _ = jax.vmap(vox)(jnp.asarray(bufs),
                                              jnp.asarray(ns))
    preds = net.apply(variables, voxels, counts, coords)
    dets_mod = predict(spec, preds, {"anchors": anchors_b})

    dets_flat = pp_fast.pointpillars_infer(
        variables, net, spec, predict, anchors_b,
        jnp.asarray(bufs), jnp.asarray(ns),
        gen=gen, model_cfg=model_cfg, max_voxels=MAXV)

    for k in ("box3d_lidar", "scores", "label_preds", "valid"):
        np.testing.assert_allclose(
            np.asarray(dets_flat[k]), np.asarray(dets_mod[k]),
            atol=1e-3, rtol=1e-3)


def test_evaluate_cli_flat_path(tmp_path):
    """evaluate() end-to-end on a mini KITTI tree: restores the
    checkpoint train() wrote and runs the flat-pillar eval path
    (device_voxelize eval examples + pp_fast)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from kitti_fixture import build_kitti_dir

    from second_tpu.configs import schema
    from second_tpu.data.kitti_dataset import create_kitti_info_file
    from second_tpu.train.__main__ import evaluate, train
    from second_tpu.utils.config_tool import change_detection_range

    root = tmp_path / "kitti"
    ids = build_kitti_dir(root, num_frames=8, seed=11)
    create_kitti_info_file(
        str(root), train_img_ids=ids, val_img_ids=ids, test_img_ids=[])
    cfg = read_config(XYRES16)
    change_detection_range(cfg.model.second, [0.0, -10.24, 20.48, 10.24])
    for reader, tr in ((cfg.train_input_reader, True),
                       (cfg.eval_input_reader, False)):
        reader.dataset.kitti_root_path = str(root)
        reader.dataset.kitti_info_path = str(
            root / ("kitti_infos_train.pkl" if tr else
                    "kitti_infos_val.pkl"))
        reader.batch_size = 1
        reader.preprocess.max_number_of_voxels = 2000
        reader.preprocess.num_workers = 0
        reader.preprocess.database_sampler = schema.Sampler.from_raw({})
    cfg.train_config.steps = 2
    cfg.train_config.steps_per_eval = 100
    mod = tmp_path / "pp.config"
    mod.write_text(cfg.to_text())
    model_dir = tmp_path / "model"
    train(str(mod), str(model_dir))
    res_dir = tmp_path / "eval_out"
    evaluate(str(mod), str(model_dir), result_path=str(res_dir))
    assert (res_dir / "result.pkl").exists()
