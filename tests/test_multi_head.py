"""End-to-end test of the NuScenes multi-head network
(VoxelNetNuscenesMultiHead, reference net_multi_head.py:121-176) built
from the real all.pp.mhead.config: forward shapes, loss+grads, predict."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from second_tpu.builders import build_network
from second_tpu.models.voxelnet import compute_loss, predict
from second_tpu.utils.config_tool import change_detection_range, read_config

MHEAD = "/root/reference/second/configs/nuscenes/all.pp.mhead.config"

pytestmark = pytest.mark.skipif(
    not os.path.exists(MHEAD), reason="reference configs absent")


@pytest.fixture(scope="module")
def parts():
    cfg = read_config(MHEAD)
    model_cfg = cfg.model.second
    # shrink the grid 2x so CPU compile stays fast; the per-class
    # feature_map_size fields (target.proto:23) must scale with it
    change_detection_range(model_cfg, [-25.0, -25.0, 25.0, 25.0])
    for cs in model_cfg.target_assigner.class_settings:
        fms = list(cs.feature_map_size)
        if fms:
            cs.feature_map_size = [fms[0], fms[1] // 2, fms[2] // 2]
    return build_network(model_cfg)


@pytest.fixture(scope="module")
def example(parts):
    gen = parts["voxel_generator"]
    nf = gen.point_cloud_range.shape[0] // 2  # 3 spatial dims
    del nf
    rng = np.random.RandomState(0)
    B, V = 2, 500
    T = gen.max_num_points_per_voxel
    F = 4 + 1  # nuscenes: x, y, z, intensity, time-lag
    voxels = np.zeros((B, V, T, F), np.float32)
    num_points = np.zeros((B, V), np.int32)
    coords = np.full((B, V, 3), -1, np.int32)
    for b in range(B):
        pts = rng.uniform(
            [-25, -25, -4.9, 0, 0], [25, 25, 2.9, 1, 0],
            size=(3000, F)).astype(np.float32)
        res = gen.generate_multi_gpu(pts, max_voxels=V)
        voxels[b] = res["voxels"]
        num_points[b] = res["num_points_per_voxel"]
        n = res["voxel_num"]
        coords[b, :n] = res["coordinates"][:n]
        coords[b, n:] = -1
    return voxels, num_points, coords


def test_multihead_build(parts):
    spec = parts["spec"]
    assert spec.num_class == 10
    # velocity-extended boxes: code size 9 for the nuscenes coder? the
    # mhead config uses ground_box3d_coder without velocity -> 7
    assert spec.box_code_size in (7, 9)
    assert parts["net"].__class__.__name__ == "VoxelNetNuscenesMultiHead"


def test_multihead_forward_loss_predict(parts, example):
    net, spec = parts["net"], parts["spec"]
    voxels, num_points, coords = example
    variables = net.init(jax.random.PRNGKey(0), voxels, num_points, coords)
    preds = net.apply(variables, voxels, num_points, coords)
    A = parts["anchor_cache"]["anchors"].shape[0]
    B = voxels.shape[0]
    assert preds["box_preds"].shape == (B, A, spec.box_code_size)
    assert preds["cls_preds"].shape == (B, A, spec.num_class)
    assert np.isfinite(np.asarray(preds["box_preds"])).all()

    anchors = parts["anchor_cache"]["anchors"].astype(np.float32)
    rng = np.random.RandomState(1)
    labels = rng.randint(-1, spec.num_class + 1, (B, A)).astype(np.int32)
    reg_targets = rng.randn(B, A, spec.box_code_size).astype(np.float32) * 0.1
    ex = {
        "anchors": jnp.asarray(np.broadcast_to(anchors[None], (B,) + anchors.shape)),
        "labels": jnp.asarray(labels),
        "reg_targets": jnp.asarray(reg_targets),
    }

    def loss_fn(params):
        p, _ = net.apply(
            {"params": params,
             "batch_stats": variables["batch_stats"]},
            voxels, num_points, coords, train=True,
            mutable=["batch_stats"])
        return compute_loss(spec, p, ex)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)

    dets = predict(spec, preds, ex)
    assert dets["box3d_lidar"].shape[0] == B
    assert np.isfinite(np.asarray(dets["scores"])).all()
    # labels must span both heads' class ranges when present
    assert np.asarray(dets["label_preds"]).max() < spec.num_class
