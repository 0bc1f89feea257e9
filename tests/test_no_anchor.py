"""no_anchor class settings (reference
second/builder/anchor_generator_builder.py:45-48): classes that
contribute no anchors, used by the shipped all.pp.largea.config with
assign_per_class: false.  The network must build and take a train
step."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from second_tpu.builders import build_network
from second_tpu.models.voxelnet import compute_loss
from second_tpu.utils.config_tool import read_config

LARGEA = "/root/reference/second/configs/nuscenes/all.pp.largea.config"

pytestmark = pytest.mark.skipif(
    not os.path.exists(LARGEA), reason="reference configs absent")


@pytest.fixture(scope="module")
def parts():
    cfg = read_config(LARGEA)
    return build_network(cfg.model.second)


def test_no_anchor_build(parts):
    ta = parts["target_assigner"]
    # 10 classes, 5 with anchors (bicycle..barrier are no_anchor)
    assert len(ta.classes) == 10
    assert len(ta._anchor_generators) == 5
    assert ta.num_anchors("barrier") == 0
    a, b = ta.anchors_range("barrier")
    assert a == b  # empty range
    anchors = parts["anchor_cache"]["anchors"]
    total = sum(ta.num_anchors(c) for c in ta.classes)
    assert anchors.shape[0] == total


def test_no_anchor_train_step(parts):
    net, spec = parts["net"], parts["spec"]
    gen = parts["voxel_generator"]
    rng = np.random.RandomState(0)
    B, V = 1, 400
    T = gen.max_num_points_per_voxel
    F = 4 + 1  # nuscenes: x, y, z, intensity, time-lag
    lo = gen.point_cloud_range[:3]
    hi = gen.point_cloud_range[3:]
    voxels = np.zeros((B, V, T, F), np.float32)
    num_points = np.zeros((B, V), np.int32)
    coords = np.full((B, V, 3), -1, np.int32)
    pts = rng.uniform(
        list(lo) + [0, 0], list(hi) + [1, 0],
        size=(2000, F)).astype(np.float32)
    res = gen.generate_multi_gpu(pts, max_voxels=V)
    voxels[0] = res["voxels"]
    num_points[0] = res["num_points_per_voxel"]
    n = res["voxel_num"]
    coords[0, :n] = res["coordinates"][:n]

    variables = net.init(jax.random.PRNGKey(0), voxels, num_points, coords)
    anchors = parts["anchor_cache"]["anchors"].astype(np.float32)
    A = anchors.shape[0]
    labels = rng.randint(-1, spec.num_class + 1, (B, A)).astype(np.int32)
    reg = rng.randn(B, A, spec.box_code_size).astype(np.float32) * 0.1
    ex = {
        "anchors": jnp.asarray(
            np.broadcast_to(anchors[None], (B,) + anchors.shape)),
        "labels": jnp.asarray(labels),
        "reg_targets": jnp.asarray(reg),
    }

    def loss_fn(params):
        p, _ = net.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            voxels, num_points, coords, train=True,
            mutable=["batch_stats"])
        return compute_loss(spec, p, ex)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
