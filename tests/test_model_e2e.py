import numpy as np
import pytest

import jax
import jax.numpy as jnp

from second_tpu.builders import build_network
from second_tpu.models.voxelnet import compute_loss, predict
from second_tpu.utils.config_tool import change_detection_range, read_config

XYRES16 = "/root/reference/second/configs/pointpillars/car/xyres_16.config"

pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists(XYRES16), reason="reference configs absent"
)


@pytest.fixture(scope="module")
def small_pp():
    cfg = read_config(XYRES16)
    model_cfg = cfg.model.second
    # shrink to a 128x128 grid so CPU compile stays fast
    change_detection_range(model_cfg, [0.0, -10.24, 20.48, 10.24])
    parts = build_network(model_cfg)
    return parts


@pytest.fixture(scope="module")
def example(small_pp):
    parts = small_pp
    gen = parts["voxel_generator"]
    rng = np.random.RandomState(0)
    B, V, T = 2, 600, 100
    voxels = np.zeros((B, V, T, 4), np.float32)
    num_points = np.zeros((B, V), np.int32)
    coords = np.full((B, V, 3), -1, np.int32)
    for b in range(B):
        pts = rng.uniform(
            [0, -10, -2.9, 0], [20, 10, 0.9, 1], size=(3000, 4)
        ).astype(np.float32)
        res = gen.generate_multi_gpu(pts, max_voxels=V)
        voxels[b] = res["voxels"]
        num_points[b] = res["num_points_per_voxel"]
        n = res["voxel_num"]
        coords[b, :n] = res["coordinates"][:n]
        coords[b, n:] = -1
    return voxels, num_points, coords


def test_build_from_real_config(small_pp):
    parts = small_pp
    assert parts["net"].vfe_class_name == "PillarFeatureNet"
    assert parts["net"].middle_class_name == "PointPillarsScatter"
    assert parts["net"].rpn_class_name == "RPNV2"
    assert parts["spec"].num_class == 1
    assert parts["spec"].box_code_size == 7
    assert parts["feature_map_size"] == [1, 64, 64]
    # anchors: 64*64*1*2
    assert parts["anchor_cache"]["anchors"].shape == (64 * 64 * 2, 7)


def test_forward_shapes(small_pp, example):
    parts = small_pp
    net, spec = parts["net"], parts["spec"]
    voxels, num_points, coords = example
    variables = net.init(jax.random.PRNGKey(0), voxels, num_points, coords)
    preds = net.apply(variables, voxels, num_points, coords)
    A = parts["anchor_cache"]["anchors"].shape[0]
    assert preds["box_preds"].shape == (2, A, 7)
    assert preds["cls_preds"].shape == (2, A, 1)
    assert preds["dir_cls_preds"].shape == (2, A, 2)
    assert not np.any(np.isnan(np.asarray(preds["box_preds"])))
    del spec


def test_loss_and_grads(small_pp, example):
    parts = small_pp
    net, spec = parts["net"], parts["spec"]
    voxels, num_points, coords = example
    anchors = parts["anchor_cache"]["anchors"].astype(np.float32)
    A = anchors.shape[0]
    rng = np.random.RandomState(1)
    labels = np.zeros((2, A), np.int32)
    labels[:, rng.choice(A, 20, replace=False)] = 1
    labels[:, rng.choice(A, 10, replace=False)] = -1
    reg_targets = rng.normal(scale=0.1, size=(2, A, 7)).astype(np.float32)
    ex = {
        "labels": jnp.asarray(labels),
        "reg_targets": jnp.asarray(reg_targets),
        "anchors": jnp.broadcast_to(jnp.asarray(anchors), (2, A, 7)),
    }
    variables = net.init(jax.random.PRNGKey(0), voxels, num_points, coords)
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        preds, _ = net.apply(
            {"params": p, **other}, voxels, num_points, coords, train=True,
            mutable=["batch_stats"],
        )
        return compute_loss(spec, preds, ex)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    gnorm = float(sum(jnp.sum(jnp.square(g)) for g in flat)) ** 0.5
    assert gnorm > 0 and np.isfinite(gnorm)


def test_predict_shapes(small_pp, example):
    parts = small_pp
    net, spec = parts["net"], parts["spec"]
    voxels, num_points, coords = example
    anchors = parts["anchor_cache"]["anchors"].astype(np.float32)
    A = anchors.shape[0]
    variables = net.init(jax.random.PRNGKey(0), voxels, num_points, coords)
    preds = net.apply(variables, voxels, num_points, coords)
    ex = {"anchors": jnp.broadcast_to(jnp.asarray(anchors), (2, A, 7))}
    dets = predict(spec, preds, ex)
    n_out = spec.nms_post_max_sizes[0]
    assert dets["box3d_lidar"].shape == (2, n_out, 7)
    assert dets["scores"].shape == (2, n_out)
    assert dets["label_preds"].shape == (2, n_out)
    assert dets["valid"].shape == (2, n_out)
    # scores of valid dets are in (0, 1]; invalid are zeroed
    s = np.asarray(dets["scores"])
    v = np.asarray(dets["valid"])
    assert np.all(s[~v] == 0)
    if v.any():
        assert np.all(s[v] > 0) and np.all(s[v] <= 1)


def test_scatter_matches_reference_semantics():
    from second_tpu.models.middle import PointPillarsScatter

    m = PointPillarsScatter(output_shape=(1, 1, 4, 5, 3), num_input_features=3)
    feats = jnp.asarray(
        [[[1.0, 2, 3], [4, 5, 6], [0, 0, 0]]], dtype=jnp.float32
    )  # [1, 3, 3]
    coords = jnp.asarray([[[0, 1, 2], [0, 3, 4], [-1, -1, -1]]], jnp.int32)
    canvas = m.apply({}, feats, coords)
    assert canvas.shape == (1, 4, 5, 3)
    np.testing.assert_allclose(np.asarray(canvas[0, 1, 2]), [1, 2, 3])
    np.testing.assert_allclose(np.asarray(canvas[0, 3, 4]), [4, 5, 6])
    assert float(jnp.abs(canvas).sum()) == pytest.approx(21.0)
