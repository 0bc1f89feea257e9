import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_sparse_resnet_blocks():
    from second_tpu.ops import sparse
    from second_tpu.models.sparse_resnet import SparseBasicBlock

    rng = np.random.RandomState(0)
    shape = (6, 16, 16)
    feats = rng.normal(size=(1, 32, 8)).astype(np.float32)
    lin = rng.choice(np.prod(shape), 32, replace=False)
    coords = np.stack(
        [lin // (16 * 16), (lin // 16) % 16, lin % 16], 1
    ).astype(np.int32)[None]
    grid = sparse.from_voxel_coords(jnp.asarray(feats), jnp.asarray(coords),
                                    shape)
    rb = sparse.build_subm_rulebook(grid, (3, 3, 3))
    block = SparseBasicBlock(planes=8)
    variables = block.init(jax.random.PRNGKey(0), grid, rb)
    out, _ = block.apply(variables, grid, rb, train=True,
                         mutable=["batch_stats"])
    assert out.features.shape == (1, 32, 8)
    np.testing.assert_array_equal(np.asarray(out.coords),
                                  np.asarray(grid.coords))


@pytest.mark.parametrize(
    "name", ["SpMiddleFHDLiteHRZ", "SpMiddleFHDHRZ", "SpMiddle2K"])
def test_extra_middles_run(name):
    from second_tpu.models import get_middle_class

    cls = get_middle_class(name)
    nz, ny, nx = 40, 32, 32
    m = cls(output_shape=(1, nz, ny, nx, 4), num_input_features=4)
    rng = np.random.RandomState(1)
    feats = rng.normal(size=(1, 64, 4)).astype(np.float32)
    coords = np.stack([
        rng.randint(0, nz, (1, 64)),
        rng.randint(0, ny, (1, 64)),
        rng.randint(0, nx, (1, 64)),
    ], axis=-1).astype(np.int32)
    variables = m.init(jax.random.PRNGKey(0), feats, coords)
    out = m.apply(variables, feats, coords)
    assert out.ndim == 4 and not np.any(np.isnan(np.asarray(out)))


def test_pretrained_and_freeze(tmp_path):
    from flax import linen as nn

    from second_tpu.train import checkpoint as ckpt_lib
    from second_tpu.train.optimizer import freeze_by_patterns
    from second_tpu.train.state import TrainState
    import optax

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(4, name="backbone")(x)
            return nn.Dense(2, name="head")(x)

    net = Net()
    v1 = net.init(jax.random.PRNGKey(0), jnp.ones((1, 3)))
    v2 = net.init(jax.random.PRNGKey(1), jnp.ones((1, 3)))
    tx = optax.sgd(0.1)
    s1 = TrainState.create(v1, tx)
    ckpt_lib.save(tmp_path, s1, "voxelnet", 7)
    path = ckpt_lib.latest_checkpoint(tmp_path, "voxelnet")
    # partial load: only the backbone
    merged = ckpt_lib.restore_pretrained(
        path, v2["params"], include=r"backbone.*", verbose=False)
    np.testing.assert_array_equal(
        np.asarray(merged["backbone"]["kernel"]),
        np.asarray(v1["params"]["backbone"]["kernel"]))
    assert not np.allclose(
        np.asarray(merged["head"]["kernel"]),
        np.asarray(v1["params"]["head"]["kernel"]))

    # freeze: backbone gets zero updates
    ftx = freeze_by_patterns(tx, v2["params"], include=r"backbone.*")
    opt_state = ftx.init(v2["params"])
    grads = jax.tree_util.tree_map(jnp.ones_like, v2["params"])
    updates, _ = ftx.update(grads, opt_state, v2["params"])
    assert np.all(np.asarray(updates["backbone"]["kernel"]) == 0)
    assert np.all(np.asarray(updates["head"]["kernel"]) != 0)


def test_viewer_backend_http(tmp_path):
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from kitti_fixture import build_kitti_dir

    from second_tpu.data.kitti_dataset import create_kitti_info_file
    from second_tpu.kittiviewer import backend as vb
    from http.server import ThreadingHTTPServer

    root = tmp_path / "kitti"
    ids = build_kitti_dir(root, num_frames=2, seed=3)
    create_kitti_info_file(
        str(root), train_img_ids=ids, val_img_ids=[], test_img_ids=[])
    srv = ThreadingHTTPServer(("127.0.0.1", 0), vb.Handler)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    def post(route, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{route}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            return json.loads(urllib.request.urlopen(req).read())["results"][0]
        except urllib.error.HTTPError as e:
            return json.loads(e.read())["results"][0]

    try:
        r = post("/api/readinfo", {
            "root_path": str(root),
            "info_path": str(root / "kitti_infos_train.pkl")})
        assert r["status"] == "normal" and len(r["image_indexes"]) == 2
        r = post("/api/get_pointcloud", {"image_idx": 0})
        assert r["status"] == "normal" and len(r["locs"]) > 0
        import base64
        pts = np.frombuffer(
            base64.b64decode(r["pointcloud"]), np.float32).reshape(-1, 3)
        assert len(pts) > 1000
        r = post("/api/get_image", {"image_idx": 0})
        assert r["status"] == "normal"
        assert r["image_b64"].startswith("data:image/")
        # detections from a KITTI label dir round-trip
        r = post("/api/read_detection",
                 {"det_path": str(root / "training" / "label_2")})
        assert r["status"] == "normal"
        assert post("/api/nope", {})["status"] == "error"
        assert post("/api/get_pointcloud", {"image_idx": 99})["status"] == "error"
        # bundled canvas frontend is served at /
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/").read().decode()
        assert "second_tpu viewer" in page and "/api/" in page
        for route in ("readinfo", "get_pointcloud", "inference_by_idx",
                      "build_network", "read_detection", "get_image"):
            assert route in page, route
    finally:
        srv.shutdown()


def test_simplevis():
    from second_tpu.utils.simplevis import kitti_vis

    rng = np.random.RandomState(0)
    pts = rng.uniform([0, -20, -2], [60, 20, 0.5], (5000, 3))
    boxes = np.array([[10.0, 0.0, -1.0, 2.0, 4.0, 1.5, 0.4]])
    img = kitti_vis(pts, boxes)
    assert img.ndim == 3 and img.shape[2] == 3
    assert (img > 0).sum() > 100


def test_array_ops():
    from second_tpu.ops.array_ops import gather_nd, scatter_nd

    idx = jnp.asarray([[0, 1], [2, 3]])
    upd = jnp.asarray([5.0, 7.0])
    out = scatter_nd(idx, upd, (4, 4))
    assert float(out[0, 1]) == 5.0 and float(out[2, 3]) == 7.0
    got = gather_nd(out, idx)
    np.testing.assert_allclose(np.asarray(got), [5.0, 7.0])


def test_model_tools(tmp_path):
    from second_tpu.utils.model_tool import (
        merge_results, remove_invalid_model_dir, shape_mergeable)

    (tmp_path / "good").mkdir()
    (tmp_path / "good" / "checkpoints.json").write_text("{}")
    (tmp_path / "bad").mkdir()
    removed = remove_invalid_model_dir(tmp_path)
    assert len(removed) == 1 and (tmp_path / "good").exists()

    import pickle
    for i in range(2):
        with open(tmp_path / f"r{i}.pkl", "wb") as f:
            pickle.dump([{"id": i}], f)
    n = merge_results(
        [tmp_path / "r0.pkl", tmp_path / "r1.pkl"], tmp_path / "m.pkl")
    assert n == 2
    assert shape_mergeable(np.zeros((3, 4)), [3, None])
    assert not shape_mergeable(np.zeros((3, 4)), [4, None])


def test_bbox_plot(tmp_path):
    from second_tpu.utils import bbox_plot

    rng = np.random.RandomState(0)
    pts = rng.uniform([0, -20, -2], [60, 20, 0.5], (500, 3))
    gt = np.array([[10.0, 0.0, -1.0, 2.0, 4.0, 1.5, 0.4]])
    det = np.array([[10.5, 0.3, -1.0, 2.0, 4.0, 1.5, 0.3]])
    out = tmp_path / "bev.png"
    bbox_plot.plot_bev_scene(
        pts, gt_boxes=gt, det_boxes=det, pc_range=[0, -40, -3, 70.4, 40, 1],
        save_path=out)
    assert out.exists() and out.stat().st_size > 1000

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    bbox_plot.draw_bbox_in_ax(
        ax, np.array([[0.0, 0.0, 2.0, 3.0]]), labels=["car"])
    bbox_plot.draw_rotated_bbox_in_ax(
        ax, np.array([[1.0, 1.0, 2.0, 4.0, 0.5]]), labels=["x"])
    plt.close(fig)
