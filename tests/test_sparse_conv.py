import numpy as np
import pytest

import jax
import jax.numpy as jnp

from second_tpu.ops import sparse


def make_grid(rng, shape, num_active, cin, batch=1, capacity=None):
    d, h, w = shape
    capacity = capacity or num_active
    feats = np.zeros((batch, capacity, cin), np.float32)
    coords = np.full((batch, capacity, 3), -1, np.int32)
    for b in range(batch):
        lin = rng.choice(d * h * w, num_active, replace=False)
        cz, cy, cx = lin // (h * w), (lin // w) % h, lin % w
        coords[b, :num_active] = np.stack([cz, cy, cx], axis=1)
        feats[b, :num_active] = rng.normal(size=(num_active, cin))
    return sparse.from_voxel_coords(
        jnp.asarray(feats), jnp.asarray(coords), shape)


def dense_conv3d(x_dense, weights, kernel, stride, pad):
    """Oracle: lax 3D conv, NDHWC."""
    kz, ky, kx = kernel
    w = jnp.asarray(weights).reshape(kz, ky, kx, *weights.shape[1:])
    return jax.lax.conv_general_dilated(
        x_dense, w,
        window_strides=stride,
        padding=[(pad[0], pad[0]), (pad[1], pad[1]), (pad[2], pad[2])],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


class TestSubmConv:
    @pytest.mark.parametrize("kernel", [(3, 3, 3), (3, 1, 1)])
    def test_matches_dense_at_active_positions(self, kernel):
        rng = np.random.RandomState(0)
        shape = (6, 10, 12)
        grid = make_grid(rng, shape, num_active=40, cin=5, capacity=64)
        k = int(np.prod(kernel))
        weights = rng.normal(size=(k, 5, 7)).astype(np.float32)
        rb = sparse.build_subm_rulebook(grid, kernel)
        out = sparse.subm_conv(grid, rb, jnp.asarray(weights))
        dense_in = sparse.to_dense(grid)
        pad = tuple((kk - 1) // 2 for kk in kernel)
        dense_out = dense_conv3d(dense_in, weights, kernel, (1, 1, 1), pad)
        # compare at active positions only (subm semantics)
        coords = np.asarray(out.coords[0])
        feats = np.asarray(out.features[0])
        valid = np.asarray(out.valid[0])
        for i in range(len(coords)):
            if not valid[i]:
                continue
            z, y, x = coords[i]
            np.testing.assert_allclose(
                feats[i], np.asarray(dense_out[0, z, y, x]), atol=1e-4)

    def test_output_active_set_unchanged(self):
        rng = np.random.RandomState(1)
        grid = make_grid(rng, (4, 6, 6), num_active=10, cin=3, capacity=16)
        rb = sparse.build_subm_rulebook(grid, (3, 3, 3))
        out = sparse.subm_conv(
            grid, rb, jnp.zeros((27, 3, 4)))
        np.testing.assert_array_equal(
            np.asarray(out.coords), np.asarray(grid.coords))


class TestSparseConv:
    @pytest.mark.parametrize(
        "kernel,stride,pad",
        [((3, 3, 3), (2, 2, 2), (1, 1, 1)),
         ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
         ((3, 1, 1), (2, 1, 1), (0, 0, 0))],
    )
    def test_matches_dense(self, kernel, stride, pad):
        rng = np.random.RandomState(2)
        shape = (7, 12, 14)
        grid = make_grid(rng, shape, num_active=50, cin=4, capacity=128)
        k = int(np.prod(kernel))
        weights = rng.normal(size=(k, 4, 6)).astype(np.float32)
        out_grid = sparse.downsample_active_set(grid, kernel, stride, pad)
        out = sparse.sparse_conv(
            grid, out_grid, jnp.asarray(weights), kernel, stride, pad)

        dense_in = sparse.to_dense(grid)
        dense_out = dense_conv3d(dense_in, weights, kernel, stride, pad)
        assert out.shape == dense_out.shape[1:4]

        # 1) the active set matches spconv semantics: output position
        # active iff its window contains >= 1 active input
        occupancy = (jnp.abs(dense_in).sum(-1, keepdims=True) > 0).astype(
            jnp.float32)
        # use all-ones weights on the indicator
        ind_w = np.ones((k, 1, 1), np.float32)
        win = dense_conv3d(occupancy, ind_w, kernel, stride, pad)
        expected_active = {
            tuple(c) for c in np.argwhere(np.asarray(win[0, ..., 0]) > 0)
        }
        got_active = {
            tuple(c)
            for c, v in zip(np.asarray(out.coords[0]), np.asarray(out.valid[0]))
            if v
        }
        assert got_active == expected_active

        # 2) features match the dense conv at active positions
        for c, f, v in zip(np.asarray(out.coords[0]),
                           np.asarray(out.features[0]),
                           np.asarray(out.valid[0])):
            if not v:
                continue
            z, y, x = c
            np.testing.assert_allclose(
                f, np.asarray(dense_out[0, z, y, x]), atol=1e-4)

    def test_batched(self):
        rng = np.random.RandomState(3)
        grid = make_grid(rng, (5, 8, 8), num_active=20, cin=3, batch=3,
                         capacity=64)
        weights = rng.normal(size=(27, 3, 4)).astype(np.float32)
        out_grid = sparse.downsample_active_set(
            grid, (3, 3, 3), (2, 2, 2), (1, 1, 1))
        out = sparse.sparse_conv(
            grid, out_grid, jnp.asarray(weights), (3, 3, 3), (2, 2, 2),
            (1, 1, 1))
        dense_out = dense_conv3d(
            sparse.to_dense(grid), weights, (3, 3, 3), (2, 2, 2), (1, 1, 1))
        dense_got = sparse.to_dense(out)
        np.testing.assert_allclose(
            np.asarray(dense_got),
            np.asarray(dense_out) * (np.abs(np.asarray(dense_got)) > 0),
            atol=1e-4)


class TestSparseMiddle:
    def test_spmiddle_fhd_lite_shapes(self):
        from second_tpu.models.sparse_middle import SpMiddleFHDLite

        nz, ny, nx = 40, 32, 32
        m = SpMiddleFHDLite(
            output_shape=(1, nz, ny, nx, 4), num_input_features=4)
        rng = np.random.RandomState(4)
        B, V = 2, 100
        feats = rng.normal(size=(B, V, 4)).astype(np.float32)
        coords = np.stack([
            rng.randint(0, nz, (B, V)),
            rng.randint(0, ny, (B, V)),
            rng.randint(0, nx, (B, V)),
        ], axis=-1).astype(np.int32)
        variables = m.init(jax.random.PRNGKey(0), feats, coords)
        out = m.apply(variables, feats, coords)
        # z chain at nz=40 (sparse 41): 41 -> 21 -> 11 -> 5 -> 2
        assert out.shape[0] == B
        assert out.shape[1] == ny // 8 and out.shape[2] == nx // 8
        assert not np.any(np.isnan(np.asarray(out)))

    def test_spmiddle_fhd_runs_and_differs_from_zero(self):
        from second_tpu.models.sparse_middle import SpMiddleFHD

        # real car.fhd z depth: sparse 41 -> 21 -> 11 -> 5 -> 2
        nz, ny, nx = 40, 32, 32
        m = SpMiddleFHD(output_shape=(1, nz, ny, nx, 4),
                        num_input_features=4)
        rng = np.random.RandomState(5)
        B, V = 1, 200
        feats = rng.normal(size=(B, V, 4)).astype(np.float32)
        coords = np.stack([
            rng.randint(0, nz, (B, V)),
            rng.randint(0, ny, (B, V)),
            rng.randint(0, nx, (B, V)),
        ], axis=-1).astype(np.int32)
        variables = m.init(jax.random.PRNGKey(0), feats, coords)
        out, _ = m.apply(
            variables, feats, coords, train=True, mutable=["batch_stats"])
        assert float(jnp.abs(out).sum()) > 0
        assert not np.any(np.isnan(np.asarray(out)))


def test_host_plan_matches_device_path():
    """C++ host-built rulebooks must reproduce the device lookup path
    exactly (same static active sets, same slot semantics)."""
    from second_tpu.native import sparse_plan as native_plan

    if not native_plan.available():
        pytest.skip("native library unavailable")

    from second_tpu.models import sparse_middle as sm
    from second_tpu.models.registry import get_middle_class

    rng = np.random.RandomState(7)
    V, C = 600, 16
    # real car.fhd z depth (41 -> 21 -> 11 -> 5 -> 2): shallower z
    # collapses the final dense z-dim to 0 and the parity assert would
    # compare empty arrays
    output_shape = (1, 40, 64, 64, C)
    shape = (41, 64, 64)
    sentinel = shape[0] * shape[1] * shape[2]
    n_active = 400
    lin = np.sort(rng.choice(sentinel, size=n_active, replace=False))
    zz = lin // (shape[1] * shape[2])
    yy = (lin % (shape[1] * shape[2])) // shape[2]
    xx = lin % shape[2]
    coords = np.full((V, 3), -1, np.int32)
    coords[:n_active] = np.stack([zz, yy, xx], -1)
    feats = np.zeros((V, C), np.float32)
    feats[:n_active] = rng.randn(n_active, C).astype(np.float32)

    cls = get_middle_class("SpMiddleFHD")
    mid = cls(output_shape=output_shape, num_input_features=C,
              use_norm=True)
    variables = mid.init(
        jax.random.PRNGKey(0), jnp.asarray(feats)[None],
        jnp.asarray(coords)[None])
    out_dev = mid.apply(
        variables, jnp.asarray(feats)[None], jnp.asarray(coords)[None])

    scales = sm.plan_scales("SpMiddleFHD", output_shape, V)
    plan_np = sm.build_host_plan(coords, scales)
    plan = {k: jnp.asarray(v)[None] for k, v in plan_np.items()}
    out_plan = mid.apply(
        variables, jnp.asarray(feats)[None], jnp.asarray(coords)[None],
        plan=plan)
    np.testing.assert_allclose(
        np.asarray(out_plan), np.asarray(out_dev), atol=1e-5, rtol=1e-5)


def test_no_overflow_at_kitti_scale():
    """Default capacity_factors must hold the TRUE dilated active sets
    of KITTI-scale scenes at every stage (spconv never drops voxels,
    middle.py:199-209); measured first-stage dilation is ~2.9x."""
    from second_tpu.native import sparse_plan as native_plan

    if not native_plan.available():
        pytest.skip("native library unavailable")

    from second_tpu.builders import build_network
    from second_tpu.data.synthetic import make_kitti_scene
    from second_tpu.models import sparse_middle as sm
    from second_tpu.utils.config_tool import read_config

    cfg_path = "/root/reference/second/configs/car.fhd.config"
    cfg = read_config(cfg_path)
    gen = build_network(cfg.model.second)["voxel_generator"]
    V = 17000  # train-time max_number_of_voxels (car.fhd.config:127)
    grid_size = gen.grid_size
    output_shape = [1] + grid_size[::-1].tolist() + [16]
    scales = sm.plan_scales("SpMiddleFHD", output_shape, V)
    for seed in (0, 1):
        rng = np.random.RandomState(seed)
        pts, _, _ = make_kitti_scene(rng, num_cars=25, num_points=22000)
        res = gen.generate_multi_gpu(pts, max_voxels=V)
        n = int(res["voxel_num"])
        coords = np.full((V, 3), -1, np.int32)
        coords[:n] = res["coordinates"][:n]
        _, counts = sm.build_host_plan(coords, scales, return_counts=True)
        for i, (true, cap) in counts.items():
            assert true <= cap, (
                f"seed {seed} stage {i}: {true} active > capacity {cap}")


def test_overflow_is_surfaced(caplog):
    """Forcing a tiny capacity must log a loud warning, not drop
    voxels silently."""
    import logging

    from second_tpu.native import sparse_plan as native_plan

    if not native_plan.available():
        pytest.skip("native library unavailable")

    from second_tpu.models import sparse_middle as sm

    sm._overflow_warned.clear()
    rng = np.random.RandomState(3)
    V = 512
    shape = (41, 64, 64)
    sentinel = shape[0] * shape[1] * shape[2]
    lin = np.sort(rng.choice(sentinel, size=V, replace=False))
    coords = np.stack([lin // (shape[1] * shape[2]),
                       (lin % (shape[1] * shape[2])) // shape[2],
                       lin % shape[2]], -1).astype(np.int32)
    scales = sm.plan_scales("SpMiddleFHD", (1, 40, 64, 64, 16), V)
    scales[0]["out_cap"] = 64  # force overflow at stage 0
    with caplog.at_level(logging.WARNING):
        _, counts = sm.build_host_plan(coords, scales, return_counts=True)
    assert counts[0][0] > 64
    assert any("OVERFLOW" in r.message for r in caplog.records)
    sm._overflow_warned.clear()
