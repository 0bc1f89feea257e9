import numpy as np
import pytest

from second_tpu.data.voxelizer import VoxelGenerator

VSIZE = [0.2, 0.2, 0.5]
PCR = [0.0, -2.0, -1.0, 4.0, 2.0, 1.0]


def make_gen(**kw):
    return VoxelGenerator(VSIZE, PCR, max_num_points=5, max_voxels=100, **kw)


def test_grid_size():
    gen = make_gen()
    np.testing.assert_array_equal(gen.grid_size, [20, 20, 4])


def test_basic_grouping():
    gen = make_gen()
    pts = np.array(
        [
            [0.1, -1.9, -0.9, 1.0],  # voxel (0, 0, 0)
            [0.15, -1.85, -0.95, 2.0],  # same voxel
            [1.1, 0.1, 0.2, 3.0],  # another voxel
            [9.0, 0.0, 0.0, 4.0],  # out of range
        ],
        dtype=np.float32,
    )
    res = gen.generate(pts)
    assert res["voxels"].shape[0] == 2
    # FCFS: first voxel is the one of the first point
    np.testing.assert_array_equal(res["coordinates"][0], [0, 0, 0])  # zyx
    np.testing.assert_array_equal(res["num_points_per_voxel"], [2, 1])
    np.testing.assert_allclose(res["voxels"][0, 0], pts[0])
    np.testing.assert_allclose(res["voxels"][0, 1], pts[1])
    np.testing.assert_allclose(res["voxels"][0, 2], 0)  # padding
    # zyx coord of second voxel: x=1.1 -> 5, y=0.1 -> 10, z=0.2 -> 2
    np.testing.assert_array_equal(res["coordinates"][1], [2, 10, 5])


def test_point_overflow_dropped():
    gen = VoxelGenerator(VSIZE, PCR, max_num_points=2, max_voxels=10)
    pts = np.tile(np.array([[0.1, -1.9, -0.9, 0.0]], dtype=np.float32), (5, 1))
    pts[:, 3] = np.arange(5)
    res = gen.generate(pts)
    assert res["voxels"].shape[0] == 1
    assert res["num_points_per_voxel"][0] == 2
    np.testing.assert_allclose(res["voxels"][0, :, 3], [0, 1])  # first two win


def test_voxel_overflow_dropped():
    gen = VoxelGenerator(VSIZE, PCR, max_num_points=1, max_voxels=3)
    xs = 0.1 + 0.2 * np.arange(10)
    pts = np.stack([xs, np.zeros(10), np.zeros(10), np.zeros(10)], axis=1)
    res = gen.generate(pts.astype(np.float32))
    assert res["voxels"].shape[0] == 3


def test_multi_gpu_padded_shapes():
    gen = make_gen()
    pts = np.random.RandomState(0).uniform(
        [0, -2, -1, 0], [4, 2, 1, 1], size=(200, 4)
    ).astype(np.float32)
    res = gen.generate_multi_gpu(pts)
    assert res["voxels"].shape == (100, 5, 4)
    assert res["coordinates"].shape == (100, 3)
    assert res["num_points_per_voxel"].shape == (100,)
    assert 0 < res["voxel_num"] <= 100


def test_full_mean():
    gen = make_gen(full_mean=True)
    pts = np.array(
        [[0.1, -1.9, -0.9, 4.0], [0.3, -1.9, -0.9, 2.0]], dtype=np.float32
    )
    # same z/y voxel row? x=0.1->0, x=0.3->1: two voxels with 1 point each
    res = gen.generate(pts)
    v = res["voxels"]
    for i in range(v.shape[0]):
        # all slots equal the single point (mean fill)
        np.testing.assert_allclose(v[i], np.tile(v[i, 0], (5, 1)))


def test_block_filtering_sheds_ground():
    gen = VoxelGenerator(
        [0.2, 0.2, 0.2],
        [0.0, 0.0, -2.0, 3.2, 3.2, 2.0],
        max_num_points=3,
        max_voxels=1000,
        block_filtering=True,
        block_factor=1,
        block_size=8,
        height_threshold=0.3,
    )
    # a flat ground plane at z=-1.9 plus one elevated cluster
    rng = np.random.RandomState(1)
    ground = np.stack(
        [rng.uniform(0, 3.2, 200), rng.uniform(0, 3.2, 200),
         np.full(200, -1.9), np.zeros(200)], axis=1)
    obj = np.stack(
        [rng.uniform(1, 1.4, 50), rng.uniform(1, 1.4, 50),
         rng.uniform(0.0, 0.5, 50), np.ones(50)], axis=1)
    res = gen.generate(np.concatenate([ground, obj]).astype(np.float32))
    vmin = res["voxels"][..., 2].min()
    # every surviving voxel must be elevated above local ground
    kept_z = []
    for i in range(res["voxels"].shape[0]):
        n = res["num_points_per_voxel"][i]
        kept_z.append(res["voxels"][i, :n, 2].min())
    assert min(kept_z) > -1.9 + 0.29
    del vmin


@pytest.mark.parametrize("full_mean", [False, True])
def test_device_voxelizer_matches_host(full_mean):
    import jax.numpy as jnp

    from second_tpu.ops.voxelize import voxelize

    gen = VoxelGenerator(VSIZE, PCR, 5, max_voxels=512, full_mean=full_mean)
    rng = np.random.RandomState(2)
    pts = rng.uniform([0, -2, -1, 0], [4.5, 2.2, 1.2, 1], size=(300, 4)).astype(
        np.float32
    )
    host = gen.generate_multi_gpu(pts)

    buf = np.zeros((512, 4), np.float32)
    buf[:300] = pts
    voxels, coords, counts, nvox = voxelize(
        jnp.asarray(buf),
        300,
        tuple(VSIZE),
        tuple(PCR[:3]),
        grid_size=(20, 20, 4),
        max_voxels=512,
        max_points_per_voxel=5,
        full_mean=full_mean,
    )
    voxels, coords, counts, nvox = map(np.asarray, (voxels, coords, counts, nvox))
    assert nvox == host["voxel_num"]

    # device voxel order is sorted-by-linear-id; host is FCFS. Compare as
    # coordinate-keyed sets.
    def keyed(voxels, coords, counts, n):
        out = {}
        for i in range(n):
            out[tuple(coords[i])] = (counts[i], voxels[i])
        return out

    h = keyed(host["voxels"], host["coordinates"], host["num_points_per_voxel"], int(nvox))
    d = keyed(voxels, coords, counts, int(nvox))
    assert set(h) == set(d)
    for k in h:
        assert h[k][0] == d[k][0], k
        np.testing.assert_allclose(h[k][1], d[k][1], atol=1e-6)


def test_overflow_truncation_matches_host_fcfs():
    """At max_voxels overflow the device voxelizer must keep the SAME
    voxels as the host FCFS kernel (reference point_cloud_ops
    semantics).  Truncating the sorted-by-linear-id order instead
    silently drops a spatially contiguous region — the regression that
    produced spatially biased training scenes."""
    import jax.numpy as jnp

    from second_tpu.ops.voxelize import voxelize

    gen = make_gen()
    rng = np.random.RandomState(0)
    # ~400 occupied cells >> max_voxels=100
    pts = np.stack([
        rng.uniform(0, 4, 2000),
        rng.uniform(-2, 2, 2000),
        rng.uniform(-1, 1, 2000),
        rng.uniform(0, 1, 2000),
    ], axis=1).astype(np.float32)

    host = gen.generate(pts)
    assert host["voxels"].shape[0] == 100  # overflowed

    N = 2048
    buf = np.zeros((N, 4), np.float32)
    buf[:len(pts)] = pts
    voxels, coords, counts, nvox = voxelize(
        jnp.asarray(buf), len(pts),
        tuple(VSIZE), tuple(PCR[:3]),
        grid_size=tuple(int(v) for v in gen.grid_size),
        max_voxels=100, max_points_per_voxel=5)
    voxels, coords, counts = (np.asarray(voxels), np.asarray(coords),
                              np.asarray(counts))
    assert int(nvox) == 100
    host_set = {tuple(c) for c in host["coordinates"]}
    dev_set = {tuple(c) for c in coords[coords[:, 0] >= 0]}
    assert host_set == dev_set
    # per-voxel contents match too
    host_map = {tuple(c): (host["num_points_per_voxel"][i],
                           np.sort(host["voxels"][i].ravel()))
                for i, c in enumerate(host["coordinates"])}
    for i, c in enumerate(coords):
        if c[0] < 0:
            continue
        hc, hv = host_map[tuple(c)]
        assert counts[i] == hc, (c, counts[i], hc)
        np.testing.assert_allclose(np.sort(voxels[i].ravel()), hv,
                                   atol=1e-6)


def test_flat_pillarize_overflow_matches_host():
    """Same FCFS-overflow contract for the flat pillar path."""
    import jax.numpy as jnp

    from second_tpu.models.pp_fast import flat_pillarize

    gen = VoxelGenerator([0.2, 0.2, 2.0], PCR, max_num_points=5,
                         max_voxels=64)
    rng = np.random.RandomState(1)
    pts = np.stack([
        rng.uniform(0, 4, 1500),
        rng.uniform(-2, 2, 1500),
        rng.uniform(-1, 1, 1500),
        rng.uniform(0, 1, 1500),
    ], axis=1).astype(np.float32)
    host = gen.generate(pts)
    assert host["voxels"].shape[0] == 64

    N = 2048
    buf = np.zeros((N, 4), np.float32)
    buf[:len(pts)] = pts
    _, _, _, pillar_coords, counts, nvox = flat_pillarize(
        jnp.asarray(buf), len(pts), (0.2, 0.2, 2.0), tuple(PCR[:3]),
        grid_size=tuple(int(v) for v in gen.grid_size), max_voxels=64)
    pillar_coords = np.asarray(pillar_coords)
    host_set = {tuple(c) for c in host["coordinates"]}
    dev_set = {tuple(c) for c in pillar_coords[pillar_coords[:, 0] >= 0]}
    assert host_set == dev_set
