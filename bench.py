#!/usr/bin/env python
"""End-to-end inference benchmark on the flagship model.

Measures points -> detections frames/sec on one chip: on-device
voxelization + PillarFeatureNet + scatter + RPN + decode + rotated NMS,
all inside a single jitted program (no host round trips).  Reference
baseline: 25 fps on a GTX 1080Ti (BASELINE.md).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from second_tpu.builders import build_network
    from second_tpu.data.synthetic import make_scene
    from second_tpu.models.voxelnet import predict
    from second_tpu.ops.voxelize import voxelize
    from second_tpu.utils.config_tool import read_config

    cfg = read_config(
        "/root/reference/second/configs/pointpillars/car/xyres_16.config")
    parts = build_network(cfg.model.second)
    net, spec, gen = parts["net"], parts["spec"], parts["voxel_generator"]
    anchors = parts["anchor_cache"]["anchors"].astype(np.float32)
    A = anchors.shape[0]

    N_POINTS = 32768  # sized for KITTI velodyne_reduced clouds (~18k pts)
    MAX_VOXELS = 12000
    BATCH = 2  # measured throughput peak on one v5e chip
    T = gen.max_num_points_per_voxel
    grid = tuple(int(v) for v in gen.grid_size)

    rng = np.random.RandomState(0)
    points, _, _ = make_scene(rng, num_objects=12, num_bg_points=24000,
                              points_per_object=300)
    buf = np.zeros((N_POINTS, 4), np.float32)
    n = min(len(points), N_POINTS)
    buf[:n] = points[:n]

    variables = net.init(
        jax.random.PRNGKey(0),
        np.zeros((1, MAX_VOXELS, T, 4), np.float32),
        np.zeros((1, MAX_VOXELS), np.int32),
        np.full((1, MAX_VOXELS, 3), -1, np.int32),
    )
    anchors_b = jnp.asarray(
        np.broadcast_to(anchors[None], (BATCH,) + anchors.shape))

    @jax.jit
    def e2e(variables, points_buf, num_points):
        def vox(p):
            return voxelize(
                p, num_points,
                tuple(gen.voxel_size.tolist()),
                tuple(gen.point_cloud_range[:3].tolist()),
                grid_size=grid,
                max_voxels=MAX_VOXELS,
                max_points_per_voxel=T,
            )
        voxels, coords, counts, _ = jax.vmap(vox)(points_buf)
        preds = net.apply(variables, voxels, counts, coords)
        return predict(spec, preds, {"anchors": anchors_b})

    pts_j = jnp.asarray(np.broadcast_to(buf[None], (BATCH,) + buf.shape))
    dets = e2e(variables, pts_j, n)
    # NOTE: block_until_ready is unreliable on the tunneled TPU backend;
    # a host transfer is the only honest sync
    _ = np.asarray(dets["scores"])

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        dets = e2e(variables, pts_j, n)
    _ = np.asarray(dets["scores"])
    dt = (time.perf_counter() - t0) / iters
    fps = BATCH / dt

    print(json.dumps({
        "metric": "pointpillars_e2e_inference",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 25.0, 2),
    }))
    del A


if __name__ == "__main__":
    main()
