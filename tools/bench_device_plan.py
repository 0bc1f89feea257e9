#!/usr/bin/env python
"""Measure car.fhd with DEVICE-side sparse planning (no host plans).

The host-planned path ships ~18 MB/frame of rulebooks + banded window
metadata over PCIe.  The no-plan path builds everything on device
(sparse.lookup_many index grids, downsample_active_set,
build_banded_plan reductions) from just voxels+coords (~0.5 MB/frame),
at the cost of per-frame device planning work.  This tool measures
both programs back to back plus the sustained loop for the device-plan
variant, so the pipeline can pick the right trade per host:

  * tunneled / weak-host rigs: device planning wins (H2D-bound)
  * PCIe hosts with spare cores: host planning wins (device-bound)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_device_plan.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from second_tpu.builders import build_network
from second_tpu.data.synthetic import make_kitti_scene
from second_tpu.models import sparse_middle as sm
from second_tpu.models.voxelnet import predict
from second_tpu.utils.config_tool import read_config

ITERS = 30


def _sync(x):
    return np.asarray(x).ravel()[:1]


def main():
    cfg = read_config("/root/reference/second/configs/car.fhd.config")
    parts = build_network(cfg.model.second, compute_dtype="bfloat16",
                          use_banded=True)
    net, spec, gen = parts["net"], parts["spec"], parts["voxel_generator"]
    anchors = parts["anchor_cache"]["anchors"].astype(np.float32)

    V = 17000
    rng = np.random.RandomState(0)
    points, _, _ = make_kitti_scene(rng)
    res = gen.generate_multi_gpu(points, max_voxels=V)
    n = int(res["voxel_num"])
    coords1 = np.full((V, 3), -1, np.int32)
    coords1[:n] = res["coordinates"][:n]
    scales = sm.plan_scales(
        "SpMiddleFHD", [1] + gen.grid_size[::-1].tolist() + [16], V)
    d0, h0, w0 = scales[0]["shape"]
    lin = np.where(
        coords1[:, 0] >= 0,
        (coords1[:, 0].astype(np.int64) * h0 + coords1[:, 1]) * w0
        + coords1[:, 2], d0 * h0 * w0)
    order = np.argsort(lin, kind="stable")
    coords1 = coords1[order]
    res["voxels"] = res["voxels"][order]
    res["num_points_per_voxel"] = res["num_points_per_voxel"][order]

    counts_np = res["num_points_per_voxel"].astype(np.float32)
    means_np = (res["voxels"].astype(np.float32).sum(axis=1)
                / np.maximum(counts_np, 1)[:, None])
    vx = jnp.asarray(means_np[None])
    npts = jnp.asarray(res["num_points_per_voxel"].astype(np.int32)[None])
    crd = jnp.asarray(coords1[None])
    anchors_b = jnp.asarray(anchors[None])
    h2d_mb = (means_np.nbytes + res["num_points_per_voxel"].nbytes
              + coords1.nbytes) / 1e6

    variables = jax.jit(
        lambda k, v, c, p: net.init(k, v, c, p)
    )(jax.random.PRNGKey(0), vx, npts, crd)

    @jax.jit
    def e2e(variables, vx, npts, crd):
        preds = net.apply(variables, vx, npts, crd)
        return predict(spec, preds, {"anchors": anchors_b})

    print("compiling device-plan e2e ...")
    t0 = time.perf_counter()
    dets = e2e(variables, vx, npts, crd)
    _ = _sync(dets["scores"])
    print(f"  compile+first: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(ITERS):
        dets = e2e(variables, vx, npts, crd)
    _ = _sync(dets["scores"])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"device-plan e2e: {dt * 1e3:.2f} ms ({1 / dt:.2f} fps)  "
          f"H2D {h2d_mb:.2f} MB/frame")

    # sustained: voxelize on host per frame, tiny H2D, device plans
    clouds = [make_kitti_scene(np.random.RandomState(i))[0]
              for i in range(33)]

    def prep(i):
        r = gen.generate_multi_gpu(clouds[i], max_voxels=V)
        nn_ = int(r["voxel_num"])
        c = np.full((V, 3), -1, np.int32)
        c[:nn_] = r["coordinates"][:nn_]
        li = np.where(
            c[:, 0] >= 0,
            (c[:, 0].astype(np.int64) * h0 + c[:, 1]) * w0 + c[:, 2],
            d0 * h0 * w0)
        o = np.argsort(li, kind="stable")
        c = c[o]
        cn = r["num_points_per_voxel"][o].astype(np.float32)
        mn = (r["voxels"][o].astype(np.float32).sum(axis=1)
              / np.maximum(cn, 1)[:, None])
        return mn[None], cn[None].astype(np.int32), c[None]

    t0 = time.perf_counter()
    prep(0)
    prep_ms = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    dets = None
    for i in range(1, 33):
        mn, cn, c = prep(i)
        dets = e2e(variables, jnp.asarray(mn), jnp.asarray(cn),
                   jnp.asarray(c))
    _ = _sync(dets["scores"])
    dt = (time.perf_counter() - t0) / 32
    print(f"device-plan sustained (voxelize+H2D in loop, serial): "
          f"{dt * 1e3:.2f} ms ({1 / dt:.2f} fps; host prep "
          f"{prep_ms:.0f} ms/frame)")


if __name__ == "__main__":
    main()
