#!/usr/bin/env python
"""Phase-level timing breakdown of the car.fhd inference program.

Times, on the real chip:
  * full e2e (host plan, banded)       — the bench.py number
  * net.apply only (no predict)        — splits off predict/NMS
  * middle only                        — splits off the RPN
  * middle with plan=None              — device-side rulebook+banded
                                          planning cost (the delta)
  * batch=2 variants                   — probes the "memory cliff"

Usage: python tools/profile_fhd.py [--batch 1] [--iters 20]
"""

import argparse
import time

import numpy as np


def _sync(x):
    return np.asarray(x).ravel()[:1]


def timeit(fn, iters=20):
    r = fn()
    _sync(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    _sync(jax.tree_util.tree_leaves(r)[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from second_tpu.builders import build_network  # noqa: E402
from second_tpu.data.synthetic import make_kitti_scene  # noqa: E402
from second_tpu.models import sparse_middle as sm  # noqa: E402
from second_tpu.models.voxelnet import predict  # noqa: E402
from second_tpu.utils.config_tool import read_config  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--no-banded", action="store_true")
    args = ap.parse_args()
    B = args.batch

    cfg = read_config("/root/reference/second/configs/car.fhd.config")
    parts = build_network(cfg.model.second, compute_dtype="bfloat16",
                          use_banded=not args.no_banded)
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
    t0 = time.perf_counter()
    plan_np = sm.build_host_plan(coords1, scales, banded=True)
    print(f"host plan build: {(time.perf_counter()-t0)*1e3:.1f} ms, "
          f"{sum(v.nbytes for v in plan_np.values())/1e6:.2f} MB")

    counts_np = res["num_points_per_voxel"].astype(np.float32)
    means_np = (res["voxels"].astype(np.float32).sum(axis=1)
                / np.maximum(counts_np, 1)[:, None])
    vx = jnp.asarray(np.broadcast_to(means_np[None], (B,) + means_np.shape))
    npts = jnp.asarray(np.broadcast_to(
        res["num_points_per_voxel"].astype(np.int32)[None], (B, V)))
    crd = jnp.asarray(np.broadcast_to(coords1[None], (B, V, 3)))
    plan = {k: jnp.asarray(np.broadcast_to(v[None], (B,) + v.shape))
            for k, v in plan_np.items()}
    anchors_b = jnp.asarray(
        np.broadcast_to(anchors[None], (B,) + anchors.shape))

    variables = jax.jit(
        lambda k, v, c, p, pl: net.init(k, v, c, p, sparse_plan=pl)
    )(jax.random.PRNGKey(0), vx, npts, crd, plan)

    @jax.jit
    def e2e(variables, vx, npts, crd, plan):
        preds = net.apply(variables, vx, npts, crd, sparse_plan=plan)
        return predict(spec, preds, {"anchors": anchors_b})

    @jax.jit
    def fwd(variables, vx, npts, crd, plan):
        return net.apply(variables, vx, npts, crd, sparse_plan=plan)

    @jax.jit
    def fwd_noplan(variables, vx, npts, crd):
        return net.apply(variables, vx, npts, crd)

    it = args.iters
    ms_e2e = timeit(lambda: e2e(variables, vx, npts, crd, plan), it)
    ms_fwd = timeit(lambda: fwd(variables, vx, npts, crd, plan), it)
    print(f"B={B} e2e: {ms_e2e:.2f} ms ({B/ms_e2e*1e3:.1f} fps), "
          f"fwd: {ms_fwd:.2f} ms, predict: {ms_e2e-ms_fwd:.2f} ms")

    # middle alone (same params via extraction of submodule scope)
    mid = net.bind(variables).middle_feature_extractor
    mid_mod = mid.clone()
    mid_vars = {"params": variables["params"]["middle_feature_extractor"],
                "batch_stats": variables["batch_stats"][
                    "middle_feature_extractor"]}
    vfeat = jnp.asarray(means_np[None].repeat(B, 0), jnp.bfloat16)

    @jax.jit
    def mid_only(mv, vf, crd, plan):
        return mid_mod.apply(mv, vf, crd, plan=plan)

    @jax.jit
    def mid_noplan(mv, vf, crd):
        return mid_mod.apply(mv, vf, crd)

    ms_mid = timeit(lambda: mid_only(mid_vars, vfeat, crd, plan), it)
    print(f"middle (host plan): {ms_mid:.2f} ms")
    try:
        ms_midnp = timeit(lambda: mid_noplan(mid_vars, vfeat, crd), it)
        print(f"middle (device plan): {ms_midnp:.2f} ms "
              f"(device planning ~{ms_midnp-ms_mid:.2f} ms)")
    except Exception as e:
        print(f"middle(device plan) failed: {type(e).__name__}: {e}")

    # RPN alone
    spatial = mid_only(mid_vars, vfeat, crd, plan)
    rpn_mod = net.bind(variables).rpn.clone()
    rpn_vars = {"params": variables["params"]["rpn"],
                "batch_stats": variables["batch_stats"]["rpn"]}

    @jax.jit
    def rpn_only(rv, sp):
        return rpn_mod.apply(rv, sp)

    ms_rpn = timeit(lambda: rpn_only(rpn_vars, spatial), it)
    print(f"rpn: {ms_rpn:.2f} ms  (spatial {spatial.shape} "
          f"{spatial.dtype})")
    print(f"residual (vfe + reshapes): "
          f"{ms_fwd - ms_mid - ms_rpn:.2f} ms")


if __name__ == "__main__":
    main()
