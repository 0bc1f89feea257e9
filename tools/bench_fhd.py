#!/usr/bin/env python
"""car.fhd (SECOND sparse middle) inference benchmark with stage breakdown.

Measures, on one chip:
  * full e2e device program (VFE + sparse middle + RPN + decode + NMS)
  * middle-only / rpn-only / predict-only sub-programs
  * host planning cost (C++ rulebook builder)
for f32 and bf16, at batch sizes 1/2/4.

Timing note: block_until_ready does not synchronize on the tunneled
axon backend; every measurement dispatches N iterations then forces ONE
small host transfer.
"""

import argparse
import time

import numpy as np


def sync(x):
    return np.asarray(x).ravel()[:1]


def timeit(fn, sync_out, iters=20):
    fn()  # warm
    sync_out()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    sync_out()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--max_voxels", type=int, default=17000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--stages", action="store_true",
                    help="also time middle/rpn/predict sub-programs")
    ap.add_argument("--skip_noplan", action="store_true",
                    help="skip the all-device (no host planner) variant")
    ap.add_argument("--banded", action="store_true",
                    help="banded one-hot gather-GEMM Pallas kernels")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from second_tpu.builders import build_network
    from second_tpu.data.synthetic import make_kitti_scene
    from second_tpu.models import sparse_middle as sm
    from second_tpu.models.voxelnet import predict
    from second_tpu.utils.config_tool import read_config

    cfg = read_config("/root/reference/second/configs/car.fhd.config")
    compute_dtype = None if args.dtype == "float32" else args.dtype
    parts = build_network(cfg.model.second, compute_dtype=compute_dtype,
                          use_banded=args.banded)
    net, spec, gen = parts["net"], parts["spec"], parts["voxel_generator"]
    anchors = parts["anchor_cache"]["anchors"].astype(np.float32)

    B = args.batch
    V = args.max_voxels
    T = gen.max_num_points_per_voxel
    rng = np.random.RandomState(0)
    points, _, _ = make_kitti_scene(rng)
    print(f"scene: {len(points)} points")

    t0 = time.perf_counter()
    res = gen.generate_multi_gpu(points, max_voxels=V)
    t_vox = time.perf_counter() - t0
    n = int(res["voxel_num"])
    print(f"host voxelize: {t_vox*1e3:.2f} ms, {n} voxels (cap {V})")

    voxels = np.zeros((B, V, T, 4), np.float32)
    num_points = np.zeros((B, V), np.int32)
    coords = np.full((B, V, 3), -1, np.int32)
    for b in range(B):
        voxels[b] = res["voxels"]
        num_points[b] = res["num_points_per_voxel"]
        coords[b, :n] = res["coordinates"][:n]

    # host plan
    grid_size = gen.grid_size
    output_shape = [1] + grid_size[::-1].tolist() + [16]
    scales = sm.plan_scales("SpMiddleFHD", output_shape, V)
    # host-built rulebooks need voxels sorted by linear id
    # (preprocess.py:218-230 contract)
    d0, h0, w0 = scales[0]["shape"]
    lin = np.where(
        coords[0, :, 0] >= 0,
        (coords[0, :, 0].astype(np.int64) * h0 + coords[0, :, 1]) * w0
        + coords[0, :, 2],
        d0 * h0 * w0)
    order = np.argsort(lin, kind="stable")
    voxels = voxels[:, order]
    num_points = num_points[:, order]
    coords = coords[:, order]
    t0 = time.perf_counter()
    plan_np = sm.build_host_plan(coords[0], scales, banded=args.banded)
    t_plan = time.perf_counter() - t0
    print(f"host plan: {t_plan*1e3:.2f} ms/frame (1 core)")
    for i, sc in enumerate(scales):
        if sc["out_cap"]:
            na = int((plan_np[f"plan_coords{i}"][:, 0] >= 0).sum())
            print(f"  scale{i}: out_cap={sc['out_cap']} active={na} "
                  f"({na/sc['out_cap']:.0%})")
    plan = {k: jnp.asarray(np.broadcast_to(v[None], (B,) + v.shape))
            for k, v in plan_np.items()}

    # init through the HOST-PLANNED path under jit: the all-device path
    # traced eagerly dispatches thousands of tiny ops over the tunneled
    # backend (argsort + dense index grids) and takes tens of minutes;
    # params/batch_stats are identical either way (same modules)
    plan1 = {k: jnp.asarray(v[None]) for k, v in plan_np.items()}
    variables = jax.jit(
        lambda k, v, n, c, p: net.init(k, v, n, c, sparse_plan=p)
    )(jax.random.PRNGKey(0), voxels[:1], num_points[:1], coords[:1], plan1)
    anchors_b = jnp.asarray(
        np.broadcast_to(anchors[None], (B,) + anchors.shape))
    vx, npts, crd = jnp.asarray(voxels), jnp.asarray(num_points), \
        jnp.asarray(coords)

    @jax.jit
    def e2e(variables, vx, npts, crd, plan):
        preds = net.apply(variables, vx, npts, crd, sparse_plan=plan)
        return predict(spec, preds, {"anchors": anchors_b})

    dt = timeit(lambda: e2e(variables, vx, npts, crd, plan),
                lambda: sync(e2e(variables, vx, npts, crd, plan)["scores"]),
                args.iters)
    print(f"e2e host-planned [{args.dtype} B={B}]: {dt*1e3:.2f} ms/batch = "
          f"{B/dt:.1f} fps")

    if not args.skip_noplan:
        @jax.jit
        def e2e_noplan(variables, vx, npts, crd):
            preds = net.apply(variables, vx, npts, crd)
            return predict(spec, preds, {"anchors": anchors_b})

        dt = timeit(
            lambda: e2e_noplan(variables, vx, npts, crd),
            lambda: sync(e2e_noplan(variables, vx, npts, crd)["scores"]),
            args.iters)
        print(f"e2e all-device  [{args.dtype} B={B}]: {dt*1e3:.2f} ms/batch"
              f" = {B/dt:.1f} fps")

    if not args.stages:
        return

    # stage breakdown (host-planned path) via apply(method=...) on the
    # full variable tree
    @jax.jit
    def vfe_fn(v, vx, npts, crd):
        return net.apply(
            v, vx, npts, crd,
            method=lambda m, a, b, c: m.voxel_feature_extractor(a, b, c))

    vfeats = vfe_fn(variables, vx, npts, crd)
    dt = timeit(lambda: vfe_fn(variables, vx, npts, crd),
                lambda: sync(vfe_fn(variables, vx, npts, crd)), args.iters)
    print(f"  vfe:     {dt*1e3:.2f} ms")

    @jax.jit
    def mid_fn(v, f, crd, plan):
        return net.apply(
            v, f, crd, plan,
            method=lambda m, a, b, p: m.middle_feature_extractor(
                a, b, plan=p))

    bev = mid_fn(variables, vfeats, crd, plan)
    dt = timeit(lambda: mid_fn(variables, vfeats, crd, plan),
                lambda: sync(mid_fn(variables, vfeats, crd, plan)),
                args.iters)
    print(f"  middle:  {dt*1e3:.2f} ms (host-planned)")

    @jax.jit
    def rpn_fn(v, bev):
        return net.apply(v, bev, method=lambda m, a: m.rpn(a))

    preds = rpn_fn(variables, bev)
    dt = timeit(lambda: rpn_fn(variables, bev),
                lambda: sync(rpn_fn(variables, bev)["box_preds"]), args.iters)
    print(f"  rpn:     {dt*1e3:.2f} ms")

    @jax.jit
    def pred_fn(preds):
        flat = {
            "box_preds": preds["box_preds"].reshape(B, -1, 7),
            "cls_preds": preds["cls_preds"].reshape(B, -1, 1),
            "dir_cls_preds": preds["dir_cls_preds"].reshape(B, -1, 2),
        }
        return predict(spec, flat, {"anchors": anchors_b})

    dt = timeit(lambda: pred_fn(preds),
                lambda: sync(pred_fn(preds)["scores"]), args.iters)
    print(f"  predict: {dt*1e3:.2f} ms (decode+NMS)")


if __name__ == "__main__":
    main()
