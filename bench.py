#!/usr/bin/env python
"""End-to-end inference benchmarks on the two flagship models.

Measures points -> detections frames/sec on one chip, all inside jitted
programs (no host round trips in the compute path):

  * PointPillars xyres_16 (batch 2, on-device voxelization) — the
    dense flagship.
  * car.fhd SECOND (batch 1 — measured optimum, larger batches hit a
    memory cliff; host C++ voxelizer + rulebook planner,
    device gather-GEMM sparse middle) — the sparse flagship; host
    planning runs in dataloader workers in production and overlaps
    device compute, so the device program is what is timed (same
    treatment the reference gives spconv, whose rulebooks are also
    CPU-built).

Reference baseline: 25 fps on a GTX 1080Ti (BASELINE.md, car.fhd).
Scene: deterministic KITTI-stats synthetic cloud (~18k pts, 1/r ground
density, clutter, car clusters) so voxel counts / active sets / NMS
load are representative of velodyne_reduced frames.

Prints ONE json line with the canonical PP metric plus the car.fhd
numbers as extra fields.

Timing note: block_until_ready is unreliable on the tunneled axon
backend; each measurement dispatches N iterations then forces ONE small
host transfer.
"""

import json
import os
import time

import numpy as np

ITERS = 30
BASELINE_FPS = 25.0


def _sync(x):
    return np.asarray(x).ravel()[:1]


def bench_pointpillars():
    import jax
    import jax.numpy as jnp

    from second_tpu.builders import build_network
    from second_tpu.data.synthetic import make_kitti_scene
    from second_tpu.models import pp_fast
    from second_tpu.models.voxelnet import predict
    from second_tpu.utils.config_tool import read_config

    cfg = read_config(
        "/root/reference/second/configs/pointpillars/car/xyres_16.config")
    parts = build_network(cfg.model.second)
    net, spec, gen = parts["net"], parts["spec"], parts["voxel_generator"]
    model_cfg = parts["model_cfg"]
    anchors = parts["anchor_cache"]["anchors"].astype(np.float32)

    N_POINTS = 32768  # KITTI velodyne_reduced clouds are ~18k points
    MAX_VOXELS = 12000
    BATCH = 2  # measured throughput peak on one chip
    T = int(gen.max_num_points_per_voxel)

    rng = np.random.RandomState(0)
    points, _, _ = make_kitti_scene(rng)
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

    # flat-point pillar path (models/pp_fast.py): no [V, T, F] buffer,
    # pointwise PFN + segment-max; parity-tested vs the module path
    @jax.jit
    def e2e(variables, points_buf, num_points):
        return pp_fast.pointpillars_infer(
            variables, net, spec, predict, anchors_b,
            points_buf, num_points,
            gen=gen, model_cfg=model_cfg, max_voxels=MAX_VOXELS)

    pts_j = jnp.asarray(np.broadcast_to(buf[None], (BATCH,) + buf.shape))
    ns = jnp.full((BATCH,), n, jnp.int32)
    dets = e2e(variables, pts_j, ns)
    _ = _sync(dets["scores"])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        dets = e2e(variables, pts_j, ns)
    _ = _sync(dets["scores"])
    dt = (time.perf_counter() - t0) / ITERS
    return BATCH / dt


def bench_car_fhd(batch=1):
    import jax
    import jax.numpy as jnp

    from second_tpu.builders import build_network
    from second_tpu.data.synthetic import make_kitti_scene
    from second_tpu.models import sparse_middle as sm
    from second_tpu.models.voxelnet import predict
    from second_tpu.utils.config_tool import read_config

    cfg = read_config("/root/reference/second/configs/car.fhd.config")
    parts = build_network(cfg.model.second, compute_dtype="bfloat16",
                          use_banded=True)
    net, spec, gen = parts["net"], parts["spec"], parts["voxel_generator"]
    anchors = parts["anchor_cache"]["anchors"].astype(np.float32)

    V = 17000  # train-time max_number_of_voxels (car.fhd.config)
    rng = np.random.RandomState(0)
    points, _, _ = make_kitti_scene(rng)
    res = gen.generate_multi_gpu(points, max_voxels=V)
    n = int(res["voxel_num"])
    coords1 = np.full((V, 3), -1, np.int32)
    coords1[:n] = res["coordinates"][:n]
    scales = sm.plan_scales(
        "SpMiddleFHD", [1] + gen.grid_size[::-1].tolist() + [16], V)
    # host-built rulebooks need voxels sorted by linear id (the
    # dataloader's prep does this too, preprocess.py:218-230)
    d0, h0, w0 = scales[0]["shape"]
    lin = np.where(
        coords1[:, 0] >= 0,
        (coords1[:, 0].astype(np.int64) * h0 + coords1[:, 1]) * w0
        + coords1[:, 2],
        d0 * h0 * w0)
    order = np.argsort(lin, kind="stable")
    coords1 = coords1[order]
    res["voxels"] = res["voxels"][order]
    res["num_points_per_voxel"] = res["num_points_per_voxel"][order]
    plan_np = sm.build_host_plan(coords1, scales, banded=True)

    B = batch
    # SimpleVoxel is a per-voxel mean: precompute on host and ship
    # [V, F] means (5x less H2D, skips a tiled-layout pass on device)
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

    dets = e2e(variables, vx, npts, crd, plan)
    _ = _sync(dets["scores"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        dets = e2e(variables, vx, npts, crd, plan)
    _ = _sync(dets["scores"])
    dt = (time.perf_counter() - t0) / ITERS
    return B / dt


def bench_car_fhd_train(batch=2, iters=20):
    """car.fhd TRAIN-STEP throughput (fwd + bwd + optimizer, banded
    kernels with custom VJP, host-built forward AND transpose plans) —
    the reference trains car.fhd at ~8 frames/s (50 epochs / 6.5 h,
    reference README.md:36).  Synthetic targets: throughput does not
    depend on label values."""
    import jax
    import jax.numpy as jnp
    import optax

    from second_tpu.builders import build_network
    from second_tpu.data.synthetic import make_kitti_scene
    from second_tpu.models import sparse_middle as sm
    from second_tpu.train.state import TrainState, make_train_step
    from second_tpu.utils.config_tool import read_config

    cfg = read_config("/root/reference/second/configs/car.fhd.config")
    parts = build_network(cfg.model.second, compute_dtype="bfloat16",
                          use_banded=True)
    net, spec, gen = parts["net"], parts["spec"], parts["voxel_generator"]
    anchors = parts["anchor_cache"]["anchors"].astype(np.float32)

    V = 17000
    points, _, _ = make_kitti_scene(np.random.RandomState(0))
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
    plan_np = sm.build_host_plan(coords1, scales, banded=True,
                                 banded_bwd=True)

    counts_np = res["num_points_per_voxel"].astype(np.float32)
    means_np = (res["voxels"].astype(np.float32).sum(axis=1)
                / np.maximum(counts_np, 1)[:, None])
    B = batch
    bcast = lambda a: np.broadcast_to(a[None], (B,) + a.shape)
    A = anchors.shape[0]
    rng = np.random.RandomState(1)
    labels = np.zeros((B, A), np.int32)
    labels[:, rng.choice(A, 40, replace=False)] = 1
    labels[:, rng.choice(A, 200, replace=False)] = -1
    example = {
        "voxels": jnp.asarray(bcast(means_np)),
        "num_points": jnp.asarray(
            bcast(res["num_points_per_voxel"].astype(np.int32))),
        "coordinates": jnp.asarray(bcast(coords1)),
        "anchors": jnp.asarray(bcast(anchors)),
        "labels": jnp.asarray(labels),
        "reg_targets": jnp.asarray(
            rng.randn(B, A, spec.box_code_size).astype(np.float32) * 0.1),
        **{k: jnp.asarray(bcast(v)) for k, v in plan_np.items()},
    }

    variables = jax.jit(
        lambda k, ex: net.init(
            k, ex["voxels"], ex["num_points"], ex["coordinates"],
            sparse_plan={kk: v for kk, v in ex.items()
                         if kk.startswith("plan_")})
    )(jax.random.PRNGKey(0), example)
    tx = optax.adamw(1e-3, weight_decay=1e-4)
    state = TrainState.create(variables, tx)
    step = make_train_step(net, spec, tx)

    state, metrics = step(state, example)
    _ = _sync(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, example)
    _ = _sync(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    return B / dt


def bench_car_fhd_pipeline(batch=1, workers=6, frames=48):
    """SUSTAINED car.fhd inference: voxelize + C++ plan + H2D INSIDE
    the measured loop, planning overlapped with device compute via a
    thread pool (ctypes releases the GIL; this is the same treatment
    production gives the loader workers, but measured, not asserted).

    Returns (fps, plan_ms_per_frame_per_core, h2d_mb_per_frame)."""
    import concurrent.futures as cf

    import jax
    import jax.numpy as jnp

    from second_tpu.builders import build_network
    from second_tpu.data.synthetic import make_kitti_scene
    from second_tpu.models import sparse_middle as sm
    from second_tpu.models.voxelnet import predict
    from second_tpu.utils.config_tool import read_config

    cfg = read_config("/root/reference/second/configs/car.fhd.config")
    parts = build_network(cfg.model.second, compute_dtype="bfloat16",
                          use_banded=True)
    net, spec, gen = parts["net"], parts["spec"], parts["voxel_generator"]
    anchors = parts["anchor_cache"]["anchors"].astype(np.float32)
    V = 17000
    scales = sm.plan_scales(
        "SpMiddleFHD", [1] + gen.grid_size[::-1].tolist() + [16], V)
    d0, h0, w0 = scales[0]["shape"]

    # pre-generate the clouds (the stand-in for reading .bin files —
    # scene synthesis is not pipeline work)
    clouds = []
    for i in range(frames + 1):
        pts, _, _ = make_kitti_scene(np.random.RandomState(i))
        clouds.append(pts)

    def prep(seed):
        """Voxelize + sort + full banded plan for ONE frame (the work a
        loader worker does per frame at eval time)."""
        points = clouds[seed]
        res = gen.generate_multi_gpu(points, max_voxels=V)
        n = int(res["voxel_num"])
        coords = np.full((V, 3), -1, np.int32)
        coords[:n] = res["coordinates"][:n]
        lin = np.where(
            coords[:, 0] >= 0,
            (coords[:, 0].astype(np.int64) * h0 + coords[:, 1]) * w0
            + coords[:, 2], d0 * h0 * w0)
        order = np.argsort(lin, kind="stable")
        coords = coords[order]
        counts = res["num_points_per_voxel"][order].astype(np.float32)
        means = (res["voxels"][order].astype(np.float32).sum(axis=1)
                 / np.maximum(counts, 1)[:, None])
        plan = sm.build_host_plan(coords, scales, banded=True)
        return {"vx": means[None], "npts": counts[None].astype(np.int32),
                "crd": coords[None],
                **{k: v[None] for k, v in plan.items()}}

    # warm: compile + measure single-core plan cost and payload
    t0 = time.perf_counter()
    first = prep(0)
    plan_ms = (time.perf_counter() - t0) * 1e3
    h2d_mb = sum(v.nbytes for v in first.values()) / 1e6
    anchors_b = jnp.asarray(anchors[None])

    def to_dev(h):
        return {k: jnp.asarray(v) for k, v in h.items()}

    @jax.jit
    def e2e(variables, ex):
        plan = {k: v for k, v in ex.items()
                if k.startswith("plan_")}
        preds = net.apply(variables, ex["vx"], ex["npts"], ex["crd"],
                          sparse_plan=plan)
        return predict(spec, preds, {"anchors": anchors_b})

    dev0 = to_dev(first)
    variables = jax.jit(
        lambda k, ex: net.init(k, ex["vx"], ex["npts"], ex["crd"],
                               sparse_plan={kk: v for kk, v in ex.items()
                                            if kk.startswith("plan_")})
    )(jax.random.PRNGKey(0), dev0)
    _ = _sync(e2e(variables, dev0)["scores"])

    # sustained loop: workers plan ahead, main thread feeds the device
    workers = min(workers, os.cpu_count() or 1)
    with cf.ThreadPoolExecutor(max_workers=workers) as pool:
        futs = [pool.submit(prep, 1 + i) for i in range(frames)]
        t0 = time.perf_counter()
        dets = None
        for f in futs:
            dets = e2e(variables, to_dev(f.result()))
        _ = _sync(dets["scores"])
        dt = time.perf_counter() - t0
    return frames / dt, plan_ms, h2d_mb


def main():
    # fps-vs-batch: TPU throughput comes from batching; record the
    # sweep and report the best as the headline number
    fhd_by_batch = {}
    for b in (1, 2):
        try:
            fhd_by_batch[b] = bench_car_fhd(batch=b)
            print(f"# car.fhd e2e batch={b}: {fhd_by_batch[b]:.2f} "
                  f"frames/s/chip")
        except Exception as e:
            print(f"# car.fhd batch={b} failed: {e!r}")
    best_b = max(fhd_by_batch, key=fhd_by_batch.get)
    fhd_fps = fhd_by_batch[best_b]
    print(f"# car.fhd e2e: {fhd_fps:.2f} frames/s/chip at batch {best_b} "
          f"({fhd_fps / BASELINE_FPS:.2f}x the 25 fps baseline)")
    ncores = os.cpu_count() or 1
    try:
        pipe_fps, plan_ms, h2d_mb = bench_car_fhd_pipeline()
        print(f"# car.fhd sustained pipeline (voxelize+plan+H2D in loop, "
              f"{ncores} host cores): {pipe_fps:.2f} frames/s "
              f"({plan_ms:.0f} ms plan/frame/core, "
              f"{h2d_mb:.1f} MB/frame H2D)")
    except Exception as e:  # must not take down the core metrics
        print(f"# car.fhd pipeline bench failed: {e!r}")
        pipe_fps = plan_ms = h2d_mb = None
    try:
        train_fps = bench_car_fhd_train()
        print(f"# car.fhd train step (fwd+bwd+opt, banded, batch 2): "
              f"{train_fps:.2f} frames/s/chip "
              f"(reference trains at ~8 frames/s)")
    except Exception as e:
        print(f"# car.fhd train bench failed: {e!r}")
        train_fps = None
    pp_fps = bench_pointpillars()
    print(f"# pointpillars e2e: {pp_fps:.2f} frames/s/chip")
    print(json.dumps({
        "metric": "pointpillars_e2e_inference",
        "value": round(pp_fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(pp_fps / BASELINE_FPS, 2),
        "car_fhd_fps": round(fhd_fps, 2),
        "car_fhd_vs_baseline": round(fhd_fps / BASELINE_FPS, 2),
        "car_fhd_batch": best_b,
        "car_fhd_fps_by_batch": {
            str(k): round(v, 2) for k, v in fhd_by_batch.items()},
        "car_fhd_pipeline_fps": (
            round(pipe_fps, 2) if pipe_fps is not None else None),
        "car_fhd_plan_ms_per_core": (
            round(plan_ms, 1) if plan_ms is not None else None),
        "car_fhd_h2d_mb_per_frame": (
            round(h2d_mb, 2) if h2d_mb is not None else None),
        "car_fhd_train_fps": (
            round(train_fps, 2) if train_fps is not None else None),
        "host_cores": ncores,
    }))


if __name__ == "__main__":
    main()
