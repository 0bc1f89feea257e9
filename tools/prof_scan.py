#!/usr/bin/env python
"""In-graph repetition profiler for the car.fhd device program.

Dispatch overhead on a 1-core tunneled host corrupts loop-of-dispatch
timings (tools/profile_fhd.py measured middle-alone > full-forward).
Here every measured region runs N times INSIDE one jitted lax.scan,
with the iteration index folded into the input so XLA cannot CSE the
iterations; one dispatch, one sync.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/prof_scan.py
"""

import argparse
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


def scan_time(fn, args, iters=30, perturb=None):
    """Time fn(*args) run `iters` times inside ONE jitted scan.

    perturb: name of the leaf in args[0..] to fold the iteration index
    into (defaults to the first float array found) so iterations are
    not CSE'd."""

    def body(carry, i):
        a = list(args)
        # fold i into the first float input (cheap, defeats CSE)
        def tweak(x):
            if isinstance(x, jnp.ndarray) and x.dtype in (
                    jnp.float32, jnp.bfloat16):
                return x + (i * 0).astype(x.dtype)
            return x
        # carry folds the previous output in, serializing iterations
        a0 = jax.tree_util.tree_map(tweak, a[0]) if a else a
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        dep = (leaf.ravel()[0].astype(jnp.float32) * 0 + carry * 0)
        return dep, None

    @jax.jit
    def run():
        dep, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(iters))
        return dep

    r = run()
    np.asarray(r)  # compile+run once
    t0 = time.perf_counter()
    np.asarray(run())
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    B = args.batch

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
    plan_np = sm.build_host_plan(coords1, scales, banded=True)

    counts_np = res["num_points_per_voxel"].astype(np.float32)
    means_np = (res["voxels"].astype(np.float32).sum(axis=1)
                / np.maximum(counts_np, 1)[:, None])
    bc = lambda a: jnp.asarray(np.broadcast_to(a[None], (B,) + a.shape))
    vx, npts = bc(means_np), bc(res["num_points_per_voxel"].astype(np.int32))
    crd = bc(coords1)
    plan = {k: bc(v) for k, v in plan_np.items()}
    anchors_b = bc(anchors)

    variables = jax.jit(
        lambda k, v, c, p, pl: net.init(k, v, c, p, sparse_plan=pl)
    )(jax.random.PRNGKey(0), vx, npts, crd, plan)

    it = args.iters
    ms = scan_time(
        lambda v, a, b, c, p: predict(
            spec, net.apply(v, a, b, c, sparse_plan=p),
            {"anchors": anchors_b}),
        (variables, vx, npts, crd, plan), it)
    print(f"B={B} e2e(scan): {ms:.2f} ms  ({B / ms * 1e3:.1f} fps)")

    ms_fwd = scan_time(
        lambda v, a, b, c, p: net.apply(v, a, b, c, sparse_plan=p),
        (variables, vx, npts, crd, plan), it)
    print(f"fwd: {ms_fwd:.2f} ms   predict+nms: {ms - ms_fwd:.2f} ms")

    # middle only
    mid_mod = net.bind(variables).middle_feature_extractor.clone()
    mid_vars = {"params": variables["params"]["middle_feature_extractor"],
                "batch_stats": variables["batch_stats"][
                    "middle_feature_extractor"]}
    vfeat = jnp.asarray(means_np[None].repeat(B, 0), jnp.bfloat16)
    ms_mid = scan_time(
        lambda mv, vf, c, p: mid_mod.apply(mv, vf, c, plan=p),
        (mid_vars, vfeat, crd, plan), it)
    print(f"middle (host plan): {ms_mid:.2f} ms")

    spatial = jax.jit(
        lambda mv, vf, c, p: mid_mod.apply(mv, vf, c, plan=p)
    )(mid_vars, vfeat, crd, plan)
    rpn_mod = net.bind(variables).rpn.clone()
    rpn_vars = {"params": variables["params"]["rpn"],
                "batch_stats": variables["batch_stats"]["rpn"]}
    ms_rpn = scan_time(
        lambda rv, sp: rpn_mod.apply(rv, sp), (rpn_vars, spatial), it)
    print(f"rpn: {ms_rpn:.2f} ms  (spatial {spatial.shape})")

    # per-conv cost: one banded conv per scale, subm + down
    from second_tpu.ops import banded_sparse
    x = vfeat
    for i, sc in enumerate(scales):
        v_in = sc["in_cap"]
        cin = x.shape[-1]
        if sc["subm_kernels"]:
            kern = sc["subm_kernels"][0]
            p = banded_sparse.pack_factor(cin)
            kc = banded_sparse.choose_kc(kern, cin)
            pl_ = banded_sparse.plan_from_host(
                plan[f"plan_subm{i}"], plan[f"plan_bsub{i}_p{p}_b0"],
                plan[f"plan_bsub{i}_p{p}_cor"],
                plan[f"plan_bsub{i}_p{p}_cor_count"],
                v_in=v_in, kc=kc, c=cin)
            cout = sc["subm_widths"][-1]
            w = jnp.zeros((27, cin, cout), jnp.bfloat16)
            ms_c = scan_time(
                lambda f, w, pl_=pl_: banded_sparse.banded_conv(f, pl_, w),
                (x, w), it)
            print(f"  scale{i} subm conv ({v_in}x{cin}->{cout}): "
                  f"{ms_c:.3f} ms")
            x = jnp.zeros((B, v_in, cout), jnp.bfloat16)
        if sc["down"] is not None:
            kernel, stride, padding = sc["down"]
            k = int(np.prod(kernel))
            vout = sc["out_cap"]
            cin2 = x.shape[-1]
            kc = banded_sparse.choose_kc(kernel, cin2)
            pl_ = banded_sparse.plan_from_host(
                plan[f"plan_conv{i}"], plan[f"plan_bconv{i}_b0"],
                plan[f"plan_bconv{i}_cor"],
                plan[f"plan_bconv{i}_cor_count"], v_in=v_in, kc=kc,
                c=cin2, vout=vout)
            cout = sc["down_out_ch"]
            w = jnp.zeros((k, cin2, cout), jnp.bfloat16)
            ms_c = scan_time(
                lambda f, w, pl_=pl_: banded_sparse.banded_conv(f, pl_, w),
                (x, w), it)
            print(f"  scale{i} down conv ({v_in}->{vout} x{cin2}->{cout}):"
                  f" {ms_c:.3f} ms")
            x = jnp.zeros((B, vout, cout), jnp.bfloat16)


if __name__ == "__main__":
    main()
