#!/usr/bin/env python
"""In-graph repetition profiler for the car.fhd device program.

Dispatch overhead on a 1-core tunneled host corrupts loop-of-dispatch
timings of SMALL regions (per-conv, middle-alone).  Here every measured
region runs N times INSIDE one jitted lax.scan: one dispatch, one sync.

Anti-CSE/LICM contract: each iteration's inputs receive ``+ carry``
where carry is the previous iteration's output reduced to a scalar and
multiplied by zero.  The value is numerically zero, but XLA cannot fold
``x * 0`` for floats (NaN/Inf semantics) so the body stays
loop-VARIANT and serialized — while-loop LICM cannot hoist it.

Self-check: the e2e scan number is cross-validated against a plain
dispatch-loop timing of the same program (bench.py methodology); the
two must agree within ~20% or the tool prints a loud warning.

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


def scan_time(fn, args, iters=30):
    """Time fn(*args) run `iters` times inside ONE jitted scan.

    The scan carry (prev output, reduced to a scalar, times zero) is
    ADDED to the first float leaf of args each iteration: numerically a
    no-op, but a true data dependency, so iterations serialize and
    neither CSE nor while-loop LICM can collapse them."""

    def body(carry, _):
        done = [False]

        def tweak(x):
            if (not done[0] and hasattr(x, "dtype")
                    and jnp.issubdtype(x.dtype, jnp.floating)):
                done[0] = True
                return x + carry.astype(x.dtype)
            return x

        a = jax.tree_util.tree_map(tweak, list(args))
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        dep = leaf.ravel()[0].astype(jnp.float32) * 0.0
        return dep, None

    @jax.jit
    def run():
        dep, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return dep

    np.asarray(run())  # compile+run once
    t0 = time.perf_counter()
    np.asarray(run())
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


def dispatch_time(fn, args, iters=30):
    """bench.py-style dispatch loop over jit(fn): N dispatches, one
    final sync (the cross-check for scan_time)."""
    jfn = jax.jit(fn)
    out = jfn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters * 1e3


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
    e2e = lambda v, a, b, c, p: predict(
        spec, net.apply(v, a, b, c, sparse_plan=p), {"anchors": anchors_b})
    ms = scan_time(e2e, (variables, vx, npts, crd, plan), it)
    ms_disp = dispatch_time(e2e, (variables, vx, npts, crd, plan), it)
    agree = abs(ms - ms_disp) / max(ms, ms_disp)
    print(f"B={B} e2e(scan): {ms:.2f} ms ({B / ms * 1e3:.1f} fps)   "
          f"e2e(dispatch): {ms_disp:.2f} ms  [{agree * 100:.0f}% apart]")
    if agree > 0.2:
        print("WARNING: scan vs dispatch disagree >20% — treat the "
              "per-phase numbers below with suspicion")

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

    PEAK_TFS = 198.8  # v5e bf16 MXU peak (1 chip)

    def mfu_line(ms, slots_np, hit_np, cin, cout, kx):
        """FLOPs accounting for one banded conv: USEFUL (gathered true
        pairs x Cin x Cout x 2) vs ISSUED (one-hot gather dots + group
        GEMMs at static capacity) vs the chip peak."""
        v_in_local = int(slots_np.max())  # miss marker == v_in
        pairs = int((slots_np < v_in_local).sum())
        useful = pairs * cin * cout * 2
        m, blk = banded_sparse.M, banded_sparse.BLK
        onehot = int(hit_np.sum()) * kx * m * blk * cin * 2
        ggemm = int((hit_np > 0).sum()) * m * kx * cin * cout * 2
        issued = onehot + ggemm
        eff_tfs = issued / (ms * 1e-3) / 1e12
        return (f"useful {useful / 1e9:.2f} GF, issued "
                f"{issued / 1e9:.2f} GF ({100 * useful / issued:.0f}% "
                f"useful), {eff_tfs:.1f} TF/s issued = "
                f"{100 * eff_tfs / PEAK_TFS:.1f}% MXU peak")

    x = vfeat
    mid_sum = 0.0
    groups = sm._group_topology(sm.SpMiddleFHD.topology)
    for i, sc in enumerate(scales):
        if sc.get("dense"):
            print(f"  scale{i}+: dense tail (masked conv3d, no plans)")
            break
        v_in = sc["in_cap"]
        cin = x.shape[-1]
        if sc["subm_kernels"]:
            kern = sc["subm_kernels"][0]
            pl_ = banded_sparse.plan_from_host(
                plan[f"plan_subm{i}"], plan[f"plan_bsub{i}_bidx"],
                plan[f"plan_bsub{i}_hit"], plan[f"plan_bsub{i}_cor"],
                plan[f"plan_bsub{i}_cor_count"],
                v_in=v_in, kx=banded_sparse.group_size(kern))
            cout = next(op[1] for op in groups[i] if op[0] == "subm")
            w = jnp.zeros((27, cin, cout), jnp.bfloat16)
            ms_c = scan_time(
                lambda f, w, pl_=pl_: banded_sparse.banded_conv(f, pl_, w),
                (x, w), it)
            n_subm = sum(1 for op in groups[i] if op[0] == "subm")
            print(f"  scale{i} subm conv ({v_in}x{cin}->{cout}): "
                  f"{ms_c:.3f} ms x{n_subm}  "
                  + mfu_line(ms_c, plan_np[f"plan_subm{i}"],
                             plan_np[f"plan_bsub{i}_hit"], cin, cout,
                             banded_sparse.group_size(kern)))
            mid_sum += ms_c * n_subm
            x = jnp.zeros((B, v_in, cout), jnp.bfloat16)
        if sc["down"] is not None:
            kernel, stride, padding = sc["down"]
            k = int(np.prod(kernel))
            vout = sc["out_cap"]
            cin2 = x.shape[-1]
            pl_ = banded_sparse.plan_from_host(
                plan[f"plan_conv{i}"], plan[f"plan_bconv{i}_bidx"],
                plan[f"plan_bconv{i}_hit"], plan[f"plan_bconv{i}_cor"],
                plan[f"plan_bconv{i}_cor_count"], v_in=v_in,
                kx=banded_sparse.group_size(kernel), vout=vout)
            cout = next(op[1] for op in groups[i] if op[0] == "down")
            w = jnp.zeros((k, cin2, cout), jnp.bfloat16)
            ms_c = scan_time(
                lambda f, w, pl_=pl_: banded_sparse.banded_conv(f, pl_, w),
                (x, w), it)
            print(f"  scale{i} down conv ({v_in}->{vout} x{cin2}->{cout}):"
                  f" {ms_c:.3f} ms  "
                  + mfu_line(ms_c, plan_np[f"plan_conv{i}"],
                             plan_np[f"plan_bconv{i}_hit"], cin2, cout,
                             banded_sparse.group_size(kernel)))
            mid_sum += ms_c
            x = jnp.zeros((B, vout, cout), jnp.bfloat16)
    print(f"per-conv sum: {mid_sum:.2f} ms (middle measured whole: "
          f"{ms_mid:.2f} ms)")


if __name__ == "__main__":
    main()
