#!/usr/bin/env python
"""Microbenchmark the banded sparse-conv kernel layer by layer.

Times, on the real chip:
  * peak dense bf16 matmul (speed-of-light reference)
  * each distinct (V_in, V_out, C_in, C_out) conv shape in SpMiddleFHD,
    with its REAL plan from the host planner over a synthetic KITTI
    scene (so hit/correction statistics are realistic)

Usage: python tools/bench_banded.py [--iters 30]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from second_tpu.data.synthetic import make_kitti_scene
from second_tpu.data.voxelizer import VoxelGenerator
from second_tpu.models import sparse_middle as sm
from second_tpu.ops import banded_sparse, sparse


def scan_time(make_out, feats, iters):
    """Time make_out(feats) run `iters` times inside ONE jitted scan —
    a scalar carry folded into the input serializes iterations and
    defeats CSE; sync via a forced host transfer (block_until_ready is
    unreliable on the tunneled axon backend)."""
    import numpy as _np

    @jax.jit
    def run(f):
        def body(c, _):
            o = make_out(f + c.astype(f.dtype))
            return o.ravel()[0].astype(jnp.float32) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    _np.asarray(run(feats))
    t0 = time.perf_counter()
    _np.asarray(run(feats))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def peak_matmul(iters):
    for n, c in ((4096, jnp.bfloat16),):
        a = (jax.random.normal(jax.random.PRNGKey(0), (n, n))
             / np.sqrt(n)).astype(c)
        ms = scan_time(lambda x, a=a: x @ a, a, iters)
        tf = 2 * n ** 3 / (ms * 1e-3) / 1e12
        print(f"dense {n}x{n} {c.__name__}: {ms:.3f} ms = {tf:.1f} TF/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}, {jax.devices()}")
    peak_matmul(args.iters)

    V = 17000
    gen = VoxelGenerator(
        voxel_size=[0.05, 0.05, 0.1],
        point_cloud_range=[0, -40, -3, 70.4, 40, 1],
        max_num_points=5, max_voxels=V)
    rng = np.random.RandomState(0)
    points, _, _ = make_kitti_scene(rng)
    res = gen.generate_multi_gpu(points, max_voxels=V)
    n = int(res["voxel_num"])
    coords = np.full((V, 3), -1, np.int32)
    coords[:n] = res["coordinates"][:n]
    scales = sm.plan_scales(
        "SpMiddleFHD", [1] + gen.grid_size[::-1].tolist() + [16], V)
    d0, h0, w0 = scales[0]["shape"]
    lin = np.where(
        coords[:, 0] >= 0,
        (coords[:, 0].astype(np.int64) * h0 + coords[:, 1]) * w0
        + coords[:, 2], d0 * h0 * w0)
    order = np.argsort(lin, kind="stable")
    coords = coords[order]

    t0 = time.perf_counter()
    plan = sm.build_host_plan(coords, scales, banded=True)
    print(f"host plan: {(time.perf_counter() - t0) * 1e3:.0f} ms, "
          f"{sum(v.nbytes for v in plan.values()) / 1e6:.1f} MB")

    key = jax.random.PRNGKey(0)
    total_subm = 0.0
    total_down = 0.0
    groups = sm._group_topology(sm.FHD_TOPOLOGY)
    ch = 4  # SimpleVoxel mean features (x, y, z, r)
    for i, sc in enumerate(scales):
        v_in = sc["in_cap"]
        n_subm = sum(1 for op in groups[i] if op[0] == "subm")
        if f"plan_subm{i}" in plan:
            cin = ch
            cout = next(op[1] for op in groups[i] if op[0] == "subm")
            slots = plan[f"plan_subm{i}"].astype(np.int32)
            bp = banded_sparse.plan_from_host(
                jnp.asarray(slots)[None],
                jnp.asarray(plan[f"plan_bsub{i}_bidx"])[None],
                jnp.asarray(plan[f"plan_bsub{i}_hit"])[None],
                jnp.asarray(plan[f"plan_bsub{i}_cor"])[None],
                jnp.asarray(plan[f"plan_bsub{i}_cor_count"])[None],
                v_in=v_in, kx=9)
            feats = jax.random.normal(key, (1, v_in, cin), jnp.bfloat16)
            w = jax.random.normal(key, (27, cin, cout), jnp.bfloat16)
            ms = scan_time(
                lambda ft, w=w, bp=bp: banded_sparse.banded_conv(
                    ft, bp, w), feats, args.iters)
            t = -(-v_in // banded_sparse.M)
            blocks = int(plan[f"plan_bsub{i}_hit"].sum())
            gmm = (blocks * 9 * banded_sparse.M
                   * banded_sparse.BLK * cin * 2)
            cmm = t * 27 * banded_sparse.M * cin * cout * 2
            tf = (gmm + cmm) / (ms * 1e-3) / 1e12
            print(f"scale{i} subm V={v_in} C={cin}->{cout} T={t} "
                  f"blocks={blocks}: {ms:.3f} ms x{n_subm} "
                  f"({tf:.1f} TF/s one-hot+gemm, "
                  f"cor={int(plan[f'plan_bsub{i}_cor_count'][0])})")
            total_subm += ms * n_subm
            ch = cout
        if f"plan_conv{i}" in plan:
            v_out = sc["out_cap"]
            kern = sc["down"][0]
            cin = ch
            cout_d = next(op[1] for op in groups[i] if op[0] == "down")
            k = int(np.prod(kern))
            slots = plan[f"plan_conv{i}"].astype(np.int32)
            bp = banded_sparse.plan_from_host(
                jnp.asarray(slots)[None],
                jnp.asarray(plan[f"plan_bconv{i}_bidx"])[None],
                jnp.asarray(plan[f"plan_bconv{i}_hit"])[None],
                jnp.asarray(plan[f"plan_bconv{i}_cor"])[None],
                jnp.asarray(plan[f"plan_bconv{i}_cor_count"])[None],
                v_in=v_in, kx=banded_sparse.group_size(kern), vout=v_out)
            feats = jax.random.normal(key, (1, v_in, cin), jnp.bfloat16)
            w = jax.random.normal(key, (k, cin, cout_d), jnp.bfloat16)
            ms = scan_time(
                lambda ft, w=w, bp=bp: banded_sparse.banded_conv(
                    ft, bp, w), feats, args.iters)
            print(f"scale{i} down V={v_in}->{v_out} C={cin}->{cout_d} "
                  f"K={k}: {ms:.3f} ms "
                  f"(cor={int(plan[f'plan_bconv{i}_cor_count'][0])})")
            total_down += ms
            ch = cout_d
    print(f"TOTAL subm {total_subm:.2f} ms + down {total_down:.2f} ms "
          f"= {total_subm + total_down:.2f} ms")


if __name__ == "__main__":
    main()
