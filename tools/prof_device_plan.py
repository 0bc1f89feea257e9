#!/usr/bin/env python
"""Phase profile of DEVICE-side car.fhd sparse planning.

The fully-device program (tools/bench_fhd_device_e2e.py) measured
187 ms vs ~24 ms for the host-planned program — ~160 ms of on-device
planning.  This times each planning piece in-graph (prof_scan's
scan_time: N reps inside one jitted lax.scan, carry-serialized) to
find where it goes:

  * device voxelize (sort-based grouping) + grid sort
  * per-scale lookup_many (index-grid build + neighbor gathers)
  * per-stage downsample_active_set (candidate sort + dedup)
  * per-rulebook build_banded_plan (reductions + cor nonzero)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/prof_device_plan.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from second_tpu.builders import build_network
from second_tpu.data.synthetic import make_kitti_scene
from second_tpu.models import sparse_middle as sm
from second_tpu.ops import banded_sparse, sparse
from second_tpu.utils.config_tool import read_config

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from prof_scan import scan_time  # noqa: E402

V = 17000
IT = 20


def main():
    cfg = read_config("/root/reference/second/configs/car.fhd.config")
    parts = build_network(cfg.model.second, compute_dtype="bfloat16",
                          use_banded=True)
    gen = parts["voxel_generator"]
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

    feats = jnp.zeros((1, V, 16), jnp.bfloat16)
    crd = jnp.asarray(coords1[None])

    total = 0.0
    grid = sparse.from_sorted_voxel_coords(feats, crd, scales[0]["shape"])
    groups = sm._group_topology(sm.SpMiddleFHD.topology)
    for i, sc in enumerate(scales):
        if sc.get("dense"):
            break
        kernel = sc["subm_kernels"][0] if sc["subm_kernels"] else None
        down_op = groups[i][-1] if groups[i][-1][0] == "down" else None

        # 1. downsample_active_set
        out_grid = None
        if down_op is not None:
            _, _, kd, sd, pd = down_op
            kd, sd, pd = sm._t3(kd), sm._t3(sd), sm._t3(pd)

            def dsa(lin_in, g=grid, kd=kd, sd=sd, pd=pd, cap=sc["out_cap"]):
                gg = g._replace(lin=lin_in)
                og, cnt = sparse.downsample_active_set(
                    gg, kd, sd, pd, out_capacity=cap, return_count=True)
                return og.lin
            ms = scan_time(dsa, (grid.lin,), IT)
            print(f"scale{i} downsample_active_set: {ms:.2f} ms")
            total += ms
            out_grid = sparse.downsample_active_set(
                grid, kd, sd, pd, out_capacity=sc["out_cap"])

        # 2. lookup_many (subm + down queries, one index grid)
        def lk(lin_in, g=grid, kernel=kernel, down_op=down_op,
               og=out_grid):
            gg = g._replace(lin=lin_in)
            queries = []
            if kernel is not None:
                qlin, qok, _ = sparse.subm_queries(gg, kernel)
                queries.append((qlin, qok))
            if down_op is not None:
                _, _, kd, sd, pd = down_op
                dlin, dok, _ = sparse.sparse_conv_queries(
                    gg, og, sm._t3(kd), sm._t3(sd), sm._t3(pd))
                queries.append((dlin, dok))
            outs = sparse.lookup_many(gg.lin, queries, gg.sentinel)
            return [o[0] for o in outs]
        ms = scan_time(lk, (grid.lin,), IT)
        print(f"scale{i} lookup_many: {ms:.2f} ms")
        total += ms

        # materialize rulebooks for the banded-plan timing
        queries = []
        if kernel is not None:
            qlin, qok, _ = sparse.subm_queries(grid, kernel)
            queries.append((qlin, qok))
        if down_op is not None:
            _, _, kd, sd, pd = down_op
            dlin, dok, _ = sparse.sparse_conv_queries(
                grid, out_grid, sm._t3(kd), sm._t3(sd), sm._t3(pd))
            queries.append((dlin, dok))
        results = sparse.lookup_many(grid.lin, queries, grid.sentinel)

        # 3. build_banded_plan per rulebook
        b, v = grid.lin.shape
        qi = 0
        if kernel is not None:
            slots, found = results[qi]
            qi += 1
            k = int(np.prod(kernel))
            slots = slots.reshape(b, v, k)
            found = found.reshape(b, v, k)

            def bbp(s, f, v_in=v, kx=banded_sparse.group_size(kernel)):
                pl = banded_sparse.build_banded_plan(
                    s, f, v_in=v_in, kx=kx, cor_capacity=4096)
                return pl.slots
            ms = scan_time(bbp, (slots, found), IT)
            nsub = sum(1 for op in groups[i] if op[0] == "subm")
            print(f"scale{i} build_banded_plan(subm): {ms:.2f} ms "
                  f"(shared by {nsub} convs)")
            total += ms
        if down_op is not None:
            slots, found = results[qi]
            _, _, kd, _, _ = down_op
            kd3 = sm._t3(kd)
            k = int(np.prod(kd3))
            vout = out_grid.lin.shape[-1]
            slots = slots.reshape(b, vout, k)
            found = found.reshape(b, vout, k)

            def bbp2(s, f, v_in=v, kx=banded_sparse.group_size(kd3)):
                pl = banded_sparse.build_banded_plan(
                    s, f, v_in=v_in, kx=kx, cor_capacity=4096)
                return pl.slots
            ms = scan_time(bbp2, (slots, found), IT)
            print(f"scale{i} build_banded_plan(down): {ms:.2f} ms")
            total += ms

        if out_grid is not None:
            grid = out_grid

    print(f"planning total: {total:.2f} ms")


if __name__ == "__main__":
    main()
