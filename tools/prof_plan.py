#!/usr/bin/env python
"""Break down device-side sparse planning cost on the chip.

tools/prof_scan.py measured the full device-planned middle at +193 ms
over the host-planned one.  This times each planning component —
dense-grid lookup, downsample active set, banded plan build — per
scale, with in-graph scan repetition (one dispatch, one sync).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/prof_plan.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from second_tpu.data.synthetic import make_kitti_scene
from second_tpu.data.voxelizer import VoxelGenerator
from second_tpu.models import sparse_middle as sm
from second_tpu.ops import banded_sparse, sparse


def scan_time(fn, args, iters=20):
    def body(carry, i):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return carry + leaf.ravel()[0].astype(jnp.float32) * 0, None

    @jax.jit
    def run():
        dep, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return dep

    np.asarray(run())
    t0 = time.perf_counter()
    np.asarray(run())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
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

    feats = jnp.zeros((1, V, 16), jnp.bfloat16)
    crd = jnp.asarray(coords[None])
    grid = sparse.from_voxel_coords(feats, crd, scales[0]["shape"])
    grid = jax.tree_util.tree_map(
        lambda x: x if isinstance(x, jnp.ndarray) else x, grid)

    ms = scan_time(
        lambda f, c: sparse.from_voxel_coords(f, c, scales[0]["shape"]),
        (feats, crd))
    print(f"from_voxel_coords (argsort {V}): {ms:.2f} ms")

    cur = grid
    total = 0.0
    for i, sc in enumerate(scales):
        b, v = cur.lin.shape
        cin = cur.features.shape[-1]
        if sc["subm_kernels"]:
            kernel = sc["subm_kernels"][0]

            def subm_lookup(lin, coords_, valid):
                g = sparse.SparseGrid(
                    jnp.zeros((b, v, 1), jnp.bfloat16), lin, coords_,
                    sc["shape"])
                qlin, qok, k = sparse.subm_queries(g, kernel)
                return sparse.lookup_many(lin, [(qlin, qok)], g.sentinel)

            ms = scan_time(subm_lookup, (cur.lin, cur.coords, None))
            print(f"scale{i} subm lookup (V={v}, cells="
                  f"{np.prod(sc['shape'])/1e6:.1f}M): {ms:.2f} ms")
            total += ms

            slots, found = sparse.build_subm_rulebook(cur, kernel)
            ms = scan_time(
                lambda s, f: banded_sparse.build_banded_plan(
                    s, f, v_in=v, kx=kernel[2]),
                (slots, found))
            print(f"scale{i} banded plan build (subm): {ms:.2f} ms")
            total += ms
        if sc["down"] is not None:
            kernel, stride, pad = sc["down"]

            def down(lin, coords_):
                g = sparse.SparseGrid(
                    jnp.zeros((b, v, 1), jnp.bfloat16), lin, coords_,
                    sc["shape"])
                og, cnt = sparse.downsample_active_set(
                    g, kernel, stride, pad, out_capacity=sc["out_cap"],
                    return_count=True)
                return og.lin

            ms = scan_time(down, (cur.lin, cur.coords))
            print(f"scale{i} downsample_active_set (V={v}->"
                  f"{sc['out_cap']}): {ms:.2f} ms")
            total += ms

            out_grid, _ = sparse.downsample_active_set(
                cur, kernel, stride, pad, out_capacity=sc["out_cap"],
                return_count=True)

            def down_lookup(lin, olin, ocoords):
                g = sparse.SparseGrid(
                    jnp.zeros((b, v, 1), jnp.bfloat16), lin, cur.coords,
                    sc["shape"])
                og = sparse.SparseGrid(
                    jnp.zeros((b, olin.shape[1], 1), jnp.bfloat16),
                    olin, ocoords, out_grid.shape)
                qlin, qok, k = sparse.sparse_conv_queries(
                    g, og, kernel, stride, pad)
                return sparse.lookup_many(lin, [(qlin, qok)], g.sentinel)

            ms = scan_time(
                down_lookup, (cur.lin, out_grid.lin, out_grid.coords))
            print(f"scale{i} down lookup: {ms:.2f} ms")
            total += ms

            qlin, qok, k = sparse.sparse_conv_queries(
                cur, out_grid, kernel, stride, pad)
            (dslots, dfound), = sparse.lookup_many(
                cur.lin, [(qlin, qok)], cur.sentinel)
            vout = out_grid.lin.shape[1]
            ms = scan_time(
                lambda s, f: banded_sparse.build_banded_plan(
                    s.reshape(b, vout, k), f.reshape(b, vout, k),
                    v_in=v, kx=kernel[2]),
                (dslots, dfound))
            print(f"scale{i} banded plan build (down): {ms:.2f} ms")
            total += ms

            cur = sparse.SparseGrid(
                jnp.zeros((b, vout, 64), jnp.bfloat16), out_grid.lin,
                out_grid.coords, out_grid.shape)
    print(f"TOTAL planning: {total:.2f} ms")


if __name__ == "__main__":
    main()
