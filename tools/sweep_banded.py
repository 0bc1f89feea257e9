#!/usr/bin/env python
"""Sweep banded-kernel shape parameters on a scale2-like subm conv.

Probes the per-grid-step overhead hypothesis: time should scale with
T (= V/M) times a fixed cost set by the pipeline buffer count
(g*WIN_BLOCKS window refs), not with FLOPs.

Usage: python tools/sweep_banded.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from second_tpu.data.synthetic import make_kitti_scene
from second_tpu.data.voxelizer import VoxelGenerator
from second_tpu.models import sparse_middle as sm
from second_tpu.ops import banded_sparse, sparse


def timeit(fn, iters=20):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def peak_matmul():
    n = 4096
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)

    @jax.jit
    def chain(a):
        x = a
        for _ in range(8):
            x = jax.lax.dot(x, a, preferred_element_type=jnp.bfloat16)
        return x

    ms = timeit(lambda: chain(a), 10)
    tf = 8 * 2 * n ** 3 / (ms * 1e-3) / 1e12
    print(f"peak bf16 matmul (chained): {tf:.1f} TF/s")


def main():
    print(f"backend: {jax.default_backend()}")
    peak_matmul()

    # Build a realistic scale-2 rulebook (V=58112, C=64) once.
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
    coords = coords[np.argsort(lin, kind="stable")]
    plan = sm.build_host_plan(coords, scales)  # rulebooks only
    slots2 = plan["plan_subm2"].astype(np.int32)   # [58112, 27]
    v_in = scales[2]["in_cap"]
    print(f"scale2: V={v_in} slots {slots2.shape}")

    key = jax.random.PRNGKey(1)
    cin = cout = 64
    feats = jax.random.normal(key, (1, v_in, cin), jnp.bfloat16)
    w = jax.random.normal(key, (27, cin, cout), jnp.bfloat16)

    base = dict(M=banded_sparse.M, BLK=banded_sparse.BLK,
                WIN=banded_sparse.WIN_BLOCKS)
    sweeps = [
        dict(),                          # baseline 128/128/6
        dict(WIN=4),
        dict(WIN=2),
        dict(M=256, WIN=4),
        dict(M=256, WIN=6),
        dict(M=512, WIN=6),
        dict(M=512, WIN=8),
        dict(M=1024, WIN=10),
        dict(M=256, BLK=256, WIN=3),
        dict(M=512, BLK=256, WIN=4),
        dict(M=512, BLK=512, WIN=3),
    ]
    for s in sweeps:
        m = s.get("M", base["M"])
        blk = s.get("BLK", base["BLK"])
        win = s.get("WIN", base["WIN"])
        banded_sparse.M = m
        banded_sparse.BLK = blk
        banded_sparse.WIN_BLOCKS = win
        try:
            bp = jax.jit(
                lambda s_: banded_sparse.build_banded_plan(
                    s_, None, v_in=v_in, kx=3, cor_capacity=32768)
            )(jnp.asarray(slots2)[None])
            bp = jax.block_until_ready(bp)
            hit = np.asarray(bp.hit)
            corc = int(np.asarray(bp.cor_count)[0])
            f = jax.jit(lambda ft, wt: banded_sparse.banded_conv(
                ft, bp, wt))
            ms = timeit(lambda: f(feats, w))
            t = -(-v_in // m)
            print(f"M={m:5d} BLK={blk:4d} WIN={win:2d}: {ms:7.3f} ms  "
                  f"T={t:4d} ({ms / t * 1e3:6.1f} us/step, "
                  f"hit={hit.mean():.2f}, cor={corc})")
        except Exception as e:
            print(f"M={m} BLK={blk} WIN={win}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}")
        finally:
            banded_sparse.M = base["M"]
            banded_sparse.BLK = base["BLK"]
            banded_sparse.WIN_BLOCKS = base["WIN"]


if __name__ == "__main__":
    main()
