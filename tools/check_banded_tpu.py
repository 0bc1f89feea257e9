#!/usr/bin/env python
"""On-chip banded-kernel parity gate.

The pytest suite runs on a CPU mesh, where banded_conv executes the
Pallas kernel in interpret mode — same kernel code, but not the Mosaic
compilation. This tool runs the REAL compiled kernel on the TPU and
checks forward + both gradients against the XLA row-gather oracle
(ops.sparse semantics via the interpret path) on a KITTI-stats scene at
car.fhd shapes. Run it whenever the kernel changes; exits 1 on any
mismatch.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/check_banded_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    if jax.default_backend() == "cpu":
        print("no TPU — nothing to gate (suite covers interpret mode)")
        return 0
    from second_tpu.data.synthetic import make_kitti_scene
    from second_tpu.data.voxelizer import VoxelGenerator
    from second_tpu.models import sparse_middle as sm
    from second_tpu.ops import banded_sparse

    V = 9000  # enough tiles for multi-block windows + corrections
    gen = VoxelGenerator(
        voxel_size=[0.05, 0.05, 0.1],
        point_cloud_range=[0, -40, -3, 70.4, 40, 1],
        max_num_points=5, max_voxels=V)
    points, _, _ = make_kitti_scene(np.random.RandomState(0))
    res = gen.generate_multi_gpu(points, max_voxels=V)
    coords = np.full((V, 3), -1, np.int32)
    n = int(res["voxel_num"])
    coords[:n] = res["coordinates"][:n]
    scales = sm.plan_scales(
        "SpMiddleFHD", [1] + gen.grid_size[::-1].tolist() + [16], V)
    d0, h0, w0 = scales[0]["shape"]
    lin = np.where(coords[:, 0] >= 0,
                   (coords[:, 0].astype(np.int64) * h0 + coords[:, 1])
                   * w0 + coords[:, 2], d0 * h0 * w0)
    coords = coords[np.argsort(lin, kind="stable")]
    plan_np = sm.build_host_plan(coords, scales, banded=True)

    rng = np.random.RandomState(1)
    c, cout = 32, 32
    feats = jnp.asarray(rng.randn(1, V, c), jnp.float32)
    w = jnp.asarray(rng.randn(27, c, cout) * 0.1, jnp.float32)
    bp = banded_sparse.plan_from_host(
        jnp.asarray(plan_np["plan_subm0"].astype(np.int32))[None],
        jnp.asarray(plan_np["plan_bsub0_bidx"])[None],
        jnp.asarray(plan_np["plan_bsub0_hit"])[None],
        jnp.asarray(plan_np["plan_bsub0_cor"])[None],
        jnp.asarray(plan_np["plan_bsub0_cor_count"])[None],
        v_in=V, kx=banded_sparse.group_size((3, 3, 3)))

    def loss(f, w, interp):
        return (banded_sparse.banded_conv(f, bp, w, interpret=interp)
                ** 2).sum()

    ok = True
    for name, fn in (
            ("forward", lambda i: banded_sparse.banded_conv(
                feats, bp, w, interpret=i)),
            ("dfeat", lambda i: jax.grad(
                lambda f: loss(f, w, i))(feats)),
            ("dw", lambda i: jax.grad(
                lambda ww: loss(feats, ww, i))(w))):
        a = np.asarray(jax.jit(lambda: fn(False))())
        b = np.asarray(fn(True))
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
        line = f"{name}: max rel diff {rel:.2e}"
        if rel > 1e-4:
            ok = False
            line += "  MISMATCH"
        print(line)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
