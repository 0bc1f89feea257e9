#!/usr/bin/env python
"""A/B the banded kernel's output-tile size M on real fhd rulebooks.

M=128 is one MXU pass per one-hot dot; larger M halves the number of
grid steps (and so per-(tile, group, block) fixed costs) at the price
of wider windows per tile (more blocks hit).  This measures forward
time per scale for M in {128, 256, 512} on the same synthetic-KITTI
active sets bench.py uses, plus correctness vs M=128.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_tile_m.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from second_tpu.data.synthetic import make_kitti_scene
from second_tpu.models import sparse_middle as sm
from second_tpu.ops import banded_sparse
from second_tpu.utils.config_tool import read_config
from second_tpu.builders import build_network

ITERS = 30


def scan_time(fn, args, iters=ITERS):
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
        return leaf.ravel()[0].astype(jnp.float32) * 0.0, None

    @jax.jit
    def run():
        dep, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return dep

    np.asarray(run())
    t0 = time.perf_counter()
    np.asarray(run())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = read_config("/root/reference/second/configs/car.fhd.config")
    parts = build_network(cfg.model.second, compute_dtype="bfloat16",
                          use_banded=True)
    gen = parts["voxel_generator"]
    V = 17000
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
    plan_np = sm.build_host_plan(coords, scales)  # rulebooks only

    key = jax.random.PRNGKey(0)
    cases = [  # (name, slots_key, v_in, cin, cout, kernel)
        ("s1 subm 32->32", "plan_subm1", scales[1]["in_cap"], 32, 32,
         (3, 3, 3)),
        ("s2 subm 64->64", "plan_subm2", scales[2]["in_cap"], 64, 64,
         (3, 3, 3)),
        ("s2 down 64->64", "plan_conv2", scales[2]["in_cap"], 64, 64,
         (3, 3, 3)),
    ]
    base = {}
    for m_tile in (128, 256, 512):
        banded_sparse.M = m_tile
        print(f"== M={m_tile}")
        for name, skey, v_in, cin, cout, kern in cases:
            slots = jnp.asarray(plan_np[skey].astype(np.int32))[None]
            kx = banded_sparse.group_size(kern)
            plan = banded_sparse.build_banded_plan(
                slots, None, v_in=v_in, kx=kx)
            feats = jax.random.normal(key, (1, v_in, cin), jnp.bfloat16)
            w = jax.random.normal(key, (27, cin, cout), jnp.bfloat16)
            out = banded_sparse.banded_conv(feats, plan, w)
            if m_tile == 128:
                base[name] = np.asarray(out, np.float32)
                err = 0.0
            else:
                o = np.asarray(out, np.float32)[:, :base[name].shape[1]]
                err = float(np.max(np.abs(o - base[name][:, :o.shape[1]])))
            ms = scan_time(
                lambda f, w_: banded_sparse.banded_conv(f, plan, w_),
                (feats, w))
            hits = float(np.asarray(plan.hit).astype(np.float32).mean())
            print(f"  {name}: {ms:.3f} ms  avg-hits {hits:.2f}  "
                  f"max-err {err:.1e}")
    banded_sparse.M = 128


if __name__ == "__main__":
    main()
