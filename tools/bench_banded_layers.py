#!/usr/bin/env python
"""Per-layer microbenchmark of the banded sparse convs (car.fhd middle).

Times each (scale, conv) banded_conv call in isolation with an IN-JIT
scalar reduction (4-byte D2H), so the tunneled-backend transfer cost
does not pollute layer numbers. Prints measured ms vs the one-hot
gather MAC model (elements * window_MACs + weight GEMM) to show how far
each layer sits from the MXU roofline.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--max_voxels", type=int, default=17000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from second_tpu.builders import build_network
    from second_tpu.data.synthetic import make_kitti_scene
    from second_tpu.models import sparse_middle as sm
    from second_tpu.native import sparse_plan as native_plan
    from second_tpu.ops import banded_sparse as bs
    from second_tpu.ops.sparse import _kernel_offsets
    from second_tpu.utils.config_tool import read_config

    cfg = read_config("/root/reference/second/configs/car.fhd.config")
    parts = build_network(cfg.model.second)
    gen = parts["voxel_generator"]
    V = args.max_voxels
    B = args.batch
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

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

    # channel schedule per scale (FHD topology)
    chans = [(16, [16, 16], 32), (32, [32, 32], 64),
             (64, [64, 64, 64], 64), (64, [64, 64, 64], 64)]

    def bench_conv(label, slots, v_in, kx, cin, cout, vout):
        plan_h = bs.host_banded_arrays(slots, v_in=v_in, kx=kx)
        plan = bs.plan_from_host(
            jnp.asarray(np.broadcast_to(slots[None], (B,) + slots.shape)),
            *(jnp.asarray(np.broadcast_to(plan_h[k][None],
                                          (B,) + plan_h[k].shape))
              for k in ("bidx", "hit", "cor", "cor_count")),
            v_in=v_in, kx=kx, vout=vout)
        k = slots.shape[1]
        feats = jnp.asarray(
            np.random.RandomState(1).randn(B, v_in, cin), dtype)
        w = jnp.asarray(
            np.random.RandomState(2).randn(k, cin, cout) * 0.1, dtype)

        @jax.jit
        def f(feats, w):
            return bs.banded_conv(feats, plan, w).sum()

        out = f(feats, w)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(feats, w)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / args.iters

        # MAC model at current kernel constants
        s = slots.astype(np.int64)
        valid = s < v_in
        nel = int(valid.sum())
        M, BLK, WB = bs.M, bs.BLK, bs.WIN_BLOCKS
        t = -(-vout // M)
        g = k // kx
        # per-(t,g) hit class from the plan
        hit = plan_h["hit"]
        n_narrow = int((hit == 1).sum())
        n_wide = int((hit == 2).sum())
        gather_mac = (n_narrow * 2 + n_wide * WB) * kx * M * BLK * cin
        wgemm_mac = int((hit > 0).sum()) * M * kx * cin * cout
        total = (gather_mac + wgemm_mac) * B
        # v5e bf16 ~ 98.5 TMAC/s
        ideal_ms = total / 98.5e12 * 1e3
        print(f"{label:>14s}: {dt*1e3:7.3f} ms | elems={nel:7d} "
              f"hits n={n_narrow} w={n_wide} | model {total/1e9:6.2f} GMAC "
              f"-> ideal {ideal_ms:6.3f} ms | eff {ideal_ms/dt/1e3*100:5.1f}%")
        return dt

    total = 0.0
    cur = coords
    for i, sc in enumerate(scales):
        shape = sc["shape"]
        cin, subm_outs, down_out = chans[i]
        if sc["subm_kernels"]:
            kernel = sc["subm_kernels"][0]
            pad = np.array([(kernel[0] - 1) // 2, (kernel[1] - 1) // 2,
                            (kernel[2] - 1) // 2])
            offs = _kernel_offsets(kernel) - pad
            slots = native_plan.subm_plan(cur, shape, offs)
            c = cin
            for j, co in enumerate(subm_outs):
                dt = bench_conv(f"s{i} subm{j} {c}->{co}", slots,
                                sc["in_cap"], kernel[2], c, co,
                                slots.shape[0])
                total += dt
                c = co
        else:
            c = cin
        if sc["down"] is not None:
            kernel, stride, padding = sc["down"]
            offs = _kernel_offsets(kernel)
            oc, cs, tot = native_plan.down_plan(
                cur, shape, kernel, stride, padding, offs, sc["out_cap"])
            dt = bench_conv(f"s{i} down {c}->{down_out}", cs,
                            sc["in_cap"], kernel[2], c, down_out,
                            sc["out_cap"])
            total += dt
            cur = oc
    print(f"sum of layers: {total*1e3:.2f} ms (B={B}, {args.dtype})")


if __name__ == "__main__":
    main()
