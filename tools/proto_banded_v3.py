#!/usr/bin/env python
"""Prototype: banded conv v3 — kernel reads the RAW slot rulebook.

v2 ships a pre-transposed rel array [T, G, KX_PAD, M] (lanes = output
rows) built by the host/device planner; the transpose is the expensive
part of planning (~18 ms/rulebook on device) and rel doubles the plan
payload.  v3 feeds the kernel the rulebook itself ([Vout, K], rows =
output rows, lanes = kernel offsets) plus tiny per-(tile, group)
base/bidx/hit arrays, and computes rel in-kernel:

    s_col  = slots[:, col]            # [M, 1] lane slice
    ohm    = (s_col - base - j*BLK == lane_iota)   # [M, BLK]
    gather = ohm @ window_j           # MXU

Misses are encoded as v_in exactly, which one-hot-matches the first
zero padding row of the table and contributes nothing — no correction
entries needed for misses (only true out-of-window entries).

This script A/Bs v2 vs v3 on real car.fhd rulebooks on the chip.
"""

import argparse
import functools
import time

import numpy as np

M = 128
BLK = 256
WIN_BLOCKS = 4


def make_v3_kernel(kx, g, c, cout, out_dtype):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(*refs):
        bidx_ref, base_ref, hit_ref, s_ref, w_ref = refs[:5]
        win_refs = refs[5:5 + g * WIN_BLOCKS]
        out_ref, acc_ref = refs[5 + g * WIN_BLOCKS:]
        t = pl.program_id(0)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        iota = jax.lax.broadcasted_iota(jnp.int32, (M, BLK), 1)
        dn = (((1,), (0,)), ((), ()))

        for gi in range(g):
            wins4 = win_refs[gi * WIN_BLOCKS:(gi + 1) * WIN_BLOCKS]

            def contrib(nblk, gi=gi, wins4=wins4):
                base = base_ref[t, gi]
                parts = []
                for x in range(kx):
                    col = gi * kx + x
                    rel = s_ref[0, :, col:col + 1] - base   # [M, 1]
                    gx = None
                    for j in range(nblk):
                        wj = wins4[j][:]
                        ohm = (rel - j * BLK == iota).astype(wj.dtype)
                        d = jax.lax.dot_general(
                            ohm, wj, dn,
                            preferred_element_type=jnp.float32)
                        gx = d if gx is None else gx + d
                    parts.append(gx.astype(wins4[0].dtype))
                g3 = jnp.concatenate(parts, axis=1)
                acc_ref[:] += jax.lax.dot(
                    g3, w_ref[gi], preferred_element_type=jnp.float32)

            @pl.when(hit_ref[t, gi] == 1)
            def _(contrib=contrib):
                contrib(2)

            @pl.when(hit_ref[t, gi] == 2)
            def _(contrib=contrib):
                contrib(WIN_BLOCKS)

        out_ref[:] = acc_ref[:].astype(out_dtype)

    return kernel


@functools.partial(
    __import__("jax").jit,
    static_argnames=("kx", "g", "interpret", "out_dtype"))
def banded_call_v3(table, slots, bidx, base, hit, wg, kx, g,
                   out_dtype, interpret=False):
    """table [B*Vp, C], slots [BT, M, K] int32 (miss == v_in),
    bidx/base/hit [BT, G]."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, c = table.shape
    cout = wg.shape[-1]
    bt, _, k = slots.shape

    def win_spec(gi, j):
        return pl.BlockSpec(
            (BLK, c),
            lambda ti, bi, ba, hi, gi=gi, j=j: (bi[ti, gi] + j, 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,      # bidx, base, hit
        grid=(bt,),
        in_specs=[
            pl.BlockSpec((1, M, k),
                         lambda ti, bi, ba, hi: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, kx * c, cout),
                         lambda ti, bi, ba, hi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [win_spec(gi, j) for gi in range(g)
             for j in range(WIN_BLOCKS)],
        out_specs=pl.BlockSpec((M, cout),
                               lambda ti, bi, ba, hi: (ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((M, cout), __import__("jax").numpy.float32)],
    )
    return pl.pallas_call(
        make_v3_kernel(kx, g, c, cout, out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bt * M, cout), out_dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(bidx, base, hit, slots, wg, *([table] * (g * WIN_BLOCKS)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtype", default="bfloat16")
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
    coords1 = coords1[np.argsort(lin, kind="stable")]

    # representative rulebook: scale1 subm (V=55296, C=32)
    kernel = (3, 3, 3)
    pad = np.array([1, 1, 1])
    offs0 = _kernel_offsets(kernel) - pad
    slots0 = native_plan.subm_plan(coords1, scales[0]["shape"], offs0)
    out_coords, conv_slots, _ = native_plan.down_plan(
        coords1, scales[0]["shape"], kernel, (2, 2, 2), (1, 1, 1),
        _kernel_offsets(kernel), scales[0]["out_cap"])
    slots1 = native_plan.subm_plan(
        out_coords, scales[1]["shape"], offs0)

    cases = [
        ("scale0 subm C=16", slots0, V, 16, 16),
        ("scale1 subm C=32", slots1, scales[0]["out_cap"], 32, 32),
        ("scale0 down 16->32", conv_slots, V, 16, 32),
    ]
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    for name, slots, v_in, c, cout in cases:
        vout, k = slots.shape
        kx = 3
        g = k // kx
        t = -(-vout // M)
        vp = bs.table_pad(v_in)

        # v2 plan (host C++)
        ba = bs.host_banded_arrays(slots, v_in=v_in, kx=kx)
        plan = bs.plan_from_host(
            jnp.asarray(ba["rel"][None]), jnp.asarray(ba["bidx"][None]),
            jnp.asarray(ba["hit"][None]), jnp.asarray(ba["cor"][None]),
            jnp.asarray(ba["cor_count"][None]), v_in=v_in, kx=kx,
            vout=vout)

        # v3 arrays: slots padded to [T*M, K], miss -> v_in exactly
        s3 = np.full((t * M, k), v_in, np.int32)
        sl = slots.astype(np.int64)
        sl[sl >= v_in] = v_in
        s3[:vout] = sl
        base_local = ba["bidx"] * BLK          # [T, G] local row base
        rngw = np.random.RandomState(1)
        feats = rngw.randn(1, v_in, c).astype(np.float32) * 0.1
        w = rngw.randn(k, c, cout).astype(np.float32) * 0.1

        table = np.zeros((vp, c), np.float32)
        table[:v_in] = feats[0]
        tj = jnp.asarray(table, dtype)
        wg = jnp.asarray(w.reshape(g, kx * c, cout), dtype)
        sj = jnp.asarray(s3.reshape(t, M, k))
        bj = jnp.asarray(ba["bidx"])
        basej = jnp.asarray(base_local)
        hj = jnp.asarray(ba["hit"])

        out3 = banded_call_v3(
            tj, sj, bj, basej, hj, wg, kx=kx, g=g,
            out_dtype=dtype)
        out3 = np.asarray(out3[:vout]).astype(np.float32)

        # v2 via public API (includes corrections)
        featsj = jnp.asarray(feats, dtype)
        wj3 = jnp.asarray(w, dtype)
        out2 = bs.banded_conv(featsj, plan, wj3)
        out2 = np.asarray(out2[0]).astype(np.float32)

        # correction contribution only in v2; compare on rows w/o cor
        cor_rows = set(ba["cor"][0][ba["cor"][0] < vout].tolist())
        mask = np.ones(vout, bool)
        if cor_rows:
            mask[list(cor_rows)] = False
        err = np.abs(out3[mask] - out2[mask]).max()
        print(f"{name}: vout={vout} cor={int(ba['cor_count'][0])} "
              f"max|v3-v2|={err:.5f} (non-correction rows)")

        def timeit(fn):
            r = fn()
            np.asarray(r).ravel()[:1]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = fn()
            np.asarray(r).ravel()[:1]
            return (time.perf_counter() - t0) / args.iters

        if jax.default_backend() == "tpu":
            t2 = timeit(lambda: bs._banded_call_fused(
                tj, plan.bidx, plan.hit, plan.rel, wg, kx=kx, g=g,
                t=t, out_dtype=dtype))
            t3 = timeit(lambda: banded_call_v3(
                tj, sj, bj, basej, hj, wg, kx=kx, g=g,
                out_dtype=dtype))
            print(f"  v2 {t2*1e3:.3f} ms   v3 {t3*1e3:.3f} ms")


if __name__ == "__main__":
    main()
