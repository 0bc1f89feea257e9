"""Banded one-hot gather-GEMM sparse convolution (TPU Pallas kernel).

The TPU executes row-gathers at ~8 cycles/row (a sequential DMA-
descriptor loop), which makes the straightforward gather->GEMM sparse
conv in :mod:`second_tpu.ops.sparse` HBM-descriptor-bound: the car.fhd
middle spends ~60 ms/frame issuing ~16M row gathers.  The MXU, by
contrast, runs dense bf16 matmuls at >100 TF/s.  This module performs
the gather ON the MXU:

  * Voxels are sorted by linearized coordinate (the SparseGrid
    contract), so for each kernel offset the neighbor-slot array is
    monotonic: 128 consecutive outputs read from a narrow WINDOW of the
    feature table (at 128-row blocks the per-(tile, offset-group)
    window needs 1 block ~60%, 2 blocks ~35% on KITTI-scale scenes).
  * Kernel grid: one step per tile of 128 output rows; all offset
    triples (dx = -1/0/+1 share a (dz, dy) and hence a window) are
    unrolled in-kernel.  Per offset-group the plan records how many
    128-row window blocks the tile needs (``hit`` in 0..WIN_BLOCKS)
    and the block index of EACH window block (``bidx [T, G, J]``);
    unused (tile, group, j) entries repeat the previous tile's index
    so the Pallas pipeline skips their DMA entirely.  The gather is
    ``one_hot(slot - block_base) @ block`` MXU matmuls.
  * The kernel reads the RAW slot rulebook ([Vout, K] int32, rows =
    output rows, lanes = kernel offsets — the layout the host planner
    and the XLA path already produce) and rebases it in-kernel; the
    only plan metadata is bidx/hit.  Misses are encoded as ``v_in``
    exactly, which one-hot-matches the table's first zero padding row
    and contributes nothing — no plan transposes, on host or device.
  * The <1% of (tile, triple) pairs whose span exceeds the widest
    window (WIN_BLOCKS*BLK rows; sort-order discontinuities) fall back
    to a capacity-bounded CSR pass: gather the affected (out, in, k)
    entries row-wise, apply per-entry weights, scatter-add.  Overflow
    of the static correction capacity is counted, never silent.

Measured dead ends (round 5, all bit-exact, all SLOWER on the chip —
do not re-try without new evidence; the kernel is bound by one-hot
row streaming plus per-(tile, group, block) fixed cost ~0.8us, and
every trade below pays more than it saves):
  * (tile, group) 2-D grid (slim per-step body, 6 window refs): ~5%
    slower — body size does not matter.
  * merged [kx*M, BLK] one-hot single-dot per block: 2-5% slower —
    dot-launch overhead is negligible, result-slice copies are not.
  * lane packing (p rows per 128-lane super-row, windows over
    super-rows, P-way lane select): 3-6x SLOWER (e2e 33 -> 11 fps)
    despite ~25% fewer window blocks — seg[:, q*c:(q+1)*c] lane
    slices trigger Mosaic lane-shift relayouts per (offset, block);
    this is also what sank the round-4 "v6" kernel.

The banded plan derives from the same slot rulebooks the XLA path
uses.  In production the HOST planner emits the tiny bidx/hit/cor
arrays alongside the rulebooks (host_banded_arrays, C++); the
on-device builder (build_banded_plan) is a handful of reductions over
reshaped views.  The plan depends only on the active set, so it is
built once per scale and shared by every conv on that set (spconv
``indice_key`` semantics, reference
second/pytorch/models/middle.py:146-190).

Training: :func:`banded_conv` is differentiable via ``jax.custom_vjp``.
The input-gradient is itself a banded conv — for submanifold convs
``dfeat[i] = sum_k dout[slots[i, k]] @ W[K-1-k]^T`` (the SAME plan with
kernel-mirrored transposed weights, because the full-cube offset set is
symmetric and subm rulebooks satisfy ``slots[o, k] = i  <=>
slots[i, K-1-k] = o``); strided convs need a host/device-built
TRANSPOSE plan (``transpose_rulebook``) mapping input rows to the
consuming output rows.  The weight-gradient runs on a second Pallas
kernel that re-uses the same window DMAs and accumulates
``gathered^T @ dout`` tiles in VMEM across the sequential grid.  CSR
correction entries contribute to both grads through a per-offset
masked-matmul pass.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


M = 128          # output rows per tile
BLK = 128        # feature-table window block size
# Grid decomposition note: a (tile, group)-grid variant (one offset
# group per step, 6 window refs, VMEM-revisited output) was measured
# ~5% SLOWER than this fused-tile kernel on the chip (round 5) — the
# kernel is bound by one-hot row streaming + window DMA, not by
# per-step body size.  Keep the single fused-tile kernel.
WIN_BLOCKS = 6   # max window = 6 blocks (768 rows, ~p99 of spans);
                 # per-block DMAs are plan-gated, so a tile pays only
                 # for the blocks its spans actually need


class BandedPlan(NamedTuple):
    """Device-side banded gather plan for one rulebook [B, Vout, K].

    ``shape`` is static metadata (registered as pytree aux data below,
    so a plan crosses jit boundaries without the ints turning into
    tracers)."""

    slots: jnp.ndarray     # [B*T, M, K] int32, miss == Vin exactly
    bidx: jnp.ndarray      # [BT, G, J] int32 global window block index
    hit: jnp.ndarray       # [BT, G] int32: number of blocks, 0..J
    cor_out: jnp.ndarray   # [B, R] int32 out row (Vout = pad/dump)
    cor_in: jnp.ndarray    # [B, R] int32 in slot (into padded table)
    cor_k: jnp.ndarray     # [B, R] int32 kernel offset index
    cor_count: jnp.ndarray  # [B] int32 TRUE correction count (overflow obs.)
    shape: tuple           # static: (B, Vout, K, KX, G, T, Vin, Vp)


jax.tree_util.register_pytree_node(
    BandedPlan,
    lambda p: (tuple(p[:-1]), p.shape),
    lambda shape, leaves: BandedPlan(*leaves, shape=shape),
)


def _grouping(K, kx):
    """Offsets are enumerated C-order over (dz, dy, dx) (sparse.py
    _kernel_offsets), so consecutive runs of ``kx`` share a window."""
    assert K % kx == 0, (K, kx)
    return K // kx


def group_size(kernel):
    """Offset-group size for a (kz, ky, kx) kernel: all offsets that
    share dz.  dy/dx steps shift the sorted-row window by only
    ~row_width*density rows (a handful), so one window serves every
    (dy, dx) of a dz — 3x fewer window DMAs and per-block fixed costs
    than (dz, dy) grouping (measured: scale1 subm 4.9 -> 4.0 ms,
    scale2 4.6 -> 3.9 ms on chip).  dz steps shift by a full plane
    (thousands of rows) and must stay separate."""
    return int(kernel[1]) * int(kernel[2])


def table_pad(v):
    """Padded feature-table length: room for the b0+J-1 window block."""
    return (-(-v // BLK) + WIN_BLOCKS - 1) * BLK


def _fill_unused_bidx_np(used, cand):
    """used/cand: [T, G, J].  Unused entries inherit the previous
    tile's value in their (g, j) column (the Pallas pipeline skips the
    DMA when a buffer's block index repeats); leading unused rows take
    the column's row-0 candidate."""
    t = used.shape[0]
    u = used.reshape(t, -1)
    c = cand.reshape(t, -1)
    idx = np.where(u, np.arange(t)[:, None], -1)
    last = np.maximum.accumulate(idx, axis=0)
    rows = np.clip(last, 0, None)
    return np.take_along_axis(c, rows, axis=0).reshape(cand.shape)


def _fill_unused_bidx_jnp(used, cand):
    """jnp twin of :func:`_fill_unused_bidx_np` (columns = (b?, g, j)
    flattened; the scan runs over the tile axis)."""
    t = used.shape[0]
    u = used.reshape(t, -1)
    c = cand.reshape(t, -1)
    idx = jnp.where(u, jnp.arange(t)[:, None], -1)
    last = jax.lax.associative_scan(jnp.maximum, idx, axis=0)
    rows = jnp.clip(last, 0)
    return jnp.take_along_axis(c, rows, axis=0).reshape(cand.shape)


def build_banded_plan(slots, found, v_in, kx, cor_capacity=4096):
    """slots [B, Vout, K] int32 (miss >= v_in), found [B, Vout, K] bool
    or None -> BandedPlan.  kx: kernel x-extent (offset group size).
    All ops are reshapes/reductions (no transposes); jit-traceable;
    runs once per (active set, kernel).
    """
    b, vout, k = slots.shape
    g = _grouping(k, kx)
    t = -(-vout // M)
    vp = table_pad(v_in)
    miss = slots >= v_in
    if found is not None:
        miss = miss | ~found
    s = jnp.where(miss, jnp.int32(v_in), slots.astype(jnp.int32))
    pad_rows = t * M - vout
    if pad_rows:
        s = jnp.concatenate(
            [s, jnp.full((b, pad_rows, k), v_in, jnp.int32)], axis=1)
    s4 = s.reshape(b, t, M, g, kx)
    valid = s4 < v_in
    gmin = jnp.where(valid, s4, jnp.int32(2 ** 30)).min(axis=(2, 4))
    b0 = jnp.clip(gmin // BLK, 0, vp // BLK - WIN_BLOCKS)  # [B, T, G]
    rel = s4 - (b0 * BLK)[:, :, None, :, None]
    in_win = valid & (rel < WIN_BLOCKS * BLK)
    relmax = jnp.where(in_win, rel, -1).max(axis=(2, 4))   # [B, T, G]
    hit = jnp.where(relmax >= 0, relmax // BLK + 1, 0)

    # per-(g, j) window block index; unused entries repeat the previous
    # tile's so the Pallas pipeline skips the DMA
    jarange = jnp.arange(WIN_BLOCKS, dtype=jnp.int32)
    used = hit[..., None] > jarange                         # [B, T, G, J]
    cand = b0[..., None].astype(jnp.int32) + jarange
    bidx = _fill_unused_bidx_jnp(
        used.reshape(b * t, g, WIN_BLOCKS),
        cand.reshape(b * t, g, WIN_BLOCKS)).reshape(
            b, t, g, WIN_BLOCKS)
    # per-batch table offset into the stacked [B*Vp, C] table
    bidx = bidx + (jnp.arange(b, dtype=jnp.int32)[:, None, None, None]
                   * (vp // BLK))

    # CSR corrections: valid slots outside their pair's window
    need = (valid & ~in_win).reshape(b, t * M * g * kx)
    cor_count = need.sum(axis=1).astype(jnp.int32)

    def one(args):
        need_row, s_row = args
        (pos,) = jnp.nonzero(need_row, size=cor_capacity,
                             fill_value=need_row.shape[0])
        # decode flat (t, m, g, kx) -> out row, k
        tm = pos // (g * kx)
        gk = pos % (g * kx)
        out_row = jnp.where(pos < need_row.shape[0], tm, vout)
        kk = gk  # (g, kx) flat == k (C-order grouping)
        in_slot = jnp.where(
            pos < need_row.shape[0],
            s_row[jnp.clip(pos, 0, need_row.shape[0] - 1)], 0)
        return (out_row.astype(jnp.int32), in_slot.astype(jnp.int32),
                kk.astype(jnp.int32))

    cor_out, cor_in, cor_k = jax.lax.map(
        one, (need, s.reshape(b, t * M * g * kx)))

    return BandedPlan(
        slots=s.reshape(b * t, M, k),
        bidx=bidx.reshape(b * t, g, WIN_BLOCKS).astype(jnp.int32),
        hit=hit.reshape(b * t, g).astype(jnp.int32),
        cor_out=cor_out, cor_in=cor_in, cor_k=cor_k,
        cor_count=cor_count,
        shape=(b, vout, k, kx, g, t, v_in, vp),
    )


def _make_fused_kernel(kx, g, c, cout, out_dtype, vp_blocks, t_per_b):
    from jax.experimental import pallas as pl

    def kernel(*refs):
        # bidx/hit are FLAT 1-D scalar-prefetch arrays: SMEM tiles the
        # last two dims to (8, 128) multiples, so a [BT, G, J] layout
        # would allocate BT*16*128 words (>1 MB at fhd tile counts) —
        # flat costs BT*G*J words exactly.
        bidx_ref, hit_ref, s_ref, w_ref = refs[:4]
        win_refs = refs[4:4 + g * WIN_BLOCKS]
        out_ref, acc_ref, gth_ref = refs[4 + g * WIN_BLOCKS:]
        t = pl.program_id(0)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        iota = jax.lax.broadcasted_iota(jnp.int32, (M, BLK), 1)
        dn = (((1,), (0,)), ((), ()))

        for gi in range(g):
            wins = win_refs[gi * WIN_BLOCKS:(gi + 1) * WIN_BLOCKS]

            @pl.when(hit_ref[t * g + gi] > 0)
            def _(gi=gi):
                gth_ref[:] = jnp.zeros_like(gth_ref)

            for j in range(WIN_BLOCKS):
                @pl.when(hit_ref[t * g + gi] > j)
                def _(gi=gi, j=j, wins=wins):
                    # block's OWN base (bidx[t, gi, j] == b0 + j when
                    # used), LOCAL to this example's table rows
                    base = (bidx_ref[(t * g + gi) * WIN_BLOCKS + j]
                            - (t // t_per_b) * vp_blocks) * BLK
                    wj = wins[j][:]
                    # per-offset [M, BLK] one-hot dots; a merged
                    # [kx*M, BLK] single-dot variant measured 2-5%
                    # SLOWER on chip (launch overhead is negligible;
                    # the extra result-slice copies are not)
                    for x in range(kx):
                        col = gi * kx + x
                        rel = s_ref[0, :, col:col + 1] - base   # [M, 1]
                        ohm = (rel == iota).astype(wj.dtype)
                        gth_ref[:, x * c:(x + 1) * c] += jax.lax.dot_general(
                            ohm, wj, dn,
                            preferred_element_type=jnp.float32)

            @pl.when(hit_ref[t * g + gi] > 0)
            def _(gi=gi):
                acc_ref[:] += jax.lax.dot(
                    gth_ref[:].astype(w_ref.dtype), w_ref[gi],
                    preferred_element_type=jnp.float32)

        out_ref[:] = acc_ref[:].astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kx", "g", "vp_blocks", "t_per_b", "interpret",
                     "out_dtype"))
def _banded_call_fused(table, slots, bidx, hit, wg, kx, g, vp_blocks,
                       t_per_b, out_dtype, interpret=False):
    """Fused-tile kernel: grid (B*T,), all offset-triples of a tile in
    ONE grid step.  table [B*Vp, C]; slots [BT, M, K] int32 (miss =
    Vin); bidx [BT, G, J]; hit [BT, G]; wg [G, kx*C, Cout]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, c = table.shape
    cout = wg.shape[-1]
    bt, _, k = slots.shape

    def win_spec(gi, j):
        return pl.BlockSpec(
            (BLK, c),
            lambda ti, bi, hi, gi=gi, j=j: (
                bi[(ti * g + gi) * WIN_BLOCKS + j], 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,      # bidx, hit (flat 1-D: see kernel)
        grid=(bt,),
        in_specs=[
            pl.BlockSpec((1, M, k),
                         lambda ti, bi, hi: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, kx * c, cout),
                         lambda ti, bi, hi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [win_spec(gi, j) for gi in range(g)
             for j in range(WIN_BLOCKS)],
        out_specs=pl.BlockSpec((M, cout),
                               lambda ti, bi, hi: (ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((M, cout), jnp.float32),
                        pltpu.VMEM((M, kx * c), jnp.float32)],
    )
    return pl.pallas_call(
        _make_fused_kernel(kx, g, c, cout, out_dtype, vp_blocks, t_per_b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bt * M, cout), out_dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(bidx.reshape(-1), hit.reshape(-1), slots, wg,
      *([table] * (g * WIN_BLOCKS)))


def _cor_expand(table, cor_in, cor_k, vp, k, c):
    """[B, R, K*C] one-hot-expanded correction rows: entry r's gathered
    feature row placed in the cor_k[r]-th C-block, zeros elsewhere.
    One elementwise expand + ONE big GEMM beats K masked [R, C] matmuls
    (K x fewer MXU issues; measured ~0.05 ms/1k capacity saved)."""
    def one(args):
        tab, ci, ck = args
        rows = tab[jnp.clip(ci, 0, vp - 1)]              # [R, C]
        onehot = (ck[:, None] == jnp.arange(k, dtype=ck.dtype)[None, :])
        return (rows[:, None, :] * onehot[:, :, None].astype(rows.dtype)
                ).reshape(rows.shape[0], k * c)

    return jax.lax.map(one, (table, cor_in, cor_k))


def _cor_contrib(table, plan, weights, vp, k, c, cout, dtype):
    """[B, R, Cout] correction contributions: per-entry feat row times
    W[cor_k], as one [R, K*C] @ [K*C, Cout] GEMM over the one-hot
    expansion."""
    a = _cor_expand(table, plan.cor_in, plan.cor_k, vp, k, c)
    w_flat = weights.astype(dtype).reshape(k * c, cout)

    def one(ab):
        return jax.lax.dot(ab, w_flat, preferred_element_type=jnp.float32)

    return jax.lax.map(one, a)


def _banded_apply(features, plan: BandedPlan, weights, interpret):
    """Forward impl (no VJP): features [B, Vin, C] -> [B, Vout, Cout]."""
    b, vout, k, kx, g, t, v_in, vp = plan.shape
    _, vin_rows, c = features.shape
    cout = weights.shape[-1]
    dtype = features.dtype

    table = jnp.zeros((b, vp, c), dtype).at[:, :vin_rows].set(features)
    wg = weights.astype(dtype).reshape(g, kx * c, cout)
    out = _banded_call_fused(
        table.reshape(b * vp, c), plan.slots, plan.bidx, plan.hit, wg,
        kx=kx, g=g, vp_blocks=vp // BLK, t_per_b=t, out_dtype=dtype,
        interpret=interpret)
    out = out.reshape(b, t * M, cout)[:, :vout]

    # CSR corrections for out-of-window entries
    r = plan.cor_out.shape[1]
    if r:
        contrib = _cor_contrib(table, plan, weights, vp, k, c, cout,
                               dtype)

        def one(args):
            co, cb, o = args
            return o.at[jnp.clip(co, 0, vout - 1)].add(
                jnp.where((co < vout)[:, None], cb, 0.0).astype(dtype),
                mode="drop")

        out = jax.lax.map(one, (plan.cor_out, contrib, out))

    return out


def _make_dw_kernel(kx, g, c, cout, vp_blocks, t_per_b):
    from jax.experimental import pallas as pl

    def kernel(*refs):
        bidx_ref, hit_ref, s_ref, dout_ref = refs[:4]
        win_refs = refs[4:4 + g * WIN_BLOCKS]
        dw_ref = refs[4 + g * WIN_BLOCKS]
        gth_ref = refs[4 + g * WIN_BLOCKS + 1]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)

        iota = jax.lax.broadcasted_iota(jnp.int32, (M, BLK), 1)
        dn = (((1,), (0,)), ((), ()))

        for gi in range(g):
            wins = win_refs[gi * WIN_BLOCKS:(gi + 1) * WIN_BLOCKS]

            @pl.when(hit_ref[t * g + gi] > 0)
            def _(gi=gi):
                gth_ref[:] = jnp.zeros_like(gth_ref)

            for j in range(WIN_BLOCKS):
                @pl.when(hit_ref[t * g + gi] > j)
                def _(gi=gi, j=j, wins=wins):
                    base = (bidx_ref[(t * g + gi) * WIN_BLOCKS + j]
                            - (t // t_per_b) * vp_blocks) * BLK
                    wj = wins[j][:]
                    for x in range(kx):
                        col = gi * kx + x
                        rel = s_ref[0, :, col:col + 1] - base
                        ohm = (rel == iota).astype(wj.dtype)
                        gth_ref[:, x * c:(x + 1) * c] += (
                            jax.lax.dot_general(
                                ohm, wj, dn,
                                preferred_element_type=jnp.float32))

            @pl.when(hit_ref[t * g + gi] > 0)
            def _(gi=gi):
                # dW_g += gathered^T @ dout_tile
                dw_ref[gi] += jax.lax.dot_general(
                    gth_ref[:].astype(dout_ref.dtype), dout_ref[:],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kx", "g", "cout", "vp_blocks", "t_per_b",
                     "interpret"))
def _banded_dw_call(table, dout_rows, slots, bidx, hit, kx, g, cout,
                    vp_blocks, t_per_b, interpret=False):
    """table [B*Vp, C], dout_rows [B*T*M, Cout] -> [G, kx*C, Cout] f32.

    Same grid/window structure as the forward call; the [G, kx*C, Cout]
    accumulator lives in one VMEM-resident output block across the
    sequential grid (index_map constant)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, c = table.shape
    bt, _, k = slots.shape

    def win_spec(gi, j):
        return pl.BlockSpec(
            (BLK, c),
            lambda ti, bi, hi, gi=gi, j=j: (
                bi[(ti * g + gi) * WIN_BLOCKS + j], 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,      # bidx, hit (flat 1-D: see kernel)
        grid=(bt,),
        in_specs=[
            pl.BlockSpec((1, M, k),
                         lambda ti, bi, hi: (ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, cout),
                         lambda ti, bi, hi: (ti, 0),
                         memory_space=pltpu.VMEM),
        ] + [win_spec(gi, j) for gi in range(g)
             for j in range(WIN_BLOCKS)],
        out_specs=pl.BlockSpec((g, kx * c, cout),
                               lambda ti, bi, hi: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((M, kx * c), jnp.float32)],
    )
    return pl.pallas_call(
        _make_dw_kernel(kx, g, c, cout, vp_blocks, t_per_b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, kx * c, cout), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(bidx.reshape(-1), hit.reshape(-1), slots, dout_rows,
      *([table] * (g * WIN_BLOCKS)))


def _banded_dw(features, dout, plan: BandedPlan, interpret):
    """Weight gradient: dW[k] = sum_o feat[slots[o, k]]^T dout[o],
    computed on the MXU with the same windows as the forward kernel
    plus the CSR correction entries. Returns [K, Cin, Cout] float32."""
    b, vout, k, kx, g, t, v_in, vp = plan.shape
    _, vin_rows, c = features.shape
    cout = dout.shape[-1]
    dtype = features.dtype

    table = jnp.zeros((b, vp, c), dtype).at[:, :vin_rows].set(features)
    dout_pad = jnp.zeros((b, t * M, cout), dtype).at[:, :vout].set(dout)
    dwg = _banded_dw_call(
        table.reshape(b * vp, c), dout_pad.reshape(b * t * M, cout),
        plan.slots, plan.bidx, plan.hit, kx=kx, g=g, cout=cout,
        vp_blocks=vp // BLK, t_per_b=t,
        interpret=interpret)                      # [G, kx*C, Cout] f32
    dw = dwg.reshape(g * kx, c, cout)[:k]

    r = plan.cor_out.shape[1]
    if r:
        a = _cor_expand(table, plan.cor_in, plan.cor_k, vp, k, c)

        def one(args):
            ab, dob, co = args
            drows = jnp.where(
                (co < vout)[:, None],
                dob[jnp.clip(co, 0, vout - 1)], 0.0)     # [R, Cout]
            # dW_flat += expanded^T @ drows: one [K*C, R]@[R, Cout] GEMM
            return jax.lax.dot_general(
                ab, drows, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [K*C, Cout]

        dw_cor = jax.lax.map(
            one, (a, dout_pad[:, :vout], plan.cor_out)).sum(0)
        dw = dw + dw_cor.reshape(k, c, cout)
    return dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _banded_core(features, weights, plans, interpret):
    """plans: (plan, bwd_plan_or_None)."""
    return _banded_apply(features, plans[0], weights, interpret)


def _banded_core_fwd(features, weights, plans, interpret):
    out = _banded_apply(features, plans[0], weights, interpret)
    return out, (features, weights, plans)


def _float0_like(tree):
    return jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), tree)


def _banded_core_bwd(interpret, res, dout):
    features, weights, plans = res
    plan, bwd_plan = plans
    b, vout, k, kx, g, t, v_in, vp = plan.shape
    vin_rows = features.shape[1]
    dout = dout.astype(features.dtype)
    if bwd_plan is None:
        # submanifold: the plan is its own transpose under kernel
        # mirroring (full-cube offsets: slots[o,k]=i <=> slots[i,K-1-k]=o)
        if vout != vin_rows:
            raise ValueError(
                "banded_conv backward: strided plans (vout != vin) need "
                "an explicit bwd_plan (transpose_rulebook + "
                "build_banded_plan / host plans)")
        w_b = jnp.flip(weights, axis=0).transpose(0, 2, 1)  # [K,Cout,Cin]
        dfeat = _banded_apply(dout, plan, w_b, interpret)
    else:
        w_b = weights.transpose(0, 2, 1)
        dfeat = _banded_apply(dout, bwd_plan, w_b, interpret)
    dfeat = dfeat[:, :vin_rows]
    dw = _banded_dw(features, dout, plan, interpret).astype(weights.dtype)
    return dfeat, dw, _float0_like(plans)


_banded_core.defvjp(_banded_core_fwd, _banded_core_bwd)


def banded_conv(features, plan: BandedPlan, weights, bias=None,
                interpret=None, bwd_plan: BandedPlan = None):
    """features [B, Vin, C] (rows sorted by linear id, padding rows
    zero), plan from :func:`build_banded_plan`, weights [K, Cin, Cout].
    Returns [B, Vout, Cout] in the features dtype (f32 accumulation).

    Differentiable: subm plans (Vout == Vin) self-transpose; strided
    plans need ``bwd_plan`` (see :func:`transpose_rulebook`) before
    gradients flow — the error is raised at backward trace time.

    interpret: None = auto (Pallas interpret mode off TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _banded_core(features, weights, (plan, bwd_plan), interpret)
    if bias is not None:
        out = out + bias
    return out


def transpose_rulebook(slots, v_in, vin_rows=None):
    """Invert a strided-conv rulebook: slots [B, Vout, K] (values
    >= v_in mark misses) -> slots_T [B, v_in(+pad), K] where
    slots_T[i, k] = the output row consuming input i at kernel
    position k (miss = Vout).  Per-k the map o -> slots[o, k] is
    injective (fixed k determines o from the input coordinate), so a
    plain scatter inverts it.  Works under jit; numpy twin in
    host_transpose_rulebook.
    """
    b, vout_rows, k = slots.shape
    rows = vin_rows if vin_rows is not None else v_in
    s = slots.astype(jnp.int32)
    o = jnp.broadcast_to(
        jnp.arange(vout_rows, dtype=jnp.int32)[None, :, None], s.shape)
    miss = s >= v_in
    sc = jnp.where(miss, rows, s)  # out-of-bounds -> dropped
    st = jnp.full((b, rows, k), vout_rows, jnp.int32)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None, None], s.shape)
    kidx = jnp.broadcast_to(
        jnp.arange(k, dtype=jnp.int32)[None, None, :], s.shape)
    st = st.at[bidx, sc, kidx].set(o, mode="drop")
    return st


def host_transpose_rulebook(slots, v_in, vin_rows=None):
    """Host twin of :func:`transpose_rulebook` (unbatched [Vout, K]);
    C++ kernel when available, numpy fallback."""
    from ..native import sparse_plan as _native

    if _native.available():
        return _native.transpose_rulebook(slots, v_in, rows=vin_rows)
    vout_rows, k = slots.shape
    rows = vin_rows if vin_rows is not None else v_in
    st = np.full((rows, k), vout_rows, np.int32)
    s = np.asarray(slots, np.int64).ravel()
    o = np.repeat(np.arange(vout_rows, dtype=np.int32), k)
    kk = np.tile(np.arange(k, dtype=np.int32), vout_rows)
    m = s < v_in
    st[s[m], kk[m]] = o[m]
    return st


# ---------------------------------------------------------------------------
# Host-side banded planning.
#
# The kernel consumes the raw rulebook, so the host plan is only the
# per-(tile, group) window indices / block counts plus the correction
# list — a few KB next to the rulebook the loader ships anyway.
# ---------------------------------------------------------------------------


def host_banded_arrays(slots, v_in, kx, cor_capacity=4096):
    """Host planner: slots [Vout, K] (miss >= v_in) -> dict of
    per-example arrays (unbatched; the loader stacks them and
    :func:`plan_from_host` assembles the device BandedPlan together
    with the rulebook):

      bidx [T, G, J] int32      (window block index per block; unused
                                 entries repeat the previous tile's so
                                 the Pallas pipeline skips the re-DMA)
      hit  [T, G] int32         (number of window blocks, 0..J)
      cor  [3, R] int32         ((out_row, in_slot, k); out_row ==
                                 Vout marks padding)
      cor_count [1] int32       (TRUE count, overflow observability)

    Runs the C++ kernel (native/src/second_native.cpp banded_plan)
    when the library is built; the numpy path is the test oracle.
    """
    from ..native import sparse_plan as _native

    if _native.available():
        return _native.banded_plan(slots, v_in, kx, cor_capacity)
    return _host_banded_arrays_np(slots, v_in, kx, cor_capacity)


def _host_banded_arrays_np(slots, v_in, kx, cor_capacity=4096):
    """numpy twin of the C++ banded planner (oracle + fallback)."""
    vout, k = slots.shape
    g = _grouping(k, kx)
    t = -(-vout // M)
    vp = table_pad(v_in)
    big = np.int32(2 ** 30)
    s = slots.astype(np.int32, copy=True)
    s[s >= v_in] = big
    if t * M - vout:
        s = np.concatenate(
            [s, np.full((t * M - vout, k), big, np.int32)], 0)
    sk = s.reshape(t, M, g, kx)
    valid = sk < big
    gmin = sk.min(axis=(1, 3))                      # [T, G]
    b0 = np.clip(gmin // BLK, 0, vp // BLK - WIN_BLOCKS)
    rel = sk - (b0 * BLK)[:, None, :, None]
    in_win = valid & (rel < WIN_BLOCKS * BLK)
    relmax = np.where(in_win, rel, -1).max(axis=(1, 3))
    hit = np.where(relmax >= 0, relmax // BLK + 1, 0)

    jarange = np.arange(WIN_BLOCKS, dtype=np.int32)
    used = hit[..., None] > jarange                 # [T, G, J]
    cand = b0[..., None].astype(np.int32) + jarange
    bidx = _fill_unused_bidx_np(used, cand)

    need = valid & ~in_win                          # [T, M, G, KX]
    cor_count = int(need.sum())
    r = cor_capacity
    cor = np.zeros((3, r), np.int32)
    cor[0, :] = vout                                # padding marker
    (flat,) = np.nonzero(need.reshape(-1))
    n = min(len(flat), r)
    if n:
        fl = flat[:n]
        gk = fl % (g * kx)
        tm = fl // (g * kx)
        cor[0, :n] = tm
        cor[1, :n] = sk.reshape(-1)[fl]
        cor[2, :n] = gk                             # (g, kx) flat == k
    return {
        "bidx": bidx.astype(np.int32),
        "hit": hit.astype(np.int32),
        "cor": cor,
        "cor_count": np.array([cor_count], np.int32),
    }


def plan_from_host(slots, bidx, hit, cor, cor_count, v_in, kx,
                   vout=None, found=None):
    """Assemble a BandedPlan from loader-stacked host arrays:
    slots [B, Vout, K] (the rulebook, any int dtype, miss >= v_in),
    bidx [B, T, G, J], hit [B, T, G], cor [B, 3, R], cor_count [B, 1].

    found: optional [B, Vout, K] bool (device-built rulebooks whose
    miss slots are arbitrary searchsorted rows)."""
    b, t, g = hit.shape
    k = g * kx
    vp = table_pad(v_in)
    vout_rows = slots.shape[1]
    vout_cap = vout if vout is not None else vout_rows
    s = slots.astype(jnp.int32)
    miss = s >= v_in
    if found is not None:
        miss = miss | ~found
    s = jnp.where(miss, jnp.int32(v_in), s)
    pad_rows = t * M - vout_rows
    if pad_rows:
        s = jnp.concatenate(
            [s, jnp.full((b, pad_rows, k), v_in, jnp.int32)], axis=1)
    bidx = bidx.astype(jnp.int32) + (
        jnp.arange(b, dtype=jnp.int32)[:, None, None, None]
        * (vp // BLK))
    return BandedPlan(
        slots=s.reshape(b * t, M, k),
        bidx=bidx.reshape(b * t, g, WIN_BLOCKS),
        hit=hit.astype(jnp.int32).reshape(b * t, g),
        cor_out=cor[:, 0, :].astype(jnp.int32),
        cor_in=cor[:, 1, :].astype(jnp.int32),
        cor_k=cor[:, 2, :].astype(jnp.int32),
        cor_count=cor_count.reshape(b, -1)[:, 0].astype(jnp.int32),
        shape=(b, vout_cap, k, kx, g, t, v_in, vp),
    )
