"""Banded one-hot gather-GEMM sparse convolution (TPU Pallas kernel).

The TPU executes row-gathers at ~8 cycles/row (a sequential DMA-
descriptor loop), which makes the straightforward gather->GEMM sparse
conv in :mod:`second_tpu.ops.sparse` HBM-descriptor-bound: the car.fhd
middle spends ~60 ms/frame issuing ~15M row gathers.  The MXU, by
contrast, runs dense bf16 matmuls at >100 TF/s.  This module performs
the gather ON the MXU.

Design (v6).  The cost of a one-hot MXU gather is
``(window rows) x (lane width)`` FLOPs per gathered row, so the design
minimises both:

  * Voxels are sorted by linearized coordinate (the SparseGrid
    contract), so for each kernel offset the neighbor-slot array is
    monotonic.  Offsets are grouped into clusters of ``kc`` consecutive
    offsets in the C-order (dz, dy, dx) enumeration (kc = ky*kx: one
    cluster per dz; kc = kx: one per (dz, dy)): within a cluster the
    neighbor rows of one 128-output tile form a few tight bands.
  * The feature table is LANE-PACKED: P = 128 // C consecutive rows
    share one 128-lane super-row, so a single 128-wide one-hot dot
    gathers from a window of 128*P real rows with zero lane waste
    (2x/4x/8x fewer one-hot FLOPs than unpacked at C = 64/32/16) and
    the window itself covers P times more rows.
  * Each (tile, cluster) gets up to J independent 128-super-row
    windows (16-aligned starts, -1 = absent): the second window
    catches the sort-order discontinuity where a tile's neighbors
    straddle a z-plane boundary — the case that made single contiguous
    windows blow up into 100k+ CSR corrections on real scenes.  Absent
    windows cost nothing: their DMA and their dot are pl.when-gated.
  * Per window the kernel fetches 128 packed super-rows with ONE
    manual async DMA (``pltpu.make_async_copy``, double-buffered
    across grid steps), builds ONE [kc*M, 128] bf16 one-hot on the
    relative super-row (exact: values < 128 are bf16-exact), runs ONE
    MXU dot against the window, and accumulates.  A P-way lane select
    on slot % P unpacks each row's channels from its super-row.
  * The closing GEMM [M, K*C] @ [K*C, Cout] streams the gathered rows
    through the weights.
  * The tail of slots no window covers (< 0.1% after the multi-window
    fix) falls back to a capacity-bounded CSR pass: gather the
    affected (out, in, k) entries row-wise, apply per-entry weights,
    scatter-add.  Overflow of the static correction capacity is
    counted, never silent.

The banded plan derives from the same slot rulebooks the XLA path
uses.  In production the HOST planner emits the tiny b0/cor arrays
alongside the rulebooks (host_banded_arrays, C++); the on-device
builder (build_banded_plan) is a handful of reductions over reshaped
views.  The plan depends only on the active set and the gather width
C (via the pack factor), so it is shared by every same-width conv on
that set (spconv ``indice_key`` semantics, reference
second/pytorch/models/middle.py:146-190).

Training: :func:`banded_conv` is differentiable via ``jax.custom_vjp``.
The input-gradient is itself a banded conv — for submanifold convs
``dfeat[i] = sum_k dout[slots[i, k]] @ W[K-1-k]^T`` (the SAME rulebook
with kernel-mirrored transposed weights, because the full-cube offset
set is symmetric and subm rulebooks satisfy ``slots[o, k] = i  <=>
slots[i, K-1-k] = o``) but needs its own PLAN (the gather width is
Cout); strided convs need a host/device-built TRANSPOSE rulebook
(``transpose_rulebook``).  The weight-gradient runs on a second Pallas
kernel with the same window gathers, accumulating ``gathered^T @ dout``
in a VMEM-resident [K*C, Cout] output block across the sequential grid.
CSR correction entries contribute to both grads through a per-offset
masked-matmul pass.

Off-TPU (tests, CPU mesh) ``interpret=True`` runs an exact XLA
reference implementation of the same decomposition (window-covered
gather + CSR corrections) instead of the Pallas kernel.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

M = 128        # output rows per tile / grid step
BLK = 128      # lane width: one-hot columns = packed super-rows per window
SUP_ALIGN = 16  # window-start alignment in super-rows (bf16 sublane tile)
J_DEFAULT = 2  # windows per (tile, cluster)


def pack_factor(c):
    """Rows per 128-lane super-row for gather width ``c``."""
    if c <= 0 or 128 % c:
        return 1
    return 128 // c


def choose_kc(kernel, c):
    """Offsets per cluster for a (kz, ky, kx) kernel gathering
    ``c``-wide features.  Wide windows (small c => large pack factor)
    absorb the dy spread, so one cluster per dz (kc = ky*kx) minimises
    DMA/dot count; at c >= 64 the window is only 128*P = 256 rows and
    per-(dz, dy) clusters (kc = kx) keep the spans inside it."""
    kz, ky, kx = kernel
    return ky * kx if pack_factor(c) >= 4 else kx


def table_pad(v, p=1):
    """Padded feature-table length: the miss row (== v) must exist and
    be zero, the packed table needs a whole number of SUP_ALIGN
    super-rows, and at least BLK super-rows so a window fits."""
    sup = max(-(-(v + 1) // (p * SUP_ALIGN)) * SUP_ALIGN, BLK)
    return sup * p


class BandedPlan(NamedTuple):
    """Device-side banded gather plan for one rulebook [B, Vout, K].

    ``shape`` is static metadata (registered as pytree aux data below,
    so a plan crosses jit boundaries without the ints turning into
    tracers)."""

    slots: jnp.ndarray     # [B*NT, M, K] int32, miss == Vin exactly
    b0: jnp.ndarray        # [B*NT, G, J] int32 global window start
    #                        super-row (16-aligned, -1 = absent)
    cor_out: jnp.ndarray   # [B, R] int32 out row (Vout = pad/dump)
    cor_in: jnp.ndarray    # [B, R] int32 in slot (into padded table)
    cor_k: jnp.ndarray     # [B, R] int32 kernel offset index
    cor_count: jnp.ndarray  # [B] int32 TRUE correction count (overflow obs.)
    shape: tuple           # static: (B, Vout, K, KC, G, NT, Vin, Vp, J, P)


jax.tree_util.register_pytree_node(
    BandedPlan,
    lambda p: (tuple(p[:-1]), p.shape),
    lambda shape, leaves: BandedPlan(*leaves, shape=shape),
)


def _grouping(k, kc):
    """Offsets are enumerated C-order over (dz, dy, dx) (sparse.py
    _kernel_offsets), so consecutive runs of kc offsets share their
    leading coordinates."""
    assert k % kc == 0, (k, kc)
    return k // kc


def _greedy_windows(sup_min_fn, vps, j):
    """Shared greedy-cover driver: repeatedly take the smallest
    uncovered super-row, open a 16-aligned 128-super-row window there.
    ``sup_min_fn(lo)`` returns the smallest valid super-row >= lo (or
    BIG).  Returns the list of window starts (-1 absent)."""
    big = 1 << 30
    starts = []
    lo = 0
    floor = 0
    for _ in range(j):
        m = sup_min_fn(lo)
        if m >= big:
            starts.append(-1)
            continue
        b = max((m // SUP_ALIGN) * SUP_ALIGN, floor)
        b = min(b, vps - BLK)
        if b < floor:
            starts.append(-1)
            continue
        starts.append(b)
        lo = b + BLK
        floor = b + BLK
    return starts


def build_banded_plan(slots, found, v_in, kc, c=None, cor_capacity=8192,
                      j=J_DEFAULT, p=None):
    """slots [B, Vout, K] int32 (miss >= v_in), found [B, Vout, K] bool
    or None -> BandedPlan.  kc: offsets per cluster; c: gather channel
    width (sets the pack factor; pass p to override).
    All ops are reshapes/reductions plus one transpose; jit-traceable;
    runs once per (active set, kernel, width).
    """
    if p is None:
        p = pack_factor(c) if c is not None else 1
    b, vout, k = slots.shape
    g = _grouping(k, kc)
    nt = -(-vout // M)
    vp = table_pad(v_in, p)
    vps = vp // p
    big = jnp.int32(2 ** 30)
    miss = slots >= v_in
    if found is not None:
        miss = miss | ~found
    s = jnp.where(miss, jnp.int32(v_in), slots.astype(jnp.int32))
    pad_rows = nt * M - vout
    if pad_rows:
        s = jnp.concatenate(
            [s, jnp.full((b, pad_rows, k), v_in, jnp.int32)], axis=1)
    s5 = s.reshape(b, nt, M, g, kc)
    sup = s5 // p
    valid = s5 < v_in

    starts = []
    covered = jnp.zeros(valid.shape, bool)
    floor = jnp.zeros((b, nt, g), jnp.int32)
    for w in range(j):
        mval = jnp.where(valid & ~covered, sup, big).min(axis=(2, 4))
        b0 = jnp.maximum((mval // SUP_ALIGN) * SUP_ALIGN, floor)
        b0 = jnp.minimum(b0, vps - BLK)
        present = (mval < big) & (b0 >= floor)
        cov_w = (valid & (sup >= b0[:, :, None, :, None])
                 & (sup < (b0 + BLK)[:, :, None, :, None]) & present[
                     :, :, None, :, None])
        covered = covered | cov_w
        starts.append(jnp.where(present, b0, jnp.int32(-1)))
        floor = jnp.where(present, b0 + BLK, floor)
    b0s = jnp.stack(starts, axis=-1)                 # [B, NT, G, J]

    # CSR corrections: valid slots no window covers
    need = (valid & ~covered).transpose(0, 1, 2, 3, 4).reshape(
        b, nt * M * g * kc)
    cor_count = need.sum(axis=1).astype(jnp.int32)

    def one(args):
        need_row, s_row = args
        (pos,) = jnp.nonzero(need_row, size=cor_capacity,
                             fill_value=need_row.shape[0])
        # decode flat (nt*M, g, kc) -> out row, k  ((g, kc) flat == k)
        tm = pos // (g * kc)
        kk = pos % (g * kc)
        out_row = jnp.where(pos < need_row.shape[0], tm, vout)
        in_slot = jnp.where(
            pos < need_row.shape[0],
            s_row[jnp.clip(pos, 0, need_row.shape[0] - 1)], 0)
        return (out_row.astype(jnp.int32), in_slot.astype(jnp.int32),
                kk.astype(jnp.int32))

    cor_out, cor_in, cor_k = jax.lax.map(
        one, (need, s.reshape(b, nt * M * g * kc)))

    # kernel layout [B*NT, M, K]: M on sublanes, K on lanes — the
    # in-kernel one-hot slices a column per offset (lane-to-sublane
    # relayouts are unsupported in Mosaic).  b0 stays example-LOCAL;
    # the kernel adds the example's packed-table offset at DMA time.
    slots_t = s.reshape(b * nt, M, k)
    b0s = b0s.reshape(b * nt, g, j)

    return BandedPlan(
        slots=slots_t.astype(jnp.int32),
        b0=b0s.astype(jnp.int32),
        cor_out=cor_out, cor_in=cor_in, cor_k=cor_k,
        cor_count=cor_count,
        shape=(b, vout, k, kc, g, nt, v_in, vp, j, p),
    )


# ---------------------------------------------------------------------------
# Forward Pallas kernel
# ---------------------------------------------------------------------------


def choose_kt(g, j, k, c, cout, esize, kc):
    """Tiles per grid step: amortizes the per-step fixed cost (index
    maps, DMA bookkeeping, closing-GEMM weight loads) subject to the
    ~16MB VMEM budget (double-buffered windows + gather scratch +
    double-buffered in/out blocks)."""
    for kt in (8, 4, 2, 1):
        win = 2 * kt * g * j * BLK * BLK * esize
        gth = kt * M * k * c * esize
        io = 2 * kt * M * (k * 4 + 2 * cout * esize)
        fixed = kc * M * BLK * (esize + 4) + k * c * cout * esize
        if win + gth + io + fixed <= 12_000_000:
            return kt
    return 1


def _make_fwd_kernel(kc, g, c, cout, j, p, out_dtype, vps, nt, kt):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(b0_ref, s_ref, w_ref, table_ref, out_ref,
               win_ref, gth_ref, ohm_ref, acc_ref, sems):
        n = pl.program_id(0)
        nsteps = pl.num_programs(0)

        def b0_at(step, kt_i, g_i, w):
            return b0_ref[((step * kt + kt_i) * g + g_i) * j + w]

        def dma(step, parity, kt_i, g_i, w):
            # b0 is example-local; the packed table is [B*Vps, 128].
            # The start index is written as (q * SUP_ALIGN) so Mosaic
            # can PROVE sublane-tile divisibility when it places the
            # table in VMEM (it fits at the deeper scales).
            q = ((b0_at(step, kt_i, g_i, w) // SUP_ALIGN)
                 + ((step * kt + kt_i) // nt) * (vps // SUP_ALIGN))
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(q * SUP_ALIGN, BLK)],
                win_ref.at[parity, kt_i, g_i, w],
                sems.at[parity, kt_i, g_i, w])

        def start_all(step, parity):
            for kt_i in range(kt):
                for g_i in range(g):
                    for w in range(j):
                        @pl.when(b0_at(step, kt_i, g_i, w) >= 0)
                        def _():
                            dma(step, parity, kt_i, g_i, w).start()

        @pl.when(n == 0)
        def _():
            start_all(0, 0)

        @pl.when(n + 1 < nsteps)
        def _():
            start_all(n + 1, (n + 1) % 2)

        par = n % 2
        tdt = win_ref.dtype
        iota = jax.lax.broadcasted_iota(jnp.int32, (M, BLK), 1)

        for kt_i in range(kt):
            for g_i in range(g):
                s_g = s_ref[0, kt_i, :,
                            g_i * kc:(g_i + 1) * kc]      # [M, kc] int32
                sup = s_g // p if p > 1 else s_g
                acc_ref[:] = jnp.zeros_like(acc_ref)
                for w in range(j):
                    b0w = b0_at(n, kt_i, g_i, w)

                    @pl.when(b0w >= 0)
                    def _():
                        dma(n, par, kt_i, g_i, w).wait()
                        # int32 equality against iota; misses and
                        # uncovered slots match nothing, contribute 0.
                        rel = sup - b0w                   # [M, kc]
                        for x in range(kc):
                            ohm_ref[x * M:(x + 1) * M, :] = (
                                rel[:, x:x + 1] == iota).astype(tdt)
                        acc_ref[:] += jax.lax.dot(
                            ohm_ref[:], win_ref[par, kt_i, g_i, w],
                            preferred_element_type=jnp.float32)
                # P-way lane select: row m's channels live at lane
                # offset (slot % P) * c of its super-row
                row0 = kt_i * M
                for x in range(kc):
                    band = (g_i * kc + x) * c
                    seg = acc_ref[x * M:(x + 1) * M, :]
                    if p == 1:
                        res = seg[:, :c]
                    else:
                        pr = (s_g[:, x:x + 1]
                              - sup[:, x:x + 1] * p)      # [M, 1]
                        res = jnp.where(pr == 0, seg[:, :c], 0.0)
                        for q in range(1, p):
                            res = res + jnp.where(
                                pr == q, seg[:, q * c:(q + 1) * c], 0.0)
                    gth_ref[row0:row0 + M, band:band + c] = res.astype(
                        gth_ref.dtype)

        out_ref[:] = jax.lax.dot(
            gth_ref[:].astype(w_ref.dtype), w_ref[:],
            preferred_element_type=jnp.float32).astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kc", "g", "j", "p", "vps", "nt", "out_dtype"))
def _banded_call_fwd(table, slots, b0, wflat, kc, g, j, p, vps, nt,
                     out_dtype):
    """table [B*Vps, 128] lane-packed (HBM-resident); slots
    [B*NT, M, K] int32; b0 [B*NT, G, J] int32 (global super-row
    starts, -1 absent); wflat [K*C, Cout].  Returns [B*NT*M, Cout]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cout = wflat.shape[-1]
    bnt, _, k = slots.shape
    c = wflat.shape[0] // k
    kt = choose_kt(g, j, k, c, cout, table.dtype.itemsize, kc)
    steps = -(-bnt // kt)
    pad = steps * kt - bnt
    if pad:
        # padding tiles: b0 = -1 (all windows absent -> zero rows)
        slots = jnp.concatenate(
            [slots, jnp.zeros((pad, M, k), slots.dtype)], axis=0)
        b0 = jnp.concatenate(
            [b0, jnp.full((pad, g, j), -1, b0.dtype)], axis=0)
    slots = slots.reshape(steps, kt, M, k)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,      # b0 (flat 1-D)
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, kt, M, k),
                         lambda n, b0_: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * c, cout),
                         lambda n, b0_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # table: HBM/VMEM
        ],
        out_specs=pl.BlockSpec((kt * M, cout),
                               lambda n, b0_: (n, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, kt, g, j, BLK, BLK), table.dtype),
            pltpu.VMEM((kt * M, k * c), table.dtype),
            pltpu.VMEM((kc * M, BLK), table.dtype),
            pltpu.VMEM((kc * M, BLK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, kt, g, j)),
        ],
    )
    out = pl.pallas_call(
        _make_fwd_kernel(kc, g, c, cout, j, p, out_dtype, vps, nt, kt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((steps * kt * M, cout),
                                       out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(b0.reshape(-1), slots, wflat, table)
    return out[:bnt * M]


def _pack_table(features, vp, c, p, vin_rows):
    """[B, Vin, C] -> lane-packed [B*Vps, 128] with zero padding (the
    miss row v_in is inside the zero pad)."""
    b = features.shape[0]
    table = jnp.zeros((b, vp, c), features.dtype).at[
        :, :vin_rows].set(features)
    return table.reshape(b * (vp // p), p * c)


def _plan_local_views(plan: BandedPlan):
    """Per-example views of the kernel-layout plan arrays: slots
    [B, NT*M, K] and b0 [B, NT, G, J] (example-local, -1 absent)."""
    b, vout, k, kc, g, nt, v_in, vp, j, p = plan.shape
    s = plan.slots.reshape(b, nt * M, k)
    b0 = plan.b0.reshape(b, nt, g, j)
    return s, b0


def _covered_mask(plan: BandedPlan):
    """[B, NT*M, K] bool: slot is valid and inside one of its
    cluster's windows (the exact coverage the kernel computes)."""
    b, vout, k, kc, g, nt, v_in, vp, j, p = plan.shape
    s, b0 = _plan_local_views(plan)
    sup = s // p
    b0r = jnp.repeat(b0, kc, axis=-2).reshape(b, 1, nt, k, j)
    supr = sup.reshape(b, nt, M, k).transpose(0, 2, 1, 3)[..., None]
    cov = ((b0r >= 0) & (supr >= b0r) & (supr < b0r + BLK)).any(-1)
    cov = cov.transpose(0, 2, 1, 3).reshape(b, nt * M, k)
    return cov & (s < v_in)


def _banded_apply_reference(features, plan: BandedPlan, weights):
    """Exact XLA twin of the Pallas kernel (gather by slots, window
    gating, miss -> zero row); used off-TPU and as the parity oracle."""
    b, vout, k, kc, g, nt, v_in, vp, j, p = plan.shape
    _, vin_rows, c = features.shape
    cout = weights.shape[-1]
    dtype = features.dtype

    table = jnp.zeros((b, vp, c), dtype).at[:, :vin_rows].set(features)
    s, _ = _plan_local_views(plan)
    in_win = _covered_mask(plan)
    slot_eff = jnp.where(in_win, s, v_in)              # v_in row is zero
    gathered = jnp.take_along_axis(
        table, slot_eff.reshape(b, nt * M * k, 1), axis=1
    ).reshape(b, nt * M, k * c)
    out = jax.lax.dot_general(
        gathered, weights.astype(dtype).reshape(k * c, cout),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)
    return out[:, :vout]


def _cor_contrib(table, plan, weights, vp, k, c, cout, dtype):
    """[B, R, Cout] correction contributions: per-entry feat row times
    W[cor_k], as K masked [R, C] @ [C, Cout] matmuls (no [R, K*C]
    expansion buffer — that costs R*K*C*4 bytes of HBM traffic)."""
    def one(args):
        tab, ci, ck = args
        rows = tab[jnp.clip(ci, 0, vp - 1)]              # [R, C]
        contrib = jnp.zeros((rows.shape[0], cout), jnp.float32)
        for kk in range(k):
            sel = jnp.where((ck == kk)[:, None], rows, 0)
            contrib += jax.lax.dot(
                sel, weights[kk].astype(dtype),
                preferred_element_type=jnp.float32)
        return contrib

    return jax.lax.map(one, (table, plan.cor_in, plan.cor_k))


def _banded_apply(features, plan: BandedPlan, weights, interpret):
    """Forward impl (no VJP): features [B, Vin, C] -> [B, Vout, Cout]."""
    b, vout, k, kc, g, nt, v_in, vp, j, p = plan.shape
    _, vin_rows, c = features.shape
    cout = weights.shape[-1]
    dtype = features.dtype
    assert p * c == 128 or p == 1, (p, c)

    if interpret:
        out = _banded_apply_reference(features, plan, weights)
    else:
        packed = _pack_table(features, vp, c, p, vin_rows)
        wflat = weights.astype(dtype).reshape(k * c, cout)
        out = _banded_call_fwd(
            packed, plan.slots, plan.b0, wflat,
            kc=kc, g=g, j=j, p=p, vps=vp // p, nt=nt, out_dtype=dtype)
        out = out.reshape(b, nt * M, cout)[:, :vout]

    # CSR corrections for the slots no window covers
    r = plan.cor_out.shape[1]
    if r:
        table = jnp.zeros((b, vp, c), dtype).at[:, :vin_rows].set(features)
        contrib = _cor_contrib(table, plan, weights, vp, k, c, cout,
                               dtype)

        def one(args):
            co, cb, o = args
            return o.at[jnp.clip(co, 0, vout - 1)].add(
                jnp.where((co < vout)[:, None], cb, 0.0).astype(dtype),
                mode="drop")

        out = jax.lax.map(one, (plan.cor_out, contrib, out))

    return out


# ---------------------------------------------------------------------------
# Weight-gradient kernel
# ---------------------------------------------------------------------------


def _make_dw_kernel(kc, g, c, cout, j, p, vps, nt, kt):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(b0_ref, s_ref, dout_ref, table_ref, dw_ref,
               win_ref, gth_ref, ohm_ref, acc_ref, sems):
        n = pl.program_id(0)
        nsteps = pl.num_programs(0)

        def b0_at(step, kt_i, g_i, w):
            return b0_ref[((step * kt + kt_i) * g + g_i) * j + w]

        def dma(step, parity, kt_i, g_i, w):
            # b0 is example-local; the packed table is [B*Vps, 128].
            # (q * SUP_ALIGN) form: see the forward kernel.
            q = ((b0_at(step, kt_i, g_i, w) // SUP_ALIGN)
                 + ((step * kt + kt_i) // nt) * (vps // SUP_ALIGN))
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(q * SUP_ALIGN, BLK)],
                win_ref.at[parity, kt_i, g_i, w],
                sems.at[parity, kt_i, g_i, w])

        def start_all(step, parity):
            for kt_i in range(kt):
                for g_i in range(g):
                    for w in range(j):
                        @pl.when(b0_at(step, kt_i, g_i, w) >= 0)
                        def _():
                            dma(step, parity, kt_i, g_i, w).start()

        @pl.when(n == 0)
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)
            start_all(0, 0)

        @pl.when(n + 1 < nsteps)
        def _():
            start_all(n + 1, (n + 1) % 2)

        par = n % 2
        tdt = win_ref.dtype
        iota = jax.lax.broadcasted_iota(jnp.int32, (M, BLK), 1)

        for kt_i in range(kt):
            for g_i in range(g):
                s_g = s_ref[0, kt_i, :, g_i * kc:(g_i + 1) * kc]
                sup = s_g // p if p > 1 else s_g
                acc_ref[:] = jnp.zeros_like(acc_ref)
                for w in range(j):
                    b0w = b0_at(n, kt_i, g_i, w)

                    @pl.when(b0w >= 0)
                    def _():
                        dma(n, par, kt_i, g_i, w).wait()
                        rel = sup - b0w
                        for x in range(kc):
                            ohm_ref[x * M:(x + 1) * M, :] = (
                                rel[:, x:x + 1] == iota).astype(tdt)
                        acc_ref[:] += jax.lax.dot(
                            ohm_ref[:], win_ref[par, kt_i, g_i, w],
                            preferred_element_type=jnp.float32)
                row0 = kt_i * M
                for x in range(kc):
                    band = (g_i * kc + x) * c
                    seg = acc_ref[x * M:(x + 1) * M, :]
                    if p == 1:
                        res = seg[:, :c]
                    else:
                        pr = s_g[:, x:x + 1] - sup[:, x:x + 1] * p
                        res = jnp.where(pr == 0, seg[:, :c], 0.0)
                        for q in range(1, p):
                            res = res + jnp.where(
                                pr == q, seg[:, q * c:(q + 1) * c], 0.0)
                    gth_ref[row0:row0 + M, band:band + c] = res.astype(
                        gth_ref.dtype)

        # dW += gathered^T @ dout for this step's KT*M rows
        dw_ref[:] += jax.lax.dot_general(
            gth_ref[:].astype(dout_ref.dtype), dout_ref[:],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kc", "g", "j", "p", "vps", "nt", "c"))
def _banded_dw_call(table, dout_rows, slots, b0, kc, g, j, p, vps, nt,
                    c):
    """table [B*Vps, 128] lane-packed, dout_rows [B*NT*M, Cout]
    -> [K*C, Cout] f32.

    Same window structure as the forward call; the [K*C, Cout]
    accumulator lives in one VMEM-resident output block across the
    sequential grid (index_map constant)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cout = dout_rows.shape[-1]
    bnt, _, k = slots.shape
    kt = choose_kt(g, j, k, c, cout, table.dtype.itemsize, kc)
    steps = -(-bnt // kt)
    pad = steps * kt - bnt
    if pad:
        slots = jnp.concatenate(
            [slots, jnp.zeros((pad, M, k), slots.dtype)], axis=0)
        b0 = jnp.concatenate(
            [b0, jnp.full((pad, g, j), -1, b0.dtype)], axis=0)
        dout_rows = jnp.concatenate(
            [dout_rows,
             jnp.zeros((pad * M, cout), dout_rows.dtype)], axis=0)
    slots = slots.reshape(steps, kt, M, k)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, kt, M, k),
                         lambda n, b0_: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt * M, cout),
                         lambda n, b0_: (n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((k * c, cout),
                               lambda n, b0_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, kt, g, j, BLK, BLK), table.dtype),
            pltpu.VMEM((kt * M, k * c), table.dtype),
            pltpu.VMEM((kc * M, BLK), table.dtype),
            pltpu.VMEM((kc * M, BLK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, kt, g, j)),
        ],
    )
    return pl.pallas_call(
        _make_dw_kernel(kc, g, c, cout, j, p, vps, nt, kt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k * c, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(b0.reshape(-1), slots, dout_rows, table)


def _banded_dw_reference(features, dout, plan: BandedPlan):
    """Exact XLA twin of the dw kernel (window-covered entries only)."""
    b, vout, k, kc, g, nt, v_in, vp, j, p = plan.shape
    _, vin_rows, c = features.shape
    cout = dout.shape[-1]
    dtype = features.dtype

    table = jnp.zeros((b, vp, c), dtype).at[:, :vin_rows].set(features)
    s, _ = _plan_local_views(plan)
    in_win = _covered_mask(plan)
    slot_eff = jnp.where(in_win, s, v_in)
    gathered = jnp.take_along_axis(
        table, slot_eff.reshape(b, nt * M * k, 1), axis=1
    ).reshape(b, nt * M, k * c)
    dout_pad = jnp.zeros((b, nt * M, cout), dtype).at[:, :vout].set(dout)
    return jax.lax.dot_general(
        gathered, dout_pad,
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).sum(0)  # [K*C, Cout]


def _banded_dw(features, dout, plan: BandedPlan, interpret):
    """Weight gradient: dW[k] = sum_o feat[slots[o, k]]^T dout[o],
    computed on the MXU with the same windows as the forward kernel
    plus the CSR correction entries. Returns [K, Cin, Cout] float32."""
    b, vout, k, kc, g, nt, v_in, vp, j, p = plan.shape
    _, vin_rows, c = features.shape
    cout = dout.shape[-1]
    dtype = features.dtype

    if interpret:
        dwf = _banded_dw_reference(features, dout, plan)
    else:
        packed = _pack_table(features, vp, c, p, vin_rows)
        dout_pad = jnp.zeros((b, nt * M, cout), dtype).at[:, :vout].set(
            dout)
        dwf = _banded_dw_call(
            packed, dout_pad.reshape(b * nt * M, cout),
            plan.slots, plan.b0, kc=kc, g=g, j=j, p=p, vps=vp // p,
            nt=nt, c=c)                               # [K*C, Cout] f32
    dw = dwf.reshape(k, c, cout)

    r = plan.cor_out.shape[1]
    if r:
        table = jnp.zeros((b, vp, c), dtype).at[:, :vin_rows].set(features)

        def one(args):
            tab, dob, ci, ck, co = args
            rows = tab[jnp.clip(ci, 0, vp - 1)]          # [R, C]
            drows = jnp.where(
                (co < vout)[:, None],
                dob[jnp.clip(co, 0, vout - 1)], 0.0)     # [R, Cout]
            # per-offset masked outer products (no [R, K*C] expansion)
            parts = []
            for kk in range(k):
                sel = jnp.where((ck == kk)[:, None], rows, 0)
                parts.append(jax.lax.dot_general(
                    sel, drows, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            return jnp.stack(parts)                      # [K, C, Cout]

        dw_cor = jax.lax.map(
            one, (table, dout, plan.cor_in, plan.cor_k,
                  plan.cor_out)).sum(0)
        dw = dw + dw_cor
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
    b, vout, k, kc, g, nt, v_in, vp, j, p = plan.shape
    vin_rows = features.shape[1]
    dout = dout.astype(features.dtype)
    if bwd_plan is None:
        # submanifold: the rulebook is its own transpose under kernel
        # mirroring (full-cube offsets: slots[o,k]=i <=> slots[i,K-1-k]=o)
        # but the gather width changes to Cout, so rebuild the plan at
        # the matching pack factor when it differs.
        if vout != vin_rows:
            raise ValueError(
                "banded_conv backward: strided plans (vout != vin) need "
                "an explicit bwd_plan (transpose_rulebook + "
                "build_banded_plan / host plans)")
        cout = weights.shape[-1]
        pb = pack_factor(cout)
        if pb == p:
            bwd = plan
        else:
            s, _ = _plan_local_views(plan)
            bwd = build_banded_plan(
                s[:, :vout], None, v_in=v_in, kc=kc, p=pb,
                cor_capacity=plan.cor_out.shape[1])
        w_b = jnp.flip(weights, axis=0).transpose(0, 2, 1)  # [K,Cout,Cin]
        dfeat = _banded_apply(dout, bwd, w_b, interpret)
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
    zero), plan from :func:`build_banded_plan` (with c=C), weights
    [K, Cin, Cout].  Returns [B, Vout, Cout] in the features dtype
    (f32 accumulation).

    Differentiable: subm plans (Vout == Vin) self-transpose; strided
    plans need ``bwd_plan`` (see :func:`transpose_rulebook`) before
    gradients flow — the error is raised at backward trace time.

    interpret: None = auto (exact XLA reference path off TPU).
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
# per-(tile, cluster) window start super-rows plus the correction
# list — a few KB next to the rulebook the loader ships anyway.
# ---------------------------------------------------------------------------


def host_banded_arrays(slots, v_in, kc, c=None, cor_capacity=8192,
                       j=J_DEFAULT, p=None):
    """Host planner: slots [Vout, K] (miss >= v_in) -> dict of
    per-example arrays (unbatched; the loader stacks them and
    :func:`plan_from_host` assembles the device BandedPlan together
    with the rulebook):

      b0  [T, G, J] int32       (window start super-rows per cluster,
                                 16-aligned, -1 = absent;
                                 T = ceil(Vout/M) tiles)
      cor [3, R] int32          ((out_row, in_slot, k); out_row ==
                                 Vout marks padding)
      cor_count [1] int32       (TRUE count, overflow observability)

    Runs the C++ kernel (native/src/second_native.cpp banded_plan)
    when the library is built; the numpy path is the test oracle.
    """
    from ..native import sparse_plan as _native

    if p is None:
        p = pack_factor(c) if c is not None else 1
    if _native.available():
        return _native.banded_plan(slots, v_in, kc, cor_capacity, j, p)
    return _host_banded_arrays_np(slots, v_in, kc, cor_capacity, j, p)


def _host_banded_arrays_np(slots, v_in, kc, cor_capacity=8192,
                           j=J_DEFAULT, p=1):
    """numpy twin of the C++ banded planner (oracle + fallback)."""
    vout, k = slots.shape
    g = _grouping(k, kc)
    t = -(-vout // M)
    vp = table_pad(v_in, p)
    vps = vp // p
    big = np.int32(2 ** 30)
    s = slots.astype(np.int32, copy=True)
    s[s >= v_in] = big
    if t * M - vout:
        s = np.concatenate(
            [s, np.full((t * M - vout, k), big, np.int32)], 0)
    sk = s.reshape(t, M, g, kc)
    sup = np.where(sk < big, sk // p, big)
    valid = sk < big

    b0s = np.full((t, g, j), -1, np.int32)
    covered = np.zeros(sup.shape, bool)
    floor = np.zeros((t, g), np.int32)
    for w in range(j):
        mval = np.where(valid & ~covered, sup, big).min(axis=(1, 3))
        b0 = np.maximum((mval // SUP_ALIGN) * SUP_ALIGN, floor)
        b0 = np.minimum(b0, vps - BLK)
        present = (mval < big) & (b0 >= floor)
        cov_w = (valid & (sup >= b0[:, None, :, None])
                 & (sup < (b0 + BLK)[:, None, :, None])
                 & present[:, None, :, None])
        covered |= cov_w
        b0s[:, :, w] = np.where(present, b0, -1)
        floor = np.where(present, b0 + BLK, floor)

    need = valid & ~covered                         # [T, M, G, KC]
    cor_count = int(need.sum())
    r = cor_capacity
    cor = np.zeros((3, r), np.int32)
    cor[0, :] = vout                                # padding marker
    (flat,) = np.nonzero(need.reshape(-1))
    n = min(len(flat), r)
    if n:
        fl = flat[:n]
        kk = fl % (g * kc)
        tm = fl // (g * kc)
        cor[0, :n] = tm
        cor[1, :n] = sk.reshape(-1)[fl]
        cor[2, :n] = kk                             # (g, kc) flat == k
    return {
        "b0": b0s,
        "cor": cor,
        "cor_count": np.array([cor_count], np.int32),
    }


def plan_from_host(slots, b0, cor, cor_count, v_in, kc, c=None,
                   vout=None, found=None, j=None, p=None):
    """Assemble a BandedPlan from loader-stacked host arrays:
    slots [B, Vout, K] (the rulebook, any int dtype, miss >= v_in),
    b0 [B, T, G, J] (local super-row starts, -1 absent), cor [B, 3, R],
    cor_count [B, 1].  c: gather channel width (must match the width
    the host planner was given).

    found: optional [B, Vout, K] bool (device-built rulebooks whose
    miss slots are arbitrary searchsorted rows)."""
    if p is None:
        p = pack_factor(c) if c is not None else 1
    b, t_raw, g, jj = b0.shape
    if j is None:
        j = jj
    k = g * kc
    vp = table_pad(v_in, p)
    vps = vp // p
    vout_rows = slots.shape[1]
    vout_cap = vout if vout is not None else vout_rows
    nt = -(-vout_rows // M)
    s = slots.astype(jnp.int32)
    miss = s >= v_in
    if found is not None:
        miss = miss | ~found
    s = jnp.where(miss, jnp.int32(v_in), s)
    pad_rows = nt * M - vout_rows
    if pad_rows:
        s = jnp.concatenate(
            [s, jnp.full((b, pad_rows, k), v_in, jnp.int32)], axis=1)
    slots_t = s.reshape(b * nt, M, k)
    b0 = b0.astype(jnp.int32)
    if nt > t_raw:
        b0 = jnp.concatenate(
            [b0, jnp.full((b, nt - t_raw, g, j), -1, jnp.int32)],
            axis=1)
    return BandedPlan(
        slots=slots_t,
        b0=b0.reshape(b * nt, g, j),
        cor_out=cor[:, 0, :].astype(jnp.int32),
        cor_in=cor[:, 1, :].astype(jnp.int32),
        cor_k=cor[:, 2, :].astype(jnp.int32),
        cor_count=cor_count.reshape(b, -1)[:, 0].astype(jnp.int32),
        shape=(b, vout_cap, k, kc, g, nt, v_in, vp, j, p),
    )
