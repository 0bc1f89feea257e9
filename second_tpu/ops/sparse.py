"""TPU-native sparse 3D convolution (submanifold + strided).

Replaces the external spconv C++/CUDA library the reference's middle
extractors depend on (second/pytorch/models/middle.py:4,64,98 —
SubMConv3d / SparseConv3d / SparseConvTensor).  Design:

  * Active sets have STATIC capacity ``V`` per stage: features
    [B, V, C], coords [B, V, 3] int32 zyx with -1 padding — everything
    jit-compiles once and pipelines.
  * Voxels are kept sorted by linearized coord per batch row; neighbor
    lookup is a vectorized binary search (jnp.searchsorted) into the
    sorted id array — no giant dense index grid, no host hash table.
  * A "rulebook" ([B, V, K] neighbor slot indices) is built once per
    active set and shared by every submanifold conv on that set —
    functional equivalent of spconv's ``indice_key`` reuse
    (middle.py:146-190).
  * conv = gather neighbors -> one [V, K*Cin] x [K*Cin, Cout] matmul
    (MXU-shaped) -> output at active positions.
  * Strided conv emits the standard spconv output active set (every
    position whose kernel window touches an input voxel), deduplicated
    by sort; overflow beyond the static capacity is dropped (counted,
    never silent — see ``SparseGrid.num_active`` vs capacity).

Weight layout: [K, Cin, Cout] where K enumerates kernel offsets in C
order over (dz, dy, dx), dz fastest-last (i.e. np.ndindex(kz, ky, kx)).
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SparseGrid(NamedTuple):
    """Batched static-capacity sparse voxel set (sorted by linear id)."""

    features: jnp.ndarray  # [B, V, C]
    lin: jnp.ndarray  # [B, V] int32 linearized zyx ids, SENTINEL pad, sorted
    coords: jnp.ndarray  # [B, V, 3] int32 zyx, -1 pad
    shape: Tuple[int, int, int]  # static (D, H, W)

    @property
    def sentinel(self):
        d, h, w = self.shape
        return d * h * w

    @property
    def valid(self):
        return self.lin < self.sentinel

    @property
    def num_active(self):
        return self.valid.sum(axis=-1)


def linearize(coords, shape):
    d, h, w = shape
    return coords[..., 0] * (h * w) + coords[..., 1] * w + coords[..., 2]


def from_voxel_coords(features, coords, shape):
    """Build a SparseGrid from (possibly unsorted) coords [B, V, 3] zyx
    with -1 padding rows."""
    d, h, w = shape
    sentinel = d * h * w
    valid = coords[..., 0] >= 0
    lin = jnp.where(valid, linearize(coords, shape), sentinel).astype(
        jnp.int32)
    order = jnp.argsort(lin, axis=-1, stable=True)
    lin_s = jnp.take_along_axis(lin, order, axis=-1)
    feats_s = jnp.take_along_axis(features, order[..., None], axis=-2)
    coords_s = jnp.take_along_axis(coords, order[..., None], axis=-2)
    coords_s = jnp.where(
        (lin_s < sentinel)[..., None], coords_s, -1)
    return SparseGrid(feats_s, lin_s, coords_s, tuple(int(v) for v in shape))


def from_sorted_voxel_coords(features, coords, shape):
    """Like :func:`from_voxel_coords` but trusts coords to be already
    sorted by linear id with -1 padding at the end (the host planner's
    contract) — skips the device argsort."""
    d, h, w = shape
    sentinel = d * h * w
    valid = coords[..., 0] >= 0
    lin = jnp.where(valid, linearize(coords, shape), sentinel).astype(
        jnp.int32)
    return SparseGrid(features, lin, coords, tuple(int(v) for v in shape))


def _kernel_offsets(kernel_size):
    """[K, 3] zyx offsets in weight-layout order."""
    kz, ky, kx = kernel_size
    offs = np.stack(
        [a.ravel() for a in np.meshgrid(
            np.arange(kz), np.arange(ky), np.arange(kx), indexing="ij")],
        axis=1,
    )
    return offs  # kernel index (not centered); caller applies padding


# grids up to this many cells use the dense index-grid lookup (a full
# car.fhd grid is 42*1600*1408 ~ 95M cells = 378MB transient int32)
_DENSE_LOOKUP_MAX_CELLS = 256 * 1024 * 1024


def _lookup(lin_sorted, query_lin, query_valid, sentinel):
    """Locate query ids in each row's sorted id array.

    lin_sorted: [B, V]; query_lin/query_valid: [B, Q].
    Returns slot [B, Q] int32 (V = miss/dump row), found [B, Q] bool.

    Fast path: scatter each row's ids into a dense [num_cells] index
    grid and answer queries with one gather — TPU gathers are ~50x
    cheaper than the binary-search formulation (measured 53ms -> ~4ms
    per car.fhd stage).  Rows are processed sequentially (lax.map) so
    the transient grid is one batch element at a time.
    """
    v = lin_sorted.shape[-1]
    if sentinel <= _DENSE_LOOKUP_MAX_CELLS:
        miss = jnp.int32(v)

        def one(args):
            row_lin, q, qv = args
            # padding rows get unique OOB targets (dropped, no dup-index
            # serialization)
            tgt = jnp.where(
                row_lin < sentinel, row_lin,
                sentinel + jnp.arange(v, dtype=row_lin.dtype))
            grid = jnp.full((sentinel,), miss, jnp.int32)
            grid = grid.at[tgt].set(
                jnp.arange(v, dtype=jnp.int32), mode="drop",
                unique_indices=True)
            qc = jnp.where(qv, q, 0)
            slot = grid[jnp.clip(qc, 0, sentinel - 1)]
            found = (slot < v) & qv
            return jnp.where(found, slot, miss), found

        return jax.lax.map(one, (lin_sorted, query_lin, query_valid))

    q = jnp.where(query_valid, query_lin, sentinel)
    idx = jax.vmap(
        lambda row, qq: jnp.searchsorted(row, qq, side="left")
    )(lin_sorted, q)
    idx_c = jnp.minimum(idx, v - 1)
    hit = jnp.take_along_axis(lin_sorted, idx_c, axis=-1) == q
    found = hit & query_valid & (idx < v)
    return jnp.where(found, idx_c, v).astype(jnp.int32), found


def lookup_many(lin_sorted, queries, sentinel):
    """Answer several query sets against one sorted id array.

    queries: list of (query_lin [B, Qi], query_valid [B, Qi]).
    Concatenates the sets so the dense index grid is built ONCE per
    batch row instead of once per query set (the grid build — a full
    init plus a V-row scatter — costs more than the gathers).
    Returns a list of (slots [B, Qi], found [B, Qi]).
    """
    if len(queries) == 1:
        q, qv = queries[0]
        return [_lookup(lin_sorted, q, qv, sentinel)]
    sizes = [q.shape[-1] for q, _ in queries]
    qcat = jnp.concatenate([q for q, _ in queries], axis=-1)
    vcat = jnp.concatenate([qv for _, qv in queries], axis=-1)
    slots, found = _lookup(lin_sorted, qcat, vcat, sentinel)
    out = []
    off = 0
    for s in sizes:
        out.append((slots[:, off:off + s], found[:, off:off + s]))
        off += s
    return out


def subm_queries(grid: SparseGrid, kernel_size):
    """Neighbor query ids for a subm conv: ([B, V*K] lin, [B, V*K] ok)."""
    d, h, w = grid.shape
    kz, ky, kx = kernel_size
    pad = np.array([(kz - 1) // 2, (ky - 1) // 2, (kx - 1) // 2])
    offs = _kernel_offsets(kernel_size) - pad  # centered offsets
    b, v = grid.lin.shape
    k = offs.shape[0]
    ncoords = grid.coords[:, :, None, :] + jnp.asarray(
        offs, jnp.int32)[None, None]  # [B, V, K, 3]
    in_bounds = (
        (ncoords >= 0).all(-1)
        & (ncoords[..., 0] < d) & (ncoords[..., 1] < h) & (ncoords[..., 2] < w)
        & grid.valid[..., None]
    )
    nlin = linearize(ncoords, grid.shape)
    return nlin.reshape(b, v * k), in_bounds.reshape(b, v * k), k


def build_subm_rulebook(grid: SparseGrid, kernel_size):
    """Neighbor slots for a submanifold conv on this active set.

    Returns [B, V, K] int32 slots (V = missing neighbor).
    Shared by every subm conv with the same kernel on this set
    (spconv ``indice_key`` equivalence).
    """
    b, v = grid.lin.shape
    nlin, in_bounds, k = subm_queries(grid, kernel_size)
    slots, found = _lookup(grid.lin, nlin, in_bounds, grid.sentinel)
    return slots.reshape(b, v, k), found.reshape(b, v, k)


def subm_conv(grid: SparseGrid, rulebook, weights, bias=None):
    """Submanifold conv: output active set == input active set.

    rulebook: (slots [B, V, K], found [B, V, K]) from
    build_subm_rulebook. weights: [K, Cin, Cout].
    """
    slots, found = rulebook
    b, v, k = slots.shape
    cin = grid.features.shape[-1]
    cout = weights.shape[-1]
    # missing neighbors hit the zero dump row (slot == v), so no extra
    # masking pass is needed after the gather
    feats_pad = jnp.concatenate(
        [grid.features,
         jnp.zeros((b, 1, cin), grid.features.dtype)], axis=1)
    gathered = jnp.take_along_axis(
        feats_pad, slots.reshape(b, v * k, 1), axis=1
    ).reshape(b, v, k, cin)
    del found
    out = jax.lax.dot_general(
        gathered.reshape(b, v, k * cin),
        weights.reshape(k * cin, cout),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(grid.features.dtype)
    if bias is not None:
        out = out + bias
    out = jnp.where(grid.valid[..., None], out, 0.0)
    return grid._replace(features=out)


def downsample_active_set(grid: SparseGrid, kernel_size, stride, padding,
                          out_capacity=None, return_count=False):
    """Output active set of a strided sparse conv (spconv semantics:
    every output position whose kernel window contains an active input).

    NOTE: a strided sparse conv DILATES the active set — every output
    whose 3^3 window touches an input is active, ~2.8x the input count
    for the first stride-2 stage on KITTI-scale scenes — so
    out_capacity must be sized accordingly (see
    SparseMiddleBase.capacity_factors).

    Returns a new SparseGrid with zero features ([B, Vout, Cout-less])
    plus its shape; feature computation happens in sparse_conv.  With
    return_count=True also returns the TRUE unique-output count [B]
    (before truncation to out_capacity) so overflow is observable.
    """
    d, h, w = grid.shape
    kz, ky, kx = kernel_size
    sz, sy, sx = stride
    pz, py, px = padding
    out_shape = (
        (d + 2 * pz - kz) // sz + 1,
        (h + 2 * py - ky) // sy + 1,
        (w + 2 * px - kx) // sx + 1,
    )
    b, v = grid.lin.shape
    # Candidate outputs per input voxel form a contiguous interval per
    # dim: o*s - p + k = c with k in [0, K) gives o in
    # [ceil((c+p-K+1)/s), floor((c+p)/s)] — at most ceil(K/s) values.
    # Enumerating the interval instead of all K offsets shrinks the
    # dedup sort from V*27 to V*8 candidates for the stride-2 stages
    # (measured 12.3ms -> ~4ms at car.fhd stage 0).
    kdims = (kz, ky, kx)
    sdims = (sz, sy, sx)
    pdims = (pz, py, px)
    ncand = tuple(-(-kd // sd) for kd, sd in zip(kdims, sdims))
    cand_per_dim = []
    valid_per_dim = []
    for axis in range(3):
        c = grid.coords[..., axis]  # [B, V]
        kd, sd, pd = kdims[axis], sdims[axis], pdims[axis]
        hi = (c + pd) // sd
        lo = -((-(c + pd - kd + 1)) // sd)
        j = jnp.arange(ncand[axis], dtype=jnp.int32)  # [n]
        cand = hi[..., None] - j  # [B, V, n]
        ok = (cand >= lo[..., None]) & (cand >= 0) & (
            cand < out_shape[axis])
        cand_per_dim.append(cand)
        valid_per_dim.append(ok)
    k = int(np.prod(ncand))
    ocoords = jnp.stack([
        jnp.broadcast_to(
            cand_per_dim[0][:, :, :, None, None], (b, v) + ncand),
        jnp.broadcast_to(
            cand_per_dim[1][:, :, None, :, None], (b, v) + ncand),
        jnp.broadcast_to(
            cand_per_dim[2][:, :, None, None, :], (b, v) + ncand),
    ], axis=-1).reshape(b, v, k, 3)
    in_bounds = (
        valid_per_dim[0][:, :, :, None, None]
        & valid_per_dim[1][:, :, None, :, None]
        & valid_per_dim[2][:, :, None, None, :]
    ).reshape(b, v, k) & grid.valid[..., None]
    out_sentinel = out_shape[0] * out_shape[1] * out_shape[2]
    olin = jnp.where(
        in_bounds, linearize(ocoords, out_shape), out_sentinel
    ).reshape(b, v * k)
    olin_sorted = jnp.sort(olin, axis=-1)
    is_new = jnp.concatenate(
        [jnp.ones((b, 1), bool),
         olin_sorted[:, 1:] != olin_sorted[:, :-1]], axis=1
    ) & (olin_sorted < out_sentinel)
    vout = out_capacity or v
    # rank unique ids; scatter first occurrence of each into [B, Vout].
    # non-new / overflow entries get UNIQUE OOB indices (shared dump
    # index would serialize the TPU scatter on duplicates)
    pos = jnp.broadcast_to(
        jnp.arange(olin_sorted.shape[-1])[None, :], olin_sorted.shape)
    rank = jnp.cumsum(is_new, axis=-1) - 1
    rank = jnp.where(is_new & (rank < vout), rank, vout + pos)
    new_lin = jnp.full((b, vout), out_sentinel, jnp.int32)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], rank.shape)
    new_lin = new_lin.at[bidx, rank].set(
        olin_sorted.astype(jnp.int32), mode="drop", unique_indices=True)
    # decode coords back from linear ids
    hw = out_shape[1] * out_shape[2]
    zz = new_lin // hw
    yy = (new_lin % hw) // out_shape[2]
    xx = new_lin % out_shape[2]
    new_valid = new_lin < out_sentinel
    new_coords = jnp.where(
        new_valid[..., None],
        jnp.stack([zz, yy, xx], axis=-1), -1).astype(jnp.int32)
    out = SparseGrid(
        features=jnp.zeros((b, vout, 1), grid.features.dtype),
        lin=new_lin,
        coords=new_coords,
        shape=tuple(int(s) for s in out_shape),
    )
    if return_count:
        return out, is_new.sum(axis=-1)
    return out


def sparse_conv_queries(grid: SparseGrid, out_grid: SparseGrid,
                        kernel_size, stride, padding):
    """Input query ids for a strided conv: ([B, Vout*K], [B, Vout*K], K)."""
    b, vout = out_grid.lin.shape
    offs = _kernel_offsets(kernel_size)
    k = offs.shape[0]
    sarr = jnp.asarray(list(stride), jnp.int32)
    parr = jnp.asarray(list(padding), jnp.int32)
    icoords = (
        out_grid.coords[:, :, None, :] * sarr - parr
        + jnp.asarray(offs, jnp.int32)[None, None]
    )  # [B, Vout, K, 3]
    d, h, w = grid.shape
    in_bounds = (
        (icoords >= 0).all(-1)
        & (icoords[..., 0] < d) & (icoords[..., 1] < h) & (icoords[..., 2] < w)
        & out_grid.valid[..., None]
    )
    ilin = linearize(icoords, grid.shape)
    return ilin.reshape(b, vout * k), in_bounds.reshape(b, vout * k), k


def sparse_conv_apply(grid: SparseGrid, out_grid: SparseGrid, slots,
                      weights, bias=None):
    """Gather-GEMM with precomputed input slots [B, Vout, K]."""
    b, vout, k = slots.shape
    cin = grid.features.shape[-1]
    cout = weights.shape[-1]
    feats_pad = jnp.concatenate(
        [grid.features, jnp.zeros((b, 1, cin), grid.features.dtype)], axis=1)
    gathered = jnp.take_along_axis(
        feats_pad, slots.reshape(b, vout * k, 1), axis=1
    ).reshape(b, vout, k, cin)
    out = jax.lax.dot_general(
        gathered.reshape(b, vout, k * cin),
        weights.reshape(k * cin, cout),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(grid.features.dtype)
    if bias is not None:
        out = out + bias
    out = jnp.where(out_grid.valid[..., None], out, 0.0)
    return out_grid._replace(features=out)


def sparse_conv(grid: SparseGrid, out_grid: SparseGrid, weights,
                kernel_size, stride, padding, bias=None):
    """Strided sparse conv: compute features of out_grid from grid.

    For each output o and kernel position k, input i = o*s - p + k.
    weights: [K, Cin, Cout].
    """
    b, vout = out_grid.lin.shape
    ilin, in_bounds, k = sparse_conv_queries(
        grid, out_grid, kernel_size, stride, padding)
    slots, _ = _lookup(grid.lin, ilin, in_bounds, grid.sentinel)
    # misses land on the zero dump row
    return sparse_conv_apply(
        grid, out_grid, slots.reshape(b, vout, k), weights, bias)


def to_dense(grid: SparseGrid):
    """[B, V, C] sparse -> [B, D, H, W, C] dense (zeros elsewhere)."""
    b, v, c = grid.features.shape
    d, h, w = grid.shape
    # unique OOB indices for padding rows (duplicates serialize scatter)
    flat = jnp.where(
        grid.valid, grid.lin, d * h * w + jnp.arange(v)[None, :])
    out = jnp.zeros((b, d * h * w, c), grid.features.dtype)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, v))
    out = out.at[bidx, flat].set(
        grid.features, mode="drop", unique_indices=True)
    return out.reshape(b, d, h, w, c)
