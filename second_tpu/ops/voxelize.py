"""On-device (JAX/XLA) static-shape voxelization.

The TPU twin of second_tpu.data.voxelizer: turns a fixed-capacity point
buffer into padded ``[max_voxels, T, f]`` voxels + zyx coords + counts,
entirely under jit (no host round trip), so inference can run
points -> detections on-chip.  Sort-based grouping: XLA's TPU sort is
fast and static-shape; the scatter writes are single `.at[]` ops that
XLA fuses.

Semantic parity with the host voxelizer / reference C++
``VoxelGeneratorV2`` (second/builder/voxel_builder.py:23-32):
first-come-first-serve voxel order is approximated by stable-sorting on
voxel id — voxel ordering differs (sorted by linear id instead of first
occurrence) but the voxel SET, per-voxel point sets and in-voxel point
order are identical, INCLUDING at max_voxels overflow: truncation keeps
the first-come voxels (by first-point arrival), exactly like the
reference — truncating the sorted order instead would silently drop a
spatially contiguous (low linear id) region.  Downstream consumers are
voxel-order-invariant (scatter by coordinate).
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid_size", "max_voxels", "max_points_per_voxel", "full_mean"
    ),
)
def voxelize(points,
             num_points,
             voxel_size,
             range_min,
             grid_size,
             max_voxels,
             max_points_per_voxel,
             full_mean=False):
    """Voxelize a padded point buffer.

    Args:
        points: [N, f] float array (first 3 features are xyz); rows
            >= num_points are padding.
        num_points: scalar int, number of valid rows.
        voxel_size: [3] xyz metric voxel size.
        range_min: [3] xyz metric lower corner.
        grid_size: static (nx, ny, nz) tuple.
        max_voxels: static voxel capacity V.
        max_points_per_voxel: static T.
        full_mean: fill empty slots with the voxel mean.

    Returns:
        voxels: [V, T, f]; coords: [V, 3] int32 zyx (-1 padding);
        num_per_voxel: [V] int32; num_voxels: scalar int32.
    """
    n, nfeat = points.shape
    nx, ny, nz = grid_size
    t = max_points_per_voxel

    coords = jnp.floor(
        (points[:, :3] - jnp.asarray(range_min)) / jnp.asarray(voxel_size)
    ).astype(jnp.int32)  # xyz
    valid = (
        (jnp.arange(n) < num_points)
        & jnp.all(coords >= 0, axis=1)
        & jnp.all(coords < jnp.asarray(grid_size, dtype=jnp.int32), axis=1)
    )
    lin = coords[:, 0] + coords[:, 1] * nx + coords[:, 2] * (nx * ny)
    sentinel = nx * ny * nz  # invalid points sort last
    lin = jnp.where(valid, lin, sentinel)

    # stable sort by voxel id keeps in-voxel point order = incoming order
    order = jnp.argsort(lin, stable=True)
    lin_s = lin[order]
    pts_s = points[order]
    coords_s = coords[order]
    valid_s = valid[order]

    new_group = jnp.concatenate(
        [jnp.ones((1,), bool), lin_s[1:] != lin_s[:-1]]
    ) & valid_s
    idx = jnp.arange(n)
    # group start position (monotonic -> max-scan is exact)
    group_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new_group, idx, 0))
    slot = idx - group_start

    # FCFS truncation parity with the host C++ voxelizer: when the
    # scene overflows max_voxels, keep the voxels whose FIRST point
    # arrives earliest in the incoming point order (the reference's
    # point_cloud_ops semantics).  Truncating by sorted linear id
    # instead silently drops a spatially contiguous region.
    orig_idx = order
    first_fi = orig_idx[group_start]          # per point: own group's
    start_fi = jnp.where(new_group, orig_idx, n)
    if max_voxels < n:
        kth = jnp.sort(start_fi)[max_voxels - 1]
    else:
        kth = jnp.int32(n)
    keep_pt = valid_s & (first_fi <= kth)
    new_voxel = new_group & (start_fi <= kth)
    vrank = jnp.cumsum(new_voxel) - 1

    num_voxels = jnp.sum(new_voxel).astype(jnp.int32)
    write_ok = keep_pt & (vrank < max_voxels) & (slot < t)
    vr = jnp.where(write_ok, vrank, max_voxels)  # dump row
    sl = jnp.where(write_ok, slot, 0)

    voxels = jnp.zeros((max_voxels + 1, t, nfeat), dtype=points.dtype)
    voxels = voxels.at[vr, sl].set(
        jnp.where(write_ok[:, None], pts_s, 0.0), mode="drop"
    )
    # coords/counts have ONE writer per voxel (the group-start point):
    # duplicate-index scatters serialize on TPU (~8 cycles/conflicting
    # row), so write them from start points only.  The group length is
    # next_group_start - group_start via a reverse min-scan over ALL
    # group boundaries (truncation drops whole groups, not points).
    start_ok = new_voxel & (vrank < max_voxels)
    vr1 = jnp.where(start_ok, vrank, max_voxels)
    coords_zyx = coords_s[:, ::-1]
    coords_out = jnp.full((max_voxels + 1, 3), -1, dtype=jnp.int32)
    coords_out = coords_out.at[vr1].set(
        jnp.where(start_ok[:, None], coords_zyx, -1),
        mode="drop", unique_indices=True,
    )
    starts = jnp.where(new_group, idx, n)
    next_start = jnp.concatenate([
        jax.lax.associative_scan(jnp.minimum, starts, reverse=True)[1:],
        jnp.full((1,), n, starts.dtype)])
    # valid points sort first; the last group must not absorb the
    # invalid/padding tail
    n_valid = jnp.sum(valid_s)
    group_len = jnp.minimum(
        jnp.minimum(next_start, n_valid) - idx, t).astype(jnp.int32)
    counts = jnp.zeros((max_voxels + 1,), dtype=jnp.int32)
    counts = counts.at[vr1].set(
        jnp.where(start_ok, group_len, 0),
        mode="drop", unique_indices=True,
    )

    voxels, coords_out, counts = voxels[:-1], coords_out[:-1], counts[:-1]

    if full_mean:
        denom = jnp.maximum(counts[:, None, None], 1)
        means = voxels.sum(axis=1, keepdims=True) / denom
        filled = (
            jnp.arange(t).reshape(1, t, 1) < counts[:, None, None]
        )
        has_any = counts[:, None, None] > 0
        voxels = jnp.where(filled | ~has_any, voxels, means)

    return voxels, coords_out, counts, jnp.minimum(num_voxels, max_voxels)
