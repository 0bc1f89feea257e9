"""Flat-point PointPillars inference path (TPU fast path).

The reference pillar layout materializes a ``[V, T, F]`` buffer
(12000 x 100 slots for ~16k points = 97% padding) and runs the PFN
over every slot (reference second/pytorch/models/pointpillars.py:17-66
+ voxelization in second/core/point_cloud/point_cloud_ops.py).  On TPU
that buffer dominates the frame: the e2e breakdown puts voxelize+PFN
at ~12 of 17 ms/frame at batch 2.

This module keeps the points FLAT: sort by pillar id once, run the PFN
as a pointwise [N, C] matmul, and reduce per pillar with
segment-max — ~37x less PFN compute and no [V, T, F] buffer.

Exact parity with the module path (inference):
  * decoration (cluster/center offsets + variants) computed from
    per-pillar scatter means;
  * the reference's padded slots contribute ``relu(BN(0))`` to the
    per-pillar max (pointpillars.py:52-66 keeps all T slots); pillars
    with count < T max with exactly that per-channel constant here;
  * BatchNorm uses running statistics (inference), so it is a
    per-channel affine — no batch-statistic divergence.

Used by bench.py and InferenceContext for the PillarFeatureNet family;
training and the parity oracle keep the module path
(models/voxel_encoders.py).
"""

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.jit,
    static_argnames=("grid_size", "max_voxels", "max_points_per_voxel"))
def flat_pillarize(points, num_points, voxel_size, range_min, grid_size,
                   max_voxels, max_points_per_voxel=None):
    """Sort a padded point buffer by pillar id (no [V, T, F] buffer).

    Returns: pts_s [N, F] (sorted), coords_pt [N, 3] int32 xyz
    (per-point pillar coords), vrank [N] int32 (pillar index,
    max_voxels = dump), pillar_coords [V, 3] int32 zyx (-1 padding),
    counts [V] int32, num_voxels scalar.
    """
    n, _ = points.shape
    nx, ny, nz = grid_size

    coords = jnp.floor(
        (points[:, :3] - jnp.asarray(range_min)) / jnp.asarray(voxel_size)
    ).astype(jnp.int32)
    valid = (
        (jnp.arange(n) < num_points)
        & jnp.all(coords >= 0, axis=1)
        & jnp.all(coords < jnp.asarray(grid_size, jnp.int32), axis=1)
    )
    lin = coords[:, 0] + coords[:, 1] * nx + coords[:, 2] * (nx * ny)
    sentinel = nx * ny * nz
    lin = jnp.where(valid, lin, sentinel)

    order = jnp.argsort(lin, stable=True)
    lin_s = lin[order]
    pts_s = points[order]
    # coords/validity need no extra row-gathers: validity is encoded in
    # the sort key (invalid -> sentinel) and coords are a deterministic
    # elementwise function of the points
    valid_s = lin_s < sentinel
    coords_s = jnp.where(
        valid_s[:, None],
        jnp.floor((pts_s[:, :3] - jnp.asarray(range_min))
                  / jnp.asarray(voxel_size)).astype(jnp.int32),
        -1)

    new_group = jnp.concatenate(
        [jnp.ones((1,), bool), lin_s[1:] != lin_s[:-1]]
    ) & valid_s
    idx = jnp.arange(n)
    group_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new_group, idx, 0))
    # FCFS truncation parity with the host voxelizer (see
    # ops/voxelize.py): on overflow keep the earliest-arriving pillars,
    # not the lowest linear ids (which drops a contiguous region)
    first_fi = order[group_start]
    start_fi = jnp.where(new_group, order, n)
    if max_voxels < n:
        kth = jnp.sort(start_fi)[max_voxels - 1]
    else:
        kth = jnp.int32(n)
    keep_pt = valid_s & (first_fi <= kth)
    new_voxel = new_group & (start_fi <= kth)
    vrank = jnp.cumsum(new_voxel) - 1
    num_voxels = jnp.sum(new_voxel).astype(jnp.int32)
    ok = keep_pt & (vrank < max_voxels)
    if max_points_per_voxel is not None:
        # FCFS slot cap: parity with the voxelizer's T-point truncation
        # (ops/voxelize.py slot < t) — overfull pillars drop the
        # latest-arriving points instead of feeding them all to the PFN
        ok = ok & (idx - group_start < max_points_per_voxel)
    vr = jnp.where(ok, vrank, max_voxels).astype(jnp.int32)

    start_ok = new_voxel & (vrank < max_voxels)
    vr1 = jnp.where(start_ok, vrank, max_voxels)
    pillar_coords = jnp.full((max_voxels + 1, 3), -1, jnp.int32)
    pillar_coords = pillar_coords.at[vr1].set(
        jnp.where(start_ok[:, None], coords_s[:, ::-1], -1),
        mode="drop", unique_indices=True)
    starts = jnp.where(new_group, idx, n)
    next_start = jnp.concatenate([
        jax.lax.associative_scan(jnp.minimum, starts, reverse=True)[1:],
        jnp.full((1,), n, starts.dtype)])
    n_valid = jnp.sum(valid_s)
    group_len = (jnp.minimum(next_start, n_valid) - idx).astype(jnp.int32)
    if max_points_per_voxel is not None:
        # counts feed the cluster-mean denominator and the padded-slot
        # check downstream; cap like voxelize.py caps num_points
        group_len = jnp.minimum(group_len, max_points_per_voxel)
    counts = jnp.zeros((max_voxels + 1,), jnp.int32)
    counts = counts.at[vr1].set(
        jnp.where(start_ok, group_len, 0),
        mode="drop", unique_indices=True)

    return (pts_s, coords_s, vr, pillar_coords[:-1], counts[:-1],
            jnp.minimum(num_voxels, max_voxels))


def _affine_from_bn(bn_params, bn_stats, eps=1e-3):
    """Inference BatchNorm as y = x * k + b."""
    k = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    b = bn_params["bias"] - bn_stats["mean"] * k
    return k, b


def flat_pfn_bev(variables, pts_s, coords_pt, vrank, pillar_coords,
                 counts, *, num_filters: Sequence[int],
                 max_points_per_voxel: int,
                 voxel_size, pc_range, grid_size,
                 num_input_features=4,
                 radius=False, height=False, center_replaces_xy=False,
                 with_distance=False):
    """Flat PFN + BEV canvas scatter using the PillarFeatureNet params
    (voxel_feature_extractor/PFNLayer_i/...). Returns [ny, nx, C]."""
    vfe_p = variables["params"]["voxel_feature_extractor"]
    vfe_s = variables["batch_stats"]["voxel_feature_extractor"]
    v = pillar_coords.shape[0]
    t_cap = max_points_per_voxel
    dtype = pts_s.dtype
    n = pts_s.shape[0]

    valid = vrank < v
    vm = valid.astype(dtype)[:, None]
    vr = jnp.where(valid, vrank, v)

    # per-pillar xyz mean (cluster offsets)
    sums = jnp.zeros((v + 1, 3), jnp.float32).at[vr].add(
        jnp.where(valid[:, None], pts_s[:, :3].astype(jnp.float32), 0.0),
        mode="drop")
    denom = jnp.maximum(counts, 1).astype(jnp.float32)
    means = (sums[:-1] / denom[:, None]).astype(dtype)
    f_cluster = (pts_s[:, :3] - means[jnp.clip(vr, 0, v - 1)]) * vm

    vx, vy = float(voxel_size[0]), float(voxel_size[1])
    x_off = vx / 2 + float(pc_range[0])
    y_off = vy / 2 + float(pc_range[1])
    px = coords_pt[:, 0].astype(dtype) * vx + x_off
    py = coords_pt[:, 1].astype(dtype) * vy + y_off
    f_center = jnp.stack(
        [pts_s[:, 0] - px, pts_s[:, 1] - py], axis=-1) * vm

    base = pts_s[:, :num_input_features]
    if radius:
        r = jnp.linalg.norm(pts_s[:, :2], axis=-1, keepdims=True)
        base = jnp.concatenate([r, pts_s[:, 2:num_input_features]], -1)
    elif center_replaces_xy:
        base = jnp.concatenate(
            [f_center, pts_s[:, 2:num_input_features]], -1)
    feats = [base * vm, f_cluster, f_center]
    if height:
        zmax = jnp.full((v + 1,), -1e9, jnp.float32).at[vr].max(
            jnp.where(valid, pts_s[:, 2].astype(jnp.float32), -1e9),
            mode="drop")[:-1]
        zmin = jnp.full((v + 1,), 1e9, jnp.float32).at[vr].min(
            jnp.where(valid, pts_s[:, 2].astype(jnp.float32), 1e9),
            mode="drop")[:-1]
        # module-path quirk: padded T slots are ZERO and join min/max
        # for non-full pillars (voxel_encoders.py height block)
        part = counts < t_cap
        zmax = jnp.where(part, jnp.maximum(zmax, 0.0), zmax)
        zmin = jnp.where(part, jnp.minimum(zmin, 0.0), zmin)
        dz = (zmax - zmin).astype(dtype)
        feats.append((dz[jnp.clip(vr, 0, v - 1)] * vm[:, 0])[:, None])
    if with_distance:
        feats.append(
            jnp.linalg.norm(pts_s[:, :3], axis=-1, keepdims=True) * vm)
    x = jnp.concatenate(feats, axis=-1)

    nf = list(num_filters)
    pooled = None
    for i, out in enumerate(nf):
        last = i == len(nf) - 1
        units = out if last else out // 2
        layer = vfe_p[f"PFNLayer_{i}"]["LinearBNReLU_0"]
        stats = vfe_s[f"PFNLayer_{i}"]["LinearBNReLU_0"][
            "MaskedBatchNorm_0"]
        w = layer["Dense_0"]["kernel"].astype(dtype)
        k, b = _affine_from_bn(layer["MaskedBatchNorm_0"], stats)
        y = jnp.maximum((x @ w) * k.astype(dtype) + b.astype(dtype), 0.0)
        # the module path's padded T slots carry relu(BN(Dense(0)));
        # they join the max for every non-full pillar
        pad_val = jnp.maximum(b, 0.0).astype(dtype)
        seg = jnp.full((v + 1, units), -1e9, dtype).at[vr].max(
            jnp.where(valid[:, None], y, -1e9), mode="drop")[:-1]
        seg = jnp.where(
            (counts < t_cap)[:, None], jnp.maximum(seg, pad_val), seg)
        seg = jnp.where((counts > 0)[:, None], seg, 0.0)
        if last:
            pooled = seg
        else:
            x = jnp.concatenate([y, seg[jnp.clip(vr, 0, v - 1)]], -1)

    # BEV canvas (PointPillarsScatter semantics, models/middle.py:16)
    nx_, ny_, _ = grid_size
    flat_idx = jnp.where(
        pillar_coords[:, 0] >= 0,
        pillar_coords[:, 1] * nx_ + pillar_coords[:, 2],
        ny_ * nx_ + jnp.arange(v))  # unique dump slots: no scatter dups
    canvas = jnp.zeros((ny_ * nx_ + v, pooled.shape[-1]), dtype)
    canvas = canvas.at[flat_idx].set(
        pooled, mode="drop", unique_indices=True)
    return canvas[:ny_ * nx_].reshape(ny_, nx_, pooled.shape[-1])


def pointpillars_infer(variables, net, spec, predict_fn, anchors_b,
                       points, num_points, *, gen, model_cfg,
                       max_voxels, predict_example=None):
    """points [B, N, F] -> detections via the flat pillar path.

    gen: voxel generator; model_cfg: schema.VoxelNet (for the VFE
    class/filters); predict_fn: models.voxelnet.predict.
    predict_example: extra fields for predict (anchors_mask, ...);
    "anchors" is taken from anchors_b.
    """
    vfe_name = model_cfg.voxel_feature_extractor.module_class_name
    flags = dict(
        radius="Radius" in vfe_name,
        height="Height" in vfe_name,
        center_replaces_xy=vfe_name.endswith("Old"),
        with_distance=model_cfg.voxel_feature_extractor.with_distance,
    )
    grid = tuple(int(x) for x in gen.grid_size)
    vs = tuple(float(x) for x in gen.voxel_size)
    rmin = tuple(float(x) for x in gen.point_cloud_range[:3])
    nf = tuple(int(x)
               for x in model_cfg.voxel_feature_extractor.num_filters)

    def one(p, np_):
        pts_s, cpt, vr, pcoords, counts, _ = flat_pillarize(
            p, np_, vs, rmin, grid_size=grid, max_voxels=max_voxels,
            max_points_per_voxel=int(gen.max_num_points_per_voxel))
        return flat_pfn_bev(
            variables, pts_s, cpt, vr, pcoords, counts,
            num_filters=nf,
            max_points_per_voxel=int(gen.max_num_points_per_voxel),
            voxel_size=vs, pc_range=tuple(gen.point_cloud_range),
            grid_size=grid,
            num_input_features=int(model_cfg.num_point_features),
            **flags)

    bev = jax.vmap(one)(points, num_points)
    preds = net.apply(variables, bev,
                      method=lambda m, x: m.rpn(x, train=False))
    b = bev.shape[0]
    flat = {
        "box_preds": preds["box_preds"].reshape(b, -1, spec.box_code_size),
        "cls_preds": preds["cls_preds"].reshape(
            b, -1,
            spec.num_class if spec.encode_background_as_zeros
            else spec.num_class + 1),
    }
    if "dir_cls_preds" in preds:
        flat["dir_cls_preds"] = preds["dir_cls_preds"].reshape(
            b, -1, spec.num_direction_bins)
    ex = dict(predict_example or {})
    ex["anchors"] = anchors_b
    return predict_fn(spec, flat, ex)
