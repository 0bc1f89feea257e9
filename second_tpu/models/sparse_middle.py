"""Sparse 3D middle extractors (the SECOND middle network family).

Topology parity with the reference spconv middles
(second/pytorch/models/middle.py:110-642): stacks of submanifold convs
+ strided downsample convs, each Conv+BN(eps 1e-3, momentum .01)+ReLU,
ending with a dense reshape to a BEV pseudo-image.  Here the engine is
second_tpu.ops.sparse (static-capacity active sets, rulebook reuse
across subm convs = spconv's ``indice_key``), and the dense output is
NHWC [B, H, W, D*C].
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import sparse
from .layers import MaskedBatchNorm
from .registry import register_middle


def _t3(v):
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return (int(v),) * 3


def _group_topology(topology):
    """Split ops into per-scale groups (subm ops + closing down op)."""
    groups, cur = [], []
    for op in topology:
        cur.append(op)
        if op[0] == "down":
            groups.append(cur)
            cur = []
    if cur:
        groups.append(cur)
    return groups


def _out_capacity(cur_cap, factor):
    # multiples of 128: gather rows and GEMM M-dim stay lane/MXU-aligned
    return max(int(-(-cur_cap * factor // 128)) * 128, 128)


def _down_out_shape(shape, kernel, stride, pad):
    out = tuple(
        (shape[a] + 2 * pad[a] - kernel[a]) // stride[a] + 1
        for a in range(3))
    if any(s <= 0 for s in out):
        raise ValueError(
            f"strided sparse conv collapses grid {tuple(shape)} -> {out} "
            f"(kernel {kernel}, stride {stride}, pad {pad}): the input "
            "grid is too shallow for this topology")
    return out


def plan_scales(middle_class_name, output_shape, max_voxels):
    """Static per-scale planning info for HOST-side rulebook building
    (``second_tpu.native.sparse_plan``). Mirrors the grouping and
    capacity schedule of ``SparseMiddleBase.__call__`` exactly — the
    produced slot arrays index the same static active sets the device
    path would build.

    Returns a list of dicts: {"shape", "in_cap", "subm_kernels",
    "down": (kernel, stride, pad) | None, "out_cap", "out_shape"}.
    """
    from .registry import get_middle_class

    cls = get_middle_class(middle_class_name)
    nz, ny, nx = (int(v) for v in output_shape[1:4])
    shape = (nz + 1, ny, nx)
    cap = int(max_voxels)
    scales = []
    down_idx = 0
    for group in _group_topology(cls.topology):
        subm_kernels = []
        for op in group:
            if op[0] == "subm":
                kernel = _t3(op[2])
                if kernel not in subm_kernels:
                    subm_kernels.append(kernel)
        entry = {
            "shape": shape,
            "in_cap": cap,
            "subm_kernels": subm_kernels,
            "down": None,
            "out_cap": None,
            "out_shape": None,
            # dense-tail scales need no rulebooks at all (the convs run
            # as masked dense conv3d on device)
            "dense": (cls.dense_from_scale is not None
                      and len(scales) >= cls.dense_from_scale),
        }
        down_op = group[-1] if group[-1][0] == "down" else None
        if down_op is not None:
            kernel = _t3(down_op[2])
            stride = _t3(down_op[3])
            pad = _t3(down_op[4])
            factor = (
                cls.capacity_factors[down_idx]
                if down_idx < len(cls.capacity_factors) else 1.0)
            out_cap = _out_capacity(cap, factor)
            out_shape = _down_out_shape(shape, kernel, stride, pad)
            entry["down"] = (kernel, stride, pad)
            entry["out_cap"] = out_cap
            entry["out_shape"] = out_shape
            shape = out_shape
            cap = out_cap
            down_idx += 1
        scales.append(entry)
    return scales


def build_host_plan(coords, scales, return_counts=False, banded=False,
                    banded_cor_capacity=8192, banded_bwd=False):
    """Run the C++ planner over every scale. coords: [V, 3] int32 zyx
    sorted by linear id with -1 padding rows. Returns a flat dict of
    int32 arrays: plan_subm{i} [V_i, 27], plan_coords{i} [V_{i+1}, 3],
    plan_conv{i} [V_{i+1}, K].

    banded=True additionally emits the banded-kernel window metadata
    per scale under plan_bsub{i}_* / plan_bconv{i}_* keys
    (ops.banded_sparse.host_banded_arrays) — a few KB next to the
    rulebooks, which the banded kernel consumes directly.

    banded_bwd=True (training on banded kernels) also emits the
    TRANSPOSE rulebooks of the strided convs under plan_btcv{i}_* —
    the backward input-gradient is a banded conv over the transposed
    rulebook (subm plans self-transpose; see ops.banded_sparse).

    Overflow (true active count > static capacity at any stage — spconv
    itself never drops voxels) logs a loud warning with the remedy;
    return_counts=True additionally returns {scale: (true, cap)}.
    """
    from ..native import sparse_plan as native_plan
    from ..ops.sparse import _kernel_offsets

    if banded:
        from ..ops import banded_sparse

    def _slot_dtype(in_cap):
        # slot values are in [0, in_cap] (in_cap = miss/dump row);
        # uint16 halves the per-example H2D upload when it fits
        return np.uint16 if in_cap < 65535 else np.int32

    plan = {}
    counts = {}
    for i, sc in enumerate(scales):
        if sc.get("dense"):
            break  # dense-tail scales run as conv3d: no rulebooks
        shape = sc["shape"]
        if sc["subm_kernels"]:
            assert len(sc["subm_kernels"]) == 1, (
                "one subm kernel per scale expected")
            kernel = sc["subm_kernels"][0]
            pad = np.array([(kernel[0] - 1) // 2, (kernel[1] - 1) // 2,
                            (kernel[2] - 1) // 2])
            offs = _kernel_offsets(kernel) - pad
            subm_slots = native_plan.subm_plan(coords, shape, offs)
            plan[f"plan_subm{i}"] = subm_slots.astype(
                _slot_dtype(sc["in_cap"]))
            if banded:
                for name, a in banded_sparse.host_banded_arrays(
                        subm_slots, v_in=sc["in_cap"],
                        kx=banded_sparse.group_size(kernel),
                        cor_capacity=banded_cor_capacity).items():
                    plan[f"plan_bsub{i}_{name}"] = a
        if sc["down"] is not None:
            kernel, stride, padding = sc["down"]
            offs = _kernel_offsets(kernel)
            out_coords, conv_slots, total = native_plan.down_plan(
                coords, shape, kernel, stride, padding, offs,
                sc["out_cap"])
            counts[i] = (total, sc["out_cap"])
            if total > sc["out_cap"]:
                _warn_overflow(i, total, sc["out_cap"])
            plan[f"plan_coords{i}"] = out_coords
            plan[f"plan_conv{i}"] = conv_slots.astype(
                _slot_dtype(sc["in_cap"]))
            if banded:
                for name, a in banded_sparse.host_banded_arrays(
                        conv_slots, v_in=sc["in_cap"],
                        kx=banded_sparse.group_size(kernel),
                        cor_capacity=banded_cor_capacity).items():
                    plan[f"plan_bconv{i}_{name}"] = a
                if banded_bwd:
                    slots_t = banded_sparse.host_transpose_rulebook(
                        conv_slots, v_in=sc["in_cap"])
                    plan[f"plan_btcv{i}_slots"] = slots_t.astype(
                        _slot_dtype(sc["out_cap"]))
                    for name, a in banded_sparse.host_banded_arrays(
                            slots_t, v_in=sc["out_cap"],
                            kx=banded_sparse.group_size(kernel),
                            cor_capacity=banded_cor_capacity).items():
                        plan[f"plan_btcv{i}_{name}"] = a
            coords = out_coords
    if return_counts:
        return plan, counts
    return plan


_overflow_warned = set()


def _warn_overflow(scale_idx, total, cap):
    """Loud, once-per-scale warning: dropped voxels change detections
    silently otherwise (spconv never drops — middle.py:199-209)."""
    import logging

    key = scale_idx
    if key in _overflow_warned:
        return
    _overflow_warned.add(key)
    logging.getLogger(__name__).warning(
        "sparse active-set OVERFLOW at downsample stage %d: %d active "
        "voxels > static capacity %d — %d voxels DROPPED. Raise "
        "capacity_factors on the middle class (or lower "
        "max_number_of_voxels). Detections may be lost.",
        scale_idx, total, cap, total - cap)


# topology ops: ("subm", out_ch, kernel) | ("down", out_ch, kernel, stride, pad)
FHD_TOPOLOGY = (
    ("subm", 16, 3), ("subm", 16, 3),
    ("down", 32, 3, 2, 1),
    ("subm", 32, 3), ("subm", 32, 3),
    ("down", 64, 3, 2, 1),
    ("subm", 64, 3), ("subm", 64, 3), ("subm", 64, 3),
    ("down", 64, 3, 2, (0, 1, 1)),
    ("subm", 64, 3), ("subm", 64, 3), ("subm", 64, 3),
    ("down", 64, (3, 1, 1), (2, 1, 1), 0),
)

FHD_PEOPLE_TOPOLOGY = (
    ("subm", 16, 3), ("subm", 16, 3),
    ("down", 32, 3, 2, 1),
    ("subm", 32, 3), ("subm", 32, 3),
    ("down", 64, 3, 2, (0, 1, 1)),
    ("subm", 64, 3), ("subm", 64, 3), ("subm", 64, 3),
    ("down", 64, (3, 1, 1), (2, 1, 1), 0),
)

FHD_LITE_TOPOLOGY = (
    ("down", 16, 3, 2, 1),
    ("down", 32, 3, 2, 1),
    ("down", 64, 3, 2, (0, 1, 1)),
    ("down", 64, (3, 1, 1), (2, 1, 1), 0),
)

# taller-z (HRZ) variants: 5 downsamples (middle.py:485-642)
FHD_LITE_HRZ_TOPOLOGY = (
    ("down", 32, 3, 2, 1),
    ("down", 64, 3, 2, 1),
    ("down", 64, 3, 2, 1),
    ("down", 64, (3, 1, 1), (2, 1, 1), 0),
    ("down", 64, (3, 1, 1), (2, 1, 1), 0),
)

FHD_HRZ_TOPOLOGY = (
    ("subm", 16, 3), ("subm", 16, 3),
    ("down", 32, 3, 2, 1),
    ("subm", 32, 3), ("subm", 32, 3),
    ("down", 64, 3, 2, 1),
    ("subm", 64, 3), ("subm", 64, 3),
    ("down", 64, 3, 2, 1),
    ("subm", 64, 3), ("subm", 64, 3),
    ("down", 64, (3, 1, 1), (2, 1, 1), 0),
    ("subm", 64, 3), ("subm", 64, 3),
    ("down", 64, (3, 1, 1), (2, 1, 1), 0),
)

# 2k-resolution variant: extra 8-channel stage up front (middle.py:301-415)
MIDDLE_2K_TOPOLOGY = (
    ("subm", 8, 3), ("subm", 8, 3),
    ("down", 16, 3, 2, 1),
    ("subm", 16, 3), ("subm", 16, 3),
    ("down", 32, 3, 2, 1),
    ("subm", 32, 3), ("subm", 32, 3),
    ("down", 64, 3, 2, 1),
    ("subm", 64, 3), ("subm", 64, 3), ("subm", 64, 3),
    ("down", 64, 3, 2, (0, 1, 1)),
    ("subm", 64, 3), ("subm", 64, 3), ("subm", 64, 3),
    ("down", 64, (3, 1, 1), (2, 1, 1), 0),
)


class SparseMiddleBase(nn.Module):
    """Shared engine; subclasses set ``topology``."""

    output_shape: Sequence[int]  # [1, nz, ny, nx, C]
    use_norm: bool = True
    num_input_features: int = 128
    num_filters_down1: Sequence[int] = (64,)
    num_filters_down2: Sequence[int] = (64, 64)
    topology: Tuple = FHD_TOPOLOGY
    compute_dtype: str = None
    # Inference fast path: run every conv through the banded one-hot
    # gather-GEMM Pallas kernel (ops.banded_sparse) instead of the XLA
    # row-gather path — the gather happens on the MXU.  Training always
    # uses the XLA path (the kernel defines no VJP).
    use_banded: bool = False
    banded_cor_capacity: int = 8192
    # Dense tail: from this scale index on, run the convs as plain XLA
    # dense conv3d over the scattered grid instead of sparse gathers.
    # The deep scales are small and >15% occupied (car.fhd scale 3:
    # [5, 200, 176] at ~18%), where a masked dense conv is several
    # times faster than any gather formulation AND exact: subm conv ==
    # mask * conv(masked features) because inactive inputs are zero;
    # strided conv == conv (untouched outputs are zero), with the TRUE
    # dilated active set (no capacity truncation) recovered by
    # convolving the occupancy mask.  None = never densify.
    dense_from_scale: int = None
    # Static active-set capacity multiplier per downsample stage.
    # IMPORTANT: spconv's strided conv DILATES the active set (every
    # output whose kernel window touches an input is active,
    # middle.py:199-209 semantics): measured on KITTI-scale scenes
    # (~17k input voxels, car.fhd grid) the per-stage TRUE ratios are
    # ~2.9x, ~1.05x, ~0.56x, ~0.9x.  Factors are sized above those with
    # headroom; overflow (true count > capacity) drops voxels and is
    # surfaced via the host planner's warning (build_host_plan) and the
    # "intermediates" sow'd active counts on the device path — raise
    # these factors if it ever fires.
    capacity_factors: Tuple = (3.25, 1.05, 0.56, 0.88)

    @nn.compact
    def __call__(self, voxel_features, coords, train=False, plan=None):
        """plan: optional flat dict from :func:`build_host_plan` — host
        C++-built rulebooks/active sets (batched [B, ...]); when given,
        no device-side hash/sort work runs at all."""
        nz, ny, nx = (int(v) for v in self.output_shape[1:4])
        # spconv pads z by 1 (middle.py:140: sparse_shape = grid + [1,0,0])
        sparse_shape = (nz + 1, ny, nx)
        if self.compute_dtype is not None:
            voxel_features = voxel_features.astype(self.compute_dtype)
        if plan is not None:
            grid = sparse.from_sorted_voxel_coords(
                voxel_features, coords, sparse_shape)
        else:
            grid = sparse.from_voxel_coords(
                voxel_features, coords, sparse_shape)

        # Group the topology per scale (subm ops + the closing strided
        # conv): the active set is feature-independent, so all neighbor
        # lookups of a scale — every subm kernel's rulebook AND the
        # strided conv's input slots — are answered by ONE dense index
        # grid build (sparse.lookup_many) instead of one per op kind.
        groups, cur = [], []
        for op in self.topology:
            cur.append(op)
            if op[0] == "down":
                groups.append(cur)
                cur = []
        if cur:
            groups.append(cur)

        cin = self.num_input_features
        li = 0
        down_idx = 0
        dense_feats = None  # set once the dense tail starts
        dense_mask = None   # bool [B, D, H, W] active-site occupancy
        for scale_idx, group in enumerate(groups):
            if (self.dense_from_scale is not None
                    and scale_idx >= self.dense_from_scale):
                if dense_feats is None:
                    # tail layout: [B, H, W, D, C] — the convs run as
                    # z-folded 2D convs over [B, H, W, D*C]
                    dense_feats = sparse.to_dense(grid).transpose(
                        0, 2, 3, 1, 4)
                    ones = jnp.ones_like(grid.features[..., :1])
                    dense_mask = sparse.to_dense(
                        grid._replace(features=ones))[..., 0].transpose(
                            0, 2, 3, 1) > 0  # [B, H, W, D]
                dense_feats, dense_mask, cin, li = self._dense_group(
                    group, dense_feats, dense_mask, cin, li, train)
                down_idx += 1 if group[-1][0] == "down" else 0
                continue
            subm_kernels = []
            for op in group:
                if op[0] == "subm":
                    kernel = _t3(op[2])
                    if kernel not in subm_kernels:
                        subm_kernels.append(kernel)
            down_op = group[-1] if group[-1][0] == "down" else None
            b, v = grid.lin.shape

            if plan is not None:
                rulebooks = {}
                if subm_kernels:
                    slots = plan[f"plan_subm{scale_idx}"]
                    for kernel in subm_kernels:
                        rulebooks[kernel] = (slots, None)
                out_grid = None
                down_slots = None
                if down_op is not None:
                    kernel_d = _t3(down_op[2])
                    stride_d = _t3(down_op[3])
                    pad_d = _t3(down_op[4])
                    out_shape = _down_out_shape(
                        grid.shape, kernel_d, stride_d, pad_d)
                    ocoords = plan[f"plan_coords{scale_idx}"]
                    out_grid = sparse.from_sorted_voxel_coords(
                        jnp.zeros(
                            (b, ocoords.shape[1], 1), grid.features.dtype),
                        ocoords, out_shape)
                    down_slots = plan[f"plan_conv{scale_idx}"]
                    down_idx += 1
            else:
                queries = []
                for kernel in subm_kernels:
                    qlin, qok, _ = sparse.subm_queries(grid, kernel)
                    queries.append((qlin, qok))
                out_grid = None
                if down_op is not None:
                    _, _, kernel_d, stride_d, pad_d = down_op
                    kernel_d = _t3(kernel_d)
                    stride_d = _t3(stride_d)
                    pad_d = _t3(pad_d)
                    factor = (
                        self.capacity_factors[down_idx]
                        if down_idx < len(self.capacity_factors) else 1.0)
                    cur_cap = grid.lin.shape[-1]
                    out_cap = _out_capacity(cur_cap, factor)
                    down_idx += 1
                    out_grid, true_count = sparse.downsample_active_set(
                        grid, kernel_d, stride_d, pad_d,
                        out_capacity=out_cap, return_count=True)
                    # overflow observability (host path warns in
                    # build_host_plan): true vs capacity per stage,
                    # readable via mutable=["intermediates"]
                    self.sow(
                        "intermediates", f"active_scale{scale_idx}",
                        jnp.stack([true_count,
                                   jnp.full_like(true_count, out_cap)],
                                  axis=-1))
                    dlin, dok, _ = sparse.sparse_conv_queries(
                        grid, out_grid, kernel_d, stride_d, pad_d)
                    queries.append((dlin, dok))
                results = sparse.lookup_many(
                    grid.lin, queries, grid.sentinel)
                rulebooks = {}
                for kernel, (slots, found) in zip(subm_kernels, results):
                    k = int(np.prod(kernel))
                    rulebooks[kernel] = (
                        slots.reshape(b, v, k), found.reshape(b, v, k))
                down_slots = None
                if down_op is not None:
                    slots, _ = results[-1]
                    kd = int(np.prod(_t3(down_op[2])))
                    down_slots = slots.reshape(
                        b, out_grid.lin.shape[-1], kd)

            # Banded one-hot gather-GEMM kernels (inference AND
            # training: banded_conv defines a custom VJP — subm plans
            # self-transpose; strided convs get a transpose plan).
            # The banded plan depends only on the rulebook, so it is
            # built once per scale and shared by every conv on the set.
            banded = self.use_banded
            if banded:
                from ..ops import banded_sparse

                def _host_or_device(prefix, slots_found, v_in, kx,
                                    vout):
                    """Prefer host-emitted banded metadata (free:
                    built in dataloader workers next to the rulebook);
                    fall back to the on-device builder (a handful of
                    reductions)."""
                    s_kf, f_kf = slots_found
                    if plan is not None and f"{prefix}_bidx" in plan:
                        return banded_sparse.plan_from_host(
                            s_kf, plan[f"{prefix}_bidx"],
                            plan[f"{prefix}_hit"], plan[f"{prefix}_cor"],
                            plan[f"{prefix}_cor_count"],
                            v_in=v_in, kx=kx, vout=vout, found=f_kf)
                    return banded_sparse.build_banded_plan(
                        s_kf, f_kf, v_in=v_in, kx=kx,
                        cor_capacity=self.banded_cor_capacity)

                banded_subm = {}
                for kernel in subm_kernels:
                    banded_subm[kernel] = _host_or_device(
                        f"plan_bsub{scale_idx}", rulebooks[kernel],
                        v_in=v, kx=banded_sparse.group_size(kernel),
                        vout=v)
                banded_down = None
                banded_down_bwd = None
                if down_op is not None:
                    kx_d = banded_sparse.group_size(_t3(down_op[2]))
                    vout_d = out_grid.lin.shape[-1]
                    banded_down = _host_or_device(
                        f"plan_bconv{scale_idx}",
                        (down_slots, None), v_in=v,
                        kx=kx_d, vout=vout_d)
                    if train:
                        # transpose plan for the strided backward
                        prefix = f"plan_btcv{scale_idx}"
                        if plan is not None and f"{prefix}_bidx" in plan:
                            banded_down_bwd = banded_sparse.plan_from_host(
                                plan[f"{prefix}_slots"],
                                plan[f"{prefix}_bidx"],
                                plan[f"{prefix}_hit"],
                                plan[f"{prefix}_cor"],
                                plan[f"{prefix}_cor_count"],
                                v_in=vout_d, kx=kx_d, vout=v)
                        else:
                            slots_t = banded_sparse.transpose_rulebook(
                                down_slots.astype(jnp.int32), v_in=v)
                            banded_down_bwd = banded_sparse.build_banded_plan(
                                slots_t, None, v_in=vout_d, kx=kx_d,
                                cor_capacity=self.banded_cor_capacity)
                    self.sow(
                        "intermediates", f"banded_cor_scale{scale_idx}",
                        banded_down.cor_count)
                    if banded_down_bwd is not None:
                        # "counted, never silent": the transpose plan has
                        # its own correction list — overflow there drops
                        # input-gradient contributions
                        self.sow(
                            "intermediates",
                            f"banded_cor_bwd_scale{scale_idx}",
                            banded_down_bwd.cor_count)

            for op in group:
                if op[0] == "subm":
                    _, cout, kernel = op
                    kernel = _t3(kernel)
                    k = int(np.prod(kernel))
                    w = self.param(
                        f"subm{li}_w",
                        nn.initializers.variance_scaling(
                            1.0, "fan_in", "normal"),
                        (k, cin, cout))
                    bias = (
                        None if self.use_norm else self.param(
                            f"subm{li}_b", nn.initializers.zeros, (cout,)))
                    if self.compute_dtype is not None:
                        w = w.astype(self.compute_dtype)
                    if banded:
                        feats = banded_sparse.banded_conv(
                            grid.features, banded_subm[kernel], w, bias)
                        feats = jnp.where(
                            grid.valid[..., None], feats, 0.0)
                        grid = grid._replace(features=feats)
                    else:
                        grid = sparse.subm_conv(
                            grid, rulebooks[kernel], w, bias)
                else:
                    _, cout, kernel, stride, pad = op
                    kernel = _t3(kernel)
                    k = int(np.prod(kernel))
                    w = self.param(
                        f"down{li}_w",
                        nn.initializers.variance_scaling(
                            1.0, "fan_in", "normal"),
                        (k, cin, cout))
                    bias = (
                        None if self.use_norm else self.param(
                            f"down{li}_b", nn.initializers.zeros, (cout,)))
                    if self.compute_dtype is not None:
                        w = w.astype(self.compute_dtype)
                    if banded:
                        feats = banded_sparse.banded_conv(
                            grid.features, banded_down, w, bias,
                            bwd_plan=banded_down_bwd)
                        feats = jnp.where(
                            out_grid.valid[..., None], feats, 0.0)
                        grid = out_grid._replace(features=feats)
                    else:
                        grid = sparse.sparse_conv_apply(
                            grid, out_grid, down_slots, w, bias)
                if self.use_norm:
                    feats = MaskedBatchNorm(name=f"bn{li}")(
                        grid.features, mask=grid.valid,
                        use_running_average=not train)
                else:
                    feats = grid.features
                feats = nn.relu(feats)
                feats = jnp.where(grid.valid[..., None], feats, 0.0)
                grid = grid._replace(features=feats)
                cin = cout
                li += 1

        # NHWC pseudo-image with channel index c*D + d (matches the
        # reference's view(N, C*D, H, W) channel order, middle.py:206-209)
        if dense_feats is None:
            dense = sparse.to_dense(grid)  # [B, D, H, W, C]
            b, d, h, w_, c = dense.shape
            return dense.transpose(0, 2, 3, 4, 1).reshape(b, h, w_, c * d)
        b, h, w_, d, c = dense_feats.shape
        return dense_feats.transpose(0, 1, 2, 4, 3).reshape(b, h, w_, c * d)

    @staticmethod
    def _zfold_weight(w3, kernel, d_in, stride_z, pad_z):
        """Fold the z-extent of a 3D conv into channels: w3
        [kz*ky*kx, Cin, Cout] -> ([ky, kx, d_in*Cin, d_out*Cout],
        d_out).  conv2d over [B, H, W, D*C] with this weight equals
        conv3d over [B, D, H, W, C]: XLA's conv3d lowering measured
        17 TF/s on the chip while the folded 2D conv (C >= 256) runs
        near MXU peak despite the embedded zeros (tools/bench_zfold.py,
        tools/bench_gemm_conv.py)."""
        kz, ky, kxx = kernel
        k, cin, cout = w3.shape
        w3r = w3.reshape(kz, ky, kxx, cin, cout)
        d_out = (d_in + 2 * pad_z - kz) // stride_z + 1
        w2 = jnp.zeros((ky, kxx, d_in * cin, d_out * cout), w3.dtype)
        for do in range(d_out):
            for dz in range(kz):
                di = stride_z * do + dz - pad_z
                if 0 <= di < d_in:
                    w2 = w2.at[:, :, di * cin:(di + 1) * cin,
                               do * cout:(do + 1) * cout].set(w3r[dz])
        return w2, d_out

    def _dense_group(self, group, feats, mask, cin, li, train):
        """One scale's ops as masked z-folded 2D convs (the dense
        tail).

        feats [B, H, W, D, C]; mask bool [B, H, W, D] — the active set.
        Exactness vs the sparse path: inactive features are zero, so
        conv(feats) equals spconv's value at every active output;
        subm outputs are re-masked to the input active set (spconv's
        output set == input set); strided convs compute the TRUE
        dilated active set by convolving the mask (any touched window,
        middle.py:199-209 semantics — no capacity truncation here).
        """
        dtype = feats.dtype
        for op in group:
            if op[0] == "subm":
                _, cout, kernel = op
                kernel = _t3(kernel)
                stride = (1, 1, 1)
                pad = tuple((kernel[a] - 1) // 2 for a in range(3))
                is_subm = True
            else:
                _, cout, kernel, stride, pad = op
                kernel = _t3(kernel)
                stride = _t3(stride)
                pad = _t3(pad)
                is_subm = False
            k = int(np.prod(kernel))
            prefix = "subm" if is_subm else "down"
            w = self.param(
                f"{prefix}{li}_w",
                nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                (k, cin, cout))
            bias = (None if self.use_norm else self.param(
                f"{prefix}{li}_b", nn.initializers.zeros, (cout,)))
            if self.compute_dtype is not None:
                w = w.astype(self.compute_dtype)
            b, h, wd, d, _ = feats.shape
            w2, d_out = self._zfold_weight(
                w, kernel, d, stride[0], pad[0])
            padding = [(int(pad[1]),) * 2, (int(pad[2]),) * 2]
            out = jax.lax.conv_general_dilated(
                feats.reshape(b, h, wd, d * cin), w2,
                window_strides=(stride[1], stride[2]), padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(dtype)
            out = out.reshape(out.shape[:3] + (d_out, cout))
            if bias is not None:
                out = out + bias
            if is_subm:
                out = jnp.where(mask[..., None], out, 0.0)
            else:
                # dilated active set = any output whose window touches
                # an active input (exact spconv strided semantics)
                w2m, _ = self._zfold_weight(
                    jnp.ones((k, 1, 1), jnp.float32), kernel, d,
                    stride[0], pad[0])
                mconv = jax.lax.conv_general_dilated(
                    mask.astype(jnp.float32), w2m,
                    window_strides=(stride[1], stride[2]),
                    padding=padding,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                mask = mconv > 0.5
            if self.use_norm:
                out = MaskedBatchNorm(name=f"bn{li}")(
                    out, mask=mask, use_running_average=not train)
            out = nn.relu(out)
            feats = jnp.where(mask[..., None], out, 0.0)
            cin = cout
            li += 1
        return feats, mask, cin, li


@register_middle
class SpMiddleFHD(SparseMiddleBase):
    """The SECOND FHD middle net (middle.py:110-210): 4 downsample
    stages [41, 1600, 1408] -> [2, 200, 176], channels 16->32->64.

    dense_from_scale=3: the last subm stack + down run on the scattered
    [5, 200, 176] grid (~18% occupied on KITTI scenes) as masked dense
    convs — measured several times faster than the banded gather there.
    """

    topology: Tuple = FHD_TOPOLOGY
    dense_from_scale: int = 3


@register_middle
class SpMiddleFHDPeople(SparseMiddleBase):
    """3-stage variant for pedestrian/cyclist grids (middle.py:212-299)."""

    topology: Tuple = FHD_PEOPLE_TOPOLOGY
    capacity_factors: Tuple = (3.25, 1.1, 1.0)


@register_middle
class SpMiddleFHDLite(SparseMiddleBase):
    """Downsample-only lite variant (middle.py:417-485)."""

    topology: Tuple = FHD_LITE_TOPOLOGY


@register_middle
class SpMiddleFHDLiteHRZ(SparseMiddleBase):
    """Downsample-only, taller-z grid (middle.py:485-553)."""

    topology: Tuple = FHD_LITE_HRZ_TOPOLOGY
    capacity_factors: Tuple = (3.25, 1.05, 0.6, 0.95, 0.95)


@register_middle
class SpMiddleFHDHRZ(SparseMiddleBase):
    """FHD with 5 downsample stages for taller z (middle.py:554-642)."""

    topology: Tuple = FHD_HRZ_TOPOLOGY
    capacity_factors: Tuple = (3.25, 1.05, 0.6, 0.95, 0.95)


@register_middle
class SpMiddle2K(SparseMiddleBase):
    """2k-resolution middle with an 8-channel full-res stage
    (middle.py:301-415)."""

    topology: Tuple = MIDDLE_2K_TOPOLOGY
    capacity_factors: Tuple = (3.25, 1.1, 1.1, 0.7, 0.9)


# middle class names eligible for host-side sparse-conv planning
SPARSE_MIDDLE_NAMES = frozenset({
    "SpMiddleFHD", "SpMiddleFHDPeople", "SpMiddleFHDLite",
    "SpMiddleFHDLiteHRZ", "SpMiddleFHDHRZ", "SpMiddle2K",
})
