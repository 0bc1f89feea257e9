"""Pallas TPU kernel: pairwise rotated-rectangle intersection / IoU.

The NMS hot kernel.  The jnp formulation materializes [N*K, 4, 4]
intermediates to HBM between fusions; this kernel tiles the pair matrix
into [TI, TJ] VMEM blocks and evaluates the whole Green's-theorem
clipping pipeline (second_tpu.core.rotated_iou semantics) in registers
— one HBM write per output tile.

Semantics identical to core.rotated_iou.rotated_iou_matrix(criterion=-1)
for (x, y, w, l, angle) boxes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# corner template in ring order (clockwise), matching
# core.rotated_iou.box_to_corners
_DX = (-0.5, -0.5, 0.5, 0.5)
_DY = (-0.5, 0.5, 0.5, -0.5)


def _corners(x, y, w, l, c, s):
    """Returns lists cx[4], cy[4] for broadcastable inputs."""
    cx, cy = [], []
    for k in range(4):
        dx = _DX[k] * w
        dy = _DY[k] * l
        cx.append(dx * c + dy * s + x)
        cy.append(-dx * s + dy * c + y)
    return cx, cy


def _halfplanes(cx, cy, bx, by):
    """Outward half-planes (nx, ny, d) of the ring (cx, cy) with box
    center (bx, by): interior satisfies n.p <= d."""
    planes = []
    for k in range(4):
        k2 = (k + 1) % 4
        ex = cx[k2] - cx[k]
        ey = cy[k2] - cy[k]
        nx, ny = -ey, ex
        # orient outward: n . (center - corner) <= 0
        flip = nx * (bx - cx[k]) + ny * (by - cy[k]) > 0
        nx = jnp.where(flip, -nx, nx)
        ny = jnp.where(flip, -ny, ny)
        d = nx * cx[k] + ny * cy[k]
        planes.append((nx, ny, d))
    return planes


def _edge_contrib(cx, cy, planes, keep_boundary):
    """Sum over subject edges of cross(P_clip, Q_clip) (Liang-Barsky)."""
    total = None
    big = 1e30
    for k in range(4):
        k2 = (k + 1) % 4
        px, py = cx[k], cy[k]
        rx = cx[k2] - px
        ry = cy[k2] - py
        t0 = jnp.zeros_like(px)
        t1 = jnp.ones_like(px)
        par_out = jnp.zeros_like(px, dtype=bool)
        for nx, ny, d in planes:
            denom = rx * nx + ry * ny
            numer = d - (px * nx + py * ny)
            safe = jnp.where(denom == 0, 1.0, denom)
            t_of = numer / safe
            t1 = jnp.minimum(t1, jnp.where(denom > 0, t_of, big))
            t0 = jnp.maximum(t0, jnp.where(denom < 0, t_of, -big))
            if keep_boundary:
                par_out = par_out | ((denom == 0) & (numer < 0))
            else:
                # on-plane same-direction edges belong to the other
                # polygon (see core.rotated_iou._clipped_edge_contrib)
                same_dir = (rx * ny - ry * nx) > 0
                par_out = par_out | ((denom == 0) & (
                    (numer < 0) | ((numer == 0) & same_dir)))
        ok = (t0 <= t1) & ~par_out
        pcx = px + t0 * rx
        pcy = py + t0 * ry
        qcx = px + t1 * rx
        qcy = py + t1 * ry
        cross = pcx * qcy - pcy * qcx
        contrib = jnp.where(ok, cross, 0.0)
        total = contrib if total is None else total + contrib
    return total


def _iou_kernel(bi_ref, bj_ref, out_ref):
    bi = bi_ref[:]  # [TI, 8] padded box params
    bj = bj_ref[:]  # [TJ, 8]
    xi, yi, wi, li, ri = (bi[:, k : k + 1] for k in range(5))  # [TI, 1]
    xj, yj, wj, lj, rj = (bj[:, k : k + 1].T for k in range(5))  # [1, TJ]
    ci, si = jnp.cos(ri), jnp.sin(ri)
    cj, sj = jnp.cos(rj), jnp.sin(rj)
    cxa, cya = _corners(xi, yi, wi, li, ci, si)  # broadcast [TI, 1]
    cxb, cyb = _corners(xj, yj, wj, lj, cj, sj)  # broadcast [1, TJ]
    shape = (bi.shape[0], bj.shape[0])
    cxa = [jnp.broadcast_to(v, shape) for v in cxa]
    cya = [jnp.broadcast_to(v, shape) for v in cya]
    cxb = [jnp.broadcast_to(v, shape) for v in cxb]
    cyb = [jnp.broadcast_to(v, shape) for v in cyb]
    bx_i = jnp.broadcast_to(xi, shape)
    by_i = jnp.broadcast_to(yi, shape)
    bx_j = jnp.broadcast_to(xj, shape)
    by_j = jnp.broadcast_to(yj, shape)
    planes_b = _halfplanes(cxb, cyb, bx_j, by_j)
    planes_a = _halfplanes(cxa, cya, bx_i, by_i)
    s = _edge_contrib(cxa, cya, planes_b, keep_boundary=True)
    s = s + _edge_contrib(cxb, cyb, planes_a, keep_boundary=False)
    inter = 0.5 * jnp.abs(s)
    area_i = wi * li  # [TI, 1]
    area_j = wj * lj  # [1, TJ]
    union = area_i + area_j - inter
    out_ref[:] = inter / jnp.where(union <= 0, 1.0, union)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def rotated_iou_matrix_pallas(boxes1, boxes2, tile=128, interpret=False):
    """[N, 5] x [K, 5] -> [N, K] rotated IoU via a tiled Pallas kernel.

    N/K are padded up to the tile size internally; padded rows produce
    zero-size boxes whose IoU is 0.  interpret=True runs the kernel in
    the Pallas interpreter (CPU parity tests).
    """
    n, k = boxes1.shape[0], boxes2.shape[0]
    np_, kp = (-(-n // tile)) * tile, (-(-k // tile)) * tile

    def pad(b, target):
        out = jnp.zeros((target, 8), b.dtype)
        return out.at[: b.shape[0], :5].set(b)

    b1 = pad(boxes1, np_)
    b2 = pad(boxes2, kp)
    out = pl.pallas_call(
        _iou_kernel,
        grid=(np_ // tile, kp // tile),
        in_specs=[
            pl.BlockSpec((tile, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, kp), boxes1.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(np_) * int(kp) * 400,
            bytes_accessed=int(np_) * int(kp) * 4,
            transcendentals=int(np_) * 2 + int(kp) * 2,
        ),
        interpret=interpret,
    )(b1, b2)
    return out[:n, :k]


def available():
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
