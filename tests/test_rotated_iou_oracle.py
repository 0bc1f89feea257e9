"""Adversarial oracles for the rotated-IoU kernel family.

The entire AP stack (eval BEV/3D overlap, RotateIouSimilarity target
assignment, rotated NMS) keys off one geometric kernel:
``core.rotated_iou`` (Green's-theorem clipping) and its device twins.
This file cross-checks it against two INDEPENDENT methods:

  1. candidate-enumeration (corners-in-rect + edge intersections +
     angular-sort shoelace — the reference CUDA construction,
     nms_gpu.py:511-640) over 10k random pairs,
  2. dependency-free polygon rasterization at fine resolution over
     random and adversarially degenerate pairs (zero-area, touching,
     contained, identical, parallel-edge),

for every criterion variant (-1 IoU / 0 IoA1 / 1 IoA2 / 2 raw inter).
"""

import numpy as np
import pytest

from second_tpu.core.rotated_iou import (
    box_to_corners,
    rotated_intersection_area_candidates,
    rotated_iou_matrix,
)


def _random_boxes(rng, n, scale=4.0):
    b = np.zeros((n, 5))
    b[:, 0:2] = rng.uniform(-scale, scale, (n, 2))
    b[:, 2:4] = rng.uniform(0.3, scale, (n, 2))
    b[:, 4] = rng.uniform(-2 * np.pi, 2 * np.pi, n)
    return b


def _raster_pair(b1, b2, grid=512):
    """Rasterized (inter, area1, area2) of two [5] boxes.

    Samples cell centers of a grid×grid raster over the pair's joint
    bounding box; exact as grid -> inf, error O(perimeter * cell).
    """
    c1 = box_to_corners(b1[None])[0]  # [4, 2]
    c2 = box_to_corners(b2[None])[0]
    allc = np.concatenate([c1, c2], axis=0)
    lo = allc.min(axis=0) - 1e-3
    hi = allc.max(axis=0) + 1e-3
    xs = np.linspace(lo[0], hi[0], grid, endpoint=False) + (
        (hi[0] - lo[0]) / grid / 2)
    ys = np.linspace(lo[1], hi[1], grid, endpoint=False) + (
        (hi[1] - lo[1]) / grid / 2)
    cell = ((hi[0] - lo[0]) / grid) * ((hi[1] - lo[1]) / grid)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], axis=-1)

    def inside(c):
        # inclusive point-in-rect via the two edge projections
        e1 = c[1] - c[0]
        e2 = c[3] - c[0]
        ap = pts - c[0]
        d1 = ap @ e1
        d2 = ap @ e2
        return (d1 >= 0) & (d1 <= e1 @ e1) & (d2 >= 0) & (d2 <= e2 @ e2)

    m1 = inside(c1)
    m2 = inside(c2)
    return (
        float((m1 & m2).sum() * cell),
        float(m1.sum() * cell),
        float(m2.sum() * cell),
    )


def test_green_vs_candidate_enumeration_10k():
    """Two independent exact formulations must agree to float precision
    over 10k random pairs, all criteria."""
    rng = np.random.RandomState(0)
    n = 100
    b1 = _random_boxes(rng, n)
    b2 = _random_boxes(rng, n)  # n x n = 10k pairs
    c1 = np.broadcast_to(box_to_corners(b1)[:, None], (n, n, 4, 2))
    c2 = np.broadcast_to(box_to_corners(b2)[None, :], (n, n, 4, 2))
    inter_cand = rotated_intersection_area_candidates(c1, c2)
    inter_green = rotated_iou_matrix(b1, b2, criterion=2)
    np.testing.assert_allclose(inter_green, inter_cand, atol=1e-6)
    # criteria consistency: iou = inter/(a1+a2-inter), ioa = inter/a
    a1 = (b1[:, 2] * b1[:, 3])[:, None]
    a2 = (b2[:, 2] * b2[:, 3])[None, :]
    iou = rotated_iou_matrix(b1, b2, criterion=-1)
    np.testing.assert_allclose(
        iou, inter_green / (a1 + a2 - inter_green), atol=1e-6)
    np.testing.assert_allclose(
        rotated_iou_matrix(b1, b2, criterion=0), inter_green / a1, atol=1e-6)
    np.testing.assert_allclose(
        rotated_iou_matrix(b1, b2, criterion=1), inter_green / a2, atol=1e-6)


def test_raster_oracle_random_pairs():
    """Green's-theorem IoU vs fine rasterization on 200 random pairs.

    Raster error is O(perimeter * cell); tolerance is per-pair from the
    actual cell size.
    """
    rng = np.random.RandomState(1)
    n = 200
    b1 = _random_boxes(rng, n)
    # half the pairs nearby (interesting overlaps), half anywhere
    b2 = _random_boxes(rng, n)
    b2[: n // 2, 0:2] = b1[: n // 2, 0:2] + rng.uniform(
        -2, 2, (n // 2, 2))
    exact = np.array([
        rotated_iou_matrix(b1[i:i + 1], b2[i:i + 1], criterion=2)[0, 0]
        for i in range(n)
    ])
    for i in range(n):
        inter_r, a1_r, a2_r = _raster_pair(b1[i], b2[i])
        c1 = box_to_corners(b1[i][None])[0]
        c2 = box_to_corners(b2[i][None])[0]
        allc = np.concatenate([c1, c2])
        ext = (allc.max(0) - allc.min(0)).max()
        cell = ext / 512
        perim = 2 * (b1[i, 2] + b1[i, 3] + b2[i, 2] + b2[i, 3])
        tol = perim * cell + 1e-6
        assert abs(exact[i] - inter_r) <= tol, (
            i, exact[i], inter_r, tol)


@pytest.mark.parametrize("case", [
    "identical", "touching_edge", "touching_corner", "contained",
    "zero_area", "parallel_offset", "cross", "rot90",
])
def test_degenerate_cases(case):
    if case == "identical":
        b1 = np.array([[1.0, 2.0, 3.0, 4.0, 0.7]])
        b2 = b1.copy()
        iou = rotated_iou_matrix(b1, b2)[0, 0]
        assert abs(iou - 1.0) < 1e-6
    elif case == "touching_edge":
        # share the x=1 edge, zero overlap area
        b1 = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b2 = np.array([[2.0, 0.0, 2.0, 2.0, 0.0]])
        assert abs(rotated_iou_matrix(b1, b2)[0, 0]) < 1e-6
    elif case == "touching_corner":
        b1 = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b2 = np.array([[2.0, 2.0, 2.0, 2.0, 0.0]])
        assert abs(rotated_iou_matrix(b1, b2)[0, 0]) < 1e-6
    elif case == "contained":
        b1 = np.array([[0.0, 0.0, 1.0, 1.0, 0.3]])
        b2 = np.array([[0.0, 0.0, 4.0, 4.0, 1.1]])
        # inter == area1 -> criterion 0 gives exactly 1
        assert abs(rotated_iou_matrix(b1, b2, criterion=0)[0, 0] - 1.0) < 1e-6
        assert abs(rotated_iou_matrix(b1, b2)[0, 0] - 1.0 / 16.0) < 1e-6
    elif case == "zero_area":
        b1 = np.array([[0.0, 0.0, 0.0, 2.0, 0.5]])  # w = 0
        b2 = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        assert abs(rotated_iou_matrix(b1, b2)[0, 0]) < 1e-6
        # degenerate vs itself must not produce NaN
        assert np.isfinite(rotated_iou_matrix(b1, b1)).all()
    elif case == "parallel_offset":
        # axis-aligned half-overlap: inter = 2, union = 6
        b1 = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b2 = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
        assert abs(rotated_iou_matrix(b1, b2)[0, 0] - 2.0 / 6.0) < 1e-6
    elif case == "cross":
        # classic plus-sign: 1x3 crossing 3x1 -> inter 1, union 5
        b1 = np.array([[0.0, 0.0, 1.0, 3.0, 0.0]])
        b2 = np.array([[0.0, 0.0, 3.0, 1.0, 0.0]])
        assert abs(rotated_iou_matrix(b1, b2)[0, 0] - 1.0 / 5.0) < 1e-6
    elif case == "rot90":
        # square rotated by pi/2 is the same square
        b1 = np.array([[0.5, -0.5, 2.0, 2.0, 0.0]])
        b2 = np.array([[0.5, -0.5, 2.0, 2.0, np.pi / 2]])
        assert abs(rotated_iou_matrix(b1, b2)[0, 0] - 1.0) < 1e-5


def test_raster_oracle_degenerate_offsets():
    """Near-degenerate sweeps (boxes sliding past each other through
    touching into overlap) against the raster oracle."""
    rng = np.random.RandomState(2)
    for ang in (0.0, 0.3, np.pi / 4, 1.2):
        for off in (1.9, 1.999, 2.0, 2.001, 2.5, 3.0):
            b1 = np.array([[0.0, 0.0, 2.0, 2.0, ang]])
            b2 = np.array([[off, 0.05, 2.0, 2.0, ang]])
            exact = rotated_iou_matrix(b1, b2, criterion=2)[0, 0]
            inter_r, _, _ = _raster_pair(b1[0], b2[0], grid=768)
            assert abs(exact - inter_r) <= 16 * (6.0 / 768) + 1e-6
    del rng


def test_jnp_matches_numpy():
    """The same code path under jax.numpy (the device eval/NMS path)
    must match the numpy host path."""
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    b1 = _random_boxes(rng, 64)
    b2 = _random_boxes(rng, 64)
    host = rotated_iou_matrix(b1, b2)
    dev = np.asarray(rotated_iou_matrix(
        jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32), xp=jnp))
    np.testing.assert_allclose(dev, host, atol=2e-3)


def test_pallas_matches_numpy_interpret():
    """Pallas IoU kernel (interpret mode on CPU) vs the host kernel."""
    from second_tpu.ops import pallas_iou

    rng = np.random.RandomState(4)
    b1 = _random_boxes(rng, 128).astype(np.float32)
    b2 = _random_boxes(rng, 128).astype(np.float32)
    host = rotated_iou_matrix(b1.astype(np.float64), b2.astype(np.float64))
    dev = np.asarray(pallas_iou.rotated_iou_matrix_pallas(
        b1, b2, interpret=True))
    np.testing.assert_allclose(dev, host, atol=3e-3)
