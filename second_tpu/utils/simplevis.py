"""BEV raster visualization (reference second/utils/simplevis.py),
vectorized numpy instead of numba."""

import numpy as np

from ..core import box_ops


def points_to_bev_map(points, voxel_size, pc_range, max_height_gap=4.0):
    """[N, 3+] points -> [H, W] float BEV height image in [0, 1]."""
    voxel_size = np.asarray(voxel_size[:2])
    lo = np.asarray(pc_range[:2])
    hi = np.asarray(pc_range[3:5])
    grid = np.round((hi - lo) / voxel_size).astype(np.int64)  # [nx, ny]
    c = np.floor((points[:, :2] - lo) / voxel_size).astype(np.int64)
    keep = (
        (c[:, 0] >= 0) & (c[:, 0] < grid[0])
        & (c[:, 1] >= 0) & (c[:, 1] < grid[1])
        & (points[:, 2] >= pc_range[2]) & (points[:, 2] <= pc_range[5])
    )
    c = c[keep]
    z = points[keep, 2]
    bev = np.zeros((grid[1], grid[0]), np.float32)  # [H(y), W(x)]
    rel = np.clip((z - pc_range[2]) / max_height_gap, 0, 1)
    np.maximum.at(bev, (c[:, 1], c[:, 0]), rel)
    return bev


def _bev_to_rgb(bev):
    img = (bev * 255).astype(np.uint8)
    return np.stack([img, img, img], axis=-1)


def draw_box_in_bev(img, pc_range, boxes, color, thickness=1, labels=None):
    """Rasterize rotated BEV boxes into an RGB image (pure numpy)."""
    if boxes.shape[0] == 0:
        return img
    h, w = img.shape[:2]
    lo = np.asarray(pc_range[:2])
    hi = np.asarray(pc_range[3:5])
    scale = np.array([w, h]) / (hi - lo)
    corners = box_ops.center_to_corner_box2d(
        boxes[:, :2], boxes[:, 3:5], boxes[:, 6])
    corners_px = (corners - lo) * scale  # [N, 4, 2]
    for quad in corners_px:
        for k in range(4):
            p0, p1 = quad[k], quad[(k + 1) % 4]
            n = int(max(np.abs(p1 - p0).max(), 1)) * 2
            ts = np.linspace(0, 1, n)
            pts = (p0[None] * (1 - ts[:, None]) + p1[None] * ts[:, None])
            px = np.round(pts).astype(np.int64)
            for dx in range(thickness):
                for dy in range(thickness):
                    q = px + [dx, dy]
                    ok = (
                        (q[:, 0] >= 0) & (q[:, 0] < w)
                        & (q[:, 1] >= 0) & (q[:, 1] < h))
                    img[q[ok, 1], q[ok, 0]] = color
    return img


def kitti_vis(points, boxes=None, labels=None,
              pc_range=(0, -30, -3, 64, 30, 1), voxel_size=(0.1, 0.1)):
    """Points (+boxes) -> BEV RGB image (reference kitti_vis)."""
    bev = points_to_bev_map(points, voxel_size, list(pc_range))
    img = _bev_to_rgb(bev)
    if boxes is not None:
        img = draw_box_in_bev(img, list(pc_range), boxes, [0, 255, 0], 1,
                              labels)
    return img


def nuscene_vis(points, boxes=None, labels=None,
                pc_range=(-50, -50, -3, 50, 50, 1), voxel_size=(0.1, 0.1)):
    return kitti_vis(points, boxes, labels, pc_range, voxel_size)
