"""Matplotlib box-drawing helpers (reference second/utils/bbox_plot.py).

Small, dependency-light subset: 2D bbox / BEV rotated-box drawing on an
axes, and a one-call scene plot used by notebooks.
"""

import numpy as np

from ..core import box_ops

GLColor = {
    "Red": (1.0, 0.0, 0.0),
    "Green": (0.0, 1.0, 0.0),
    "Blue": (0.0, 0.0, 1.0),
    "Yellow": (1.0, 1.0, 0.0),
    "Cyan": (0.0, 1.0, 1.0),
    "Magenta": (1.0, 0.0, 1.0),
    "White": (1.0, 1.0, 1.0),
    "Gray": (0.5, 0.5, 0.5),
}


def draw_bbox_in_ax(ax, bboxes, edgecolor="g", labels=None, alpha=1.0,
                    linewidth=1):
    """Axis-aligned [N, 4] xyxy boxes on a matplotlib axes."""
    import matplotlib.patches as patches

    for i, bbox in enumerate(bboxes):
        rect = patches.Rectangle(
            (bbox[0], bbox[1]), bbox[2] - bbox[0], bbox[3] - bbox[1],
            linewidth=linewidth, edgecolor=edgecolor, facecolor="none",
            alpha=alpha)
        ax.add_patch(rect)
        if labels is not None:
            ax.text(bbox[0], bbox[1], str(labels[i]), color=edgecolor)
    return ax


def draw_rotated_bbox_in_ax(ax, rbboxes, edgecolor="g", labels=None,
                            alpha=1.0, linewidth=1):
    """BEV rotated [N, 5] (x, y, w, l, r) boxes on a matplotlib axes."""
    corners = box_ops.center_to_corner_box2d(
        rbboxes[:, :2], rbboxes[:, 2:4], rbboxes[:, 4])
    for i, quad in enumerate(corners):
        poly = np.concatenate([quad, quad[:1]], axis=0)
        ax.plot(poly[:, 0], poly[:, 1], color=edgecolor, alpha=alpha,
                linewidth=linewidth)
        if labels is not None:
            ax.text(quad[0, 0], quad[0, 1], str(labels[i]), color=edgecolor)
    return ax


def plot_bev_scene(points, gt_boxes=None, det_boxes=None, pc_range=None,
                   save_path=None):
    """Scatter points + gt (green) / detections (red) in BEV."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10))
    ax.scatter(points[:, 0], points[:, 1], s=0.1, c="gray")
    if gt_boxes is not None and len(gt_boxes):
        draw_rotated_bbox_in_ax(
            ax, gt_boxes[:, [0, 1, 3, 4, 6]], edgecolor="g")
    if det_boxes is not None and len(det_boxes):
        draw_rotated_bbox_in_ax(
            ax, det_boxes[:, [0, 1, 3, 4, 6]], edgecolor="r")
    if pc_range is not None:
        ax.set_xlim(pc_range[0], pc_range[3])
        ax.set_ylim(pc_range[1], pc_range[4])
    ax.set_aspect("equal")
    if save_path is not None:
        fig.savefig(save_path, dpi=100, bbox_inches="tight")
        plt.close(fig)
    return fig, ax
