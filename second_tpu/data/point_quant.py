"""int16 point-cloud quantization for the device-voxelize train path.

The train loop ships the augmented POINTS (not the padded voxel
buffer); quantizing them to int16 halves the remaining host->device
bytes.  Coordinate dims use the voxel generator's point-cloud range
(max error = range/65535, ~1.1 mm on the 70.4 m KITTI x-range — 50x
below the smallest voxel size); extra feature dims (intensity,
ring/time deltas) use a fixed conservative range.

Quantization is lossy and therefore OPT-IN (train CLI
``quantize_points``); the e2e effect on the loss is bounded by a
parity test (tests/test_training.py).
"""

import numpy as np

# extra (non-xyz) feature dims: covers KITTI intensity in [0, 1],
# raw NuScenes intensity in [0, 255] and sweep time deltas
EXTRA_LO = -8.0
EXTRA_HI = 264.0


def ranges(pc_range, num_features):
    """Per-dim (lo, hi) float32 arrays for quantization; dims 0-2 from
    the point-cloud range, extras fixed."""
    lo = np.full(num_features, EXTRA_LO, np.float32)
    hi = np.full(num_features, EXTRA_HI, np.float32)
    lo[:3] = np.asarray(pc_range[:3], np.float32)
    hi[:3] = np.asarray(pc_range[3:6], np.float32)
    return lo, hi


def quantize(points, lo, hi):
    """[N, F] float -> int16 (values clamped to [lo, hi])."""
    x = (points - lo) / (hi - lo)
    q = np.clip(np.round(x * 65535.0 - 32768.0), -32768, 32767)
    return q.astype(np.int16)


def dequantize_np(q, lo, hi):
    return ((q.astype(np.float32) + 32768.0) / 65535.0) * (hi - lo) + lo
