"""Middle feature extractors: voxel features -> dense BEV pseudo-image.

This module holds the dense/scatter paths; the sparse-conv middles
(SpMiddleFHD family) live in sparse_middle.py.  Output layout is NHWC
([B, H, W, C*D]) — the TPU-native channel-last layout — vs the
reference's NCHW (middle.py:199-209); the RPN consumes NHWC directly.
"""

import jax.numpy as jnp
from flax import linen as nn

from .registry import register_middle


@register_middle
class PointPillarsScatter(nn.Module):
    """Scatter pillar features onto the BEV canvas
    (reference pointpillars.py:420-476).

    Args at call: features [B, V, C], coords [B, V, 3] int32 zyx with
    -1 padding rows. Returns [B, ny, nx, C].
    """

    output_shape: tuple  # [1, nz, ny, nx, C]
    num_input_features: int = 64
    use_norm: bool = True
    num_filters_down1: tuple = ()
    num_filters_down2: tuple = ()
    compute_dtype: str = None  # scatter is dtype-agnostic; parity field

    @nn.compact
    def __call__(self, features, coords, train=False):
        ny, nx = int(self.output_shape[2]), int(self.output_shape[3])
        b, v, c = features.shape
        valid = coords[..., 0] >= 0
        flat = coords[..., 1] * nx + coords[..., 2]  # y * nx + x
        # padding rows get UNIQUE out-of-bounds slots (a shared dump slot
        # makes the TPU scatter serialize on duplicate indices)
        flat = jnp.where(valid, flat, ny * nx + jnp.arange(v)[None, :])
        canvas = jnp.zeros((b, ny * nx, c), features.dtype)
        bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, v))
        canvas = canvas.at[bidx, flat].set(
            features, mode="drop", unique_indices=True)
        return canvas.reshape(b, ny, nx, c)
