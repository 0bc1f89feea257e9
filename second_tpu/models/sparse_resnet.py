"""Sparse residual blocks (reference second/pytorch/models/resnet.py:
SparseBasicBlock:32, SparseBottleneck:69 — residual stacks over
submanifold convs, sharing one rulebook per active set)."""

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import sparse
from .layers import MaskedBatchNorm


class SparseBasicBlock(nn.Module):
    """subm-conv -> BN -> relu -> subm-conv -> BN -> +identity -> relu."""

    planes: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    use_norm: bool = True

    @nn.compact
    def __call__(self, grid: sparse.SparseGrid, rulebook, train=False):
        k = int(np.prod(self.kernel))
        cin = grid.features.shape[-1]
        identity = grid.features
        w1 = self.param(
            "conv1_w", nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (k, cin, self.planes))
        out = sparse.subm_conv(grid, rulebook, w1)
        feats = out.features
        if self.use_norm:
            feats = MaskedBatchNorm(name="bn1")(
                feats, mask=grid.valid, use_running_average=not train)
        feats = nn.relu(feats)
        out = out._replace(features=feats)
        w2 = self.param(
            "conv2_w", nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (k, self.planes, self.planes))
        out = sparse.subm_conv(out, rulebook, w2)
        feats = out.features
        if self.use_norm:
            feats = MaskedBatchNorm(name="bn2")(
                feats, mask=grid.valid, use_running_average=not train)
        if identity.shape[-1] != self.planes:
            identity = nn.Dense(self.planes, use_bias=False,
                                name="downsample")(identity)
        feats = nn.relu(feats + identity)
        feats = jnp.where(grid.valid[..., None], feats, 0.0)
        return out._replace(features=feats)


class SparseBottleneck(nn.Module):
    """1x1 -> 3x3 subm -> 1x1 bottleneck (expansion 4)."""

    planes: int
    expansion: int = 4
    kernel: Tuple[int, int, int] = (3, 3, 3)
    use_norm: bool = True

    @nn.compact
    def __call__(self, grid: sparse.SparseGrid, rulebook, train=False):
        identity = grid.features
        feats = nn.Dense(self.planes, use_bias=False, name="conv1")(
            grid.features)
        if self.use_norm:
            feats = MaskedBatchNorm(name="bn1")(
                feats, mask=grid.valid, use_running_average=not train)
        feats = nn.relu(feats)
        mid = grid._replace(features=feats)
        k = int(np.prod(self.kernel))
        w2 = self.param(
            "conv2_w", nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (k, self.planes, self.planes))
        mid = sparse.subm_conv(mid, rulebook, w2)
        feats = mid.features
        if self.use_norm:
            feats = MaskedBatchNorm(name="bn2")(
                feats, mask=grid.valid, use_running_average=not train)
        feats = nn.relu(feats)
        feats = nn.Dense(self.planes * self.expansion, use_bias=False,
                         name="conv3")(feats)
        if self.use_norm:
            feats = MaskedBatchNorm(name="bn3")(
                feats, mask=grid.valid, use_running_average=not train)
        if identity.shape[-1] != self.planes * self.expansion:
            identity = nn.Dense(self.planes * self.expansion, use_bias=False,
                                name="downsample")(identity)
        feats = nn.relu(feats + identity)
        feats = jnp.where(grid.valid[..., None], feats, 0.0)
        return mid._replace(features=feats)
