"""Shared flax layers.

MaskedBatchNorm is the static-shape workhorse: the reference feeds
dense-packed real voxels into BatchNorm1d (torch defaults modified to
eps=1e-3, momentum=0.01 everywhere — e.g. voxel_encoder.py:56-57,
middle.py:122-125), while our TPU layout carries padding rows.  Masked
statistics reproduce the reference's normalization exactly while
keeping every shape static.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the last axis with optional per-row validity mask.

    Matches torch BatchNorm semantics: biased variance for
    normalization, unbiased for the running-variance update, running =
    (1 - torch_momentum) * running + torch_momentum * batch with
    torch_momentum = 0.01.
    """

    momentum: float = 0.99  # flax convention: decay of the running stat
    eps: float = 1e-3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = False):
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is None:
                n = jnp.asarray(
                    jnp.prod(jnp.asarray(x.shape[:-1])), jnp.float32
                )
                mean = jnp.mean(xf, axis=reduce_axes)
                var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
            else:
                m = jnp.broadcast_to(
                    mask.astype(jnp.float32), x.shape[:-1]
                )[..., None]
                n = jnp.maximum(m.sum(), 1.0)
                mean = (xf * m).sum(axis=reduce_axes) / n
                var = (jnp.square(xf - mean) * m).sum(axis=reduce_axes) / n
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * unbiased
                )

        y = (x.astype(jnp.float32) - mean) * jnp.reciprocal(
            jnp.sqrt(var + self.eps)
        )
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class LinearBNReLU(nn.Module):
    """Linear(+BN)(+ReLU) block with the reference's bias convention:
    no bias when BN is used (use_norm), bias otherwise."""

    features: int
    use_norm: bool = True
    relu: bool = True
    dtype: str = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Dense(self.features, use_bias=not self.use_norm,
                     dtype=self.dtype)(x)
        if self.use_norm:
            x = MaskedBatchNorm()(x, mask=mask, use_running_average=not train)
        if self.relu:
            x = nn.relu(x)
        return x
