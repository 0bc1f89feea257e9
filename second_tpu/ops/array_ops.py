"""TF-style scatter_nd / gather_nd (reference torchplus/ops/array_ops.py)."""

import jax.numpy as jnp


def scatter_nd(indices, updates, shape):
    """indices [N, ndim] int, updates [N, ...] -> dense `shape` array."""
    out = jnp.zeros(shape, updates.dtype)
    return out.at[tuple(indices[:, i] for i in range(indices.shape[1]))].set(
        updates)


def gather_nd(params, indices):
    """indices [N, ndim] -> params[tuple(indices)] rows."""
    return params[tuple(indices[:, i] for i in range(indices.shape[1]))]
