"""Pallas TPU kernel: greedy NMS suppression sweep.

The greedy pass is inherently sequential in candidate rank; as an XLA
fori_loop each iteration pays loop/dispatch overhead (~4us), which
dominates at n=1000 (measured ~3.9ms per frame). Here the whole
suppress matrix lives in VMEM and the sequential sweep runs inside ONE
kernel — per-step work is a handful of vector ops on a [1, n] lane
vector, so the sweep is microseconds.

Semantics identical to ops.nms._greedy_suppress (reference bitmask
kernel nms_gpu.py:71-128): visit candidates in score order; if still
alive, keep and kill every candidate it suppresses.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _greedy_kernel(sup_ref, alive_ref, keep_ref):
    n = sup_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(i, state):
        alive, keep = state
        onehot = iota == i
        take = jnp.sum(jnp.where(onehot, alive, 0.0)) > 0.0
        keep = jnp.where(onehot, jnp.where(take, 1.0, 0.0), keep)
        row = sup_ref[pl.ds(i, 1), :]  # [1, n]
        dead = onehot | (take & (row > 0.0))
        alive = jnp.where(dead, 0.0, alive)
        return alive, keep

    alive0 = alive_ref[...]
    keep0 = jnp.zeros_like(alive0)
    _, keep = jax.lax.fori_loop(0, n, body, (alive0, keep0))
    keep_ref[...] = keep


@functools.partial(jax.jit, static_argnames=("interpret",))
def greedy_suppress_pallas(iou, valid, iou_threshold, interpret=False):
    """iou: [n, n] score-ordered pairwise IoU; valid: [n] bool.
    Returns keep [n] bool. n is padded to a lane multiple internally."""
    n = iou.shape[0]
    npad = max(-(-n // 128) * 128, 128)
    sup = jnp.zeros((npad, npad), jnp.float32)
    sup = sup.at[:n, :n].set(
        (iou > iou_threshold).astype(jnp.float32))
    alive = jnp.zeros((1, npad), jnp.float32)
    alive = alive.at[0, :n].set(valid.astype(jnp.float32))
    keep = pl.pallas_call(
        _greedy_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, npad), jnp.float32),
        interpret=interpret,
    )(sup, alive)
    return keep[0, :n] > 0.0


def available():
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
