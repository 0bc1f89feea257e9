#!/usr/bin/env python
"""What does the MXU actually deliver at dense-tail sizes?

Compares, for the scale3 z-folded shape ([200,176] x 320ch, 3x3):
  * raw GEMM [35200, 2880] @ [2880, 320]
  * im2col GEMM: 9 shifted views concatenated -> one dot
  * XLA conv2d (the baseline that measured 27 TF/s)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_gemm_conv.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(fn, args, iters=20):
    def body(carry, _):
        done = [False]

        def tweak(x):
            if (not done[0] and hasattr(x, "dtype")
                    and jnp.issubdtype(x.dtype, jnp.floating)):
                done[0] = True
                return x + carry.astype(x.dtype)
            return x

        a = jax.tree_util.tree_map(tweak, list(args))
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return leaf.ravel()[0].astype(jnp.float32) * 0.0, None

    @jax.jit
    def run():
        dep, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return dep

    np.asarray(run())
    t0 = time.perf_counter()
    np.asarray(run())
    return (time.perf_counter() - t0) / iters * 1e3


def im2col_conv(x2, w2):
    """x2 [B,H,W,C], w2 [3,3,C,Co] -> [B,H,W,Co] (pad 1)."""
    b, h, w, c = x2.shape
    co = w2.shape[-1]
    xp = jnp.pad(x2, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + w] for dy in range(3)
            for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1)          # [B,H,W,9C]
    out = jax.lax.dot_general(
        patches.reshape(b * h * w, 9 * c), w2.reshape(9 * c, co),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.reshape(b, h, w, co).astype(x2.dtype)


def shift_sum_conv(x2, w2):
    """9 shifted [BHW, C] @ [C, Co] dots, accumulated (no patch buf)."""
    b, h, w, c = x2.shape
    co = w2.shape[-1]
    xp = jnp.pad(x2, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((b * h * w, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy:dy + h, dx:dx + w].reshape(b * h * w, c)
            out = out + jax.lax.dot_general(
                xs, w2[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return out.reshape(b, h, w, co).astype(x2.dtype)


def xla_conv(x2, w2):
    return jax.lax.conv_general_dilated(
        x2, w2, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x2.dtype)


def main():
    print(f"backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)
    h, wd, c, co = 200, 176, 320, 320
    x2 = jnp.asarray(rng.randn(1, h, wd, c), jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(3, 3, c, co) * 0.02, jnp.bfloat16)
    fl = h * wd * 9 * c * co * 2

    a = np.asarray(xla_conv(x2, w2), np.float32)
    bi = np.asarray(im2col_conv(x2, w2), np.float32)
    bs = np.asarray(shift_sum_conv(x2, w2), np.float32)
    print(f"im2col err {np.abs(a - bi).max() / np.abs(a).max():.1e}  "
          f"shift-sum err {np.abs(a - bs).max() / np.abs(a).max():.1e}")

    g = jnp.asarray(rng.randn(h * wd, 9 * c), jnp.bfloat16)
    gw = jnp.asarray(rng.randn(9 * c, co) * 0.02, jnp.bfloat16)
    ms = scan_time(lambda g, gw: jax.lax.dot_general(
        g, gw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), (g, gw))
    print(f"raw GEMM [{h * wd},{9 * c}]@[{9 * c},{co}]: {ms:.3f} ms "
          f"({fl / ms / 1e9:.1f} TF/s)")

    for name, fn in (("xla_conv", xla_conv), ("im2col", im2col_conv),
                     ("shift_sum", shift_sum_conv)):
        ms = scan_time(fn, (x2, w2))
        print(f"{name}: {ms:.3f} ms ({fl / ms / 1e9:.1f} TF/s)")


if __name__ == "__main__":
    main()
