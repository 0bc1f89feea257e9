#!/usr/bin/env python
"""Microbench: z-folded 2D conv vs conv3d for the dense tail.

A 3x3x3 conv over a shallow-depth dense grid [D, H, W, C] can run as
ONE 2D conv over [H, W, D*C] with a [3, 3, D*C, D*C] weight that
embeds the z-band structure (zeros where |dz| > 1).  1.66x the FLOPs
at D=5, but TPU 2D convs at C>=256 run near MXU peak while XLA's
conv3d lowering measured 17 TF/s (tools/bench_dense_tail.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_zfold.py
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


def conv3d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def zfold_weight(w3, d_in, stride_z=1, pad_z=1):
    """w3 [kz, ky, kx, C, Cout] -> [ky, kx, d_in*C, d_out*Cout]."""
    kz, ky, kx, c, co = w3.shape
    d_out = (d_in + 2 * pad_z - kz) // stride_z + 1
    w2 = jnp.zeros((ky, kx, d_in * c, d_out * co), w3.dtype)
    for do in range(d_out):
        for dz in range(kz):
            di = stride_z * do + dz - pad_z
            if 0 <= di < d_in:
                w2 = w2.at[:, :, di * c:(di + 1) * c,
                           do * co:(do + 1) * co].set(w3[dz])
    return w2


def conv2d_zfold(x2, w2):
    return jax.lax.conv_general_dilated(
        x2, w2, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x2.dtype)


def main():
    print(f"backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)
    for name, (d, h, wd, c) in (("scale3", (5, 200, 176, 64)),):
        x = jnp.asarray(rng.randn(1, d, h, wd, c), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.05, jnp.bfloat16)
        # [B,D,H,W,C] -> [B,H,W,D*C]
        x2 = x.transpose(0, 2, 3, 1, 4).reshape(1, h, wd, d * c)
        w2 = zfold_weight(w, d)
        a = np.asarray(conv3d(x, w), np.float32)
        b = np.asarray(
            conv2d_zfold(x2, w2), np.float32).reshape(1, h, wd, d, c)
        b = np.transpose(b, (0, 3, 1, 2, 4))
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        ms3 = scan_time(lambda x, w: conv3d(x, w), (x, w))
        msz = scan_time(lambda x2, w2: conv2d_zfold(x2, w2), (x2, w2))
        fl3 = d * h * wd * 27 * c * c * 2
        flz = h * wd * 9 * (d * c) * (d * c) * 2
        print(f"{name}: conv3d {ms3:.3f} ms ({fl3 / ms3 / 1e9:.1f} TF/s)  "
              f"zfold-2d {msz:.3f} ms ({flz / msz / 1e9:.1f} TF/s raw, "
              f"{fl3 / msz / 1e9:.1f} TF/s useful)  rel-err {err:.1e}")
        # batch-2 scaling of the zfold conv
        x2b = jnp.concatenate([x2, x2], 0)
        mszb = scan_time(lambda x2, w2: conv2d_zfold(x2, w2), (x2b, w2))
        print(f"  zfold batch2: {mszb:.3f} ms ({mszb / msz:.2f}x batch1)")


if __name__ == "__main__":
    main()
