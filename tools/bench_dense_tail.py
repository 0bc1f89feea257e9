#!/usr/bin/env python
"""Microbench dense 3D-conv formulations for the dense tail.

Compares, at car.fhd dense-tail shapes:
  * conv3d: one lax.conv_general_dilated with 3 spatial dims (what
    models/sparse_middle._dense_group uses)
  * conv2d-sum: same math as sum over dz of 2D convs with the depth
    folded into batch (TPU convs are 2D-native; 3D lowering may loop)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_dense_tail.py
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


def conv2d_sum(x, w):
    """Same result: pad D, fold D into batch, sum 3 dz-shifted conv2d."""
    b, d, h, wd, c = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = jnp.zeros((b * d, h, wd, cout), jnp.float32)
    for dz in range(3):
        xs = xp[:, dz:dz + d].reshape(b * d, h, wd, c)
        out = out + jax.lax.conv_general_dilated(
            xs, w[dz], (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
    return out.reshape(b, d, h, wd, cout).astype(x.dtype)


def main():
    print(f"backend: {jax.default_backend()}")
    rng = np.random.RandomState(0)
    for name, (d, h, wd, c) in (("scale3", (5, 200, 176, 64)),
                                ("scale2", (11, 400, 352, 64))):
        x = jnp.asarray(rng.randn(1, d, h, wd, c), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.05, jnp.bfloat16)
        a = np.asarray(conv3d(x, w), np.float32)
        b = np.asarray(conv2d_sum(x, w), np.float32)
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        ms3 = scan_time(lambda x, w: conv3d(x, w), (x, w))
        ms2 = scan_time(lambda x, w: conv2d_sum(x, w), (x, w))
        fl = d * h * wd * 27 * c * c * 2
        print(f"{name} [{d},{h},{wd}]x{c}: conv3d {ms3:.3f} ms "
              f"({fl / ms3 / 1e9:.1f} TF/s)  conv2d-sum {ms2:.3f} ms "
              f"({fl / ms2 / 1e9:.1f} TF/s)  rel-err {err:.1e}")


if __name__ == "__main__":
    main()
