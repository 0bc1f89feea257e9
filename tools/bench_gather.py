#!/usr/bin/env python
"""Microbenchmark: gather+GEMM formulations for the sparse subm conv.

The hot op of the SECOND middle net is: for V output rows, gather K=27
neighbor feature rows [V, K, C] from a [V+1, C] table (HBM) and matmul
with [K*C, Cout]. This compares lowering strategies on the real chip
to pick the fastest formulation:

  a) take_along_axis flat [V*K] gather -> one [V, K*C] x [K*C, Cout]
  b) per-offset loop: K gathers of [V] rows -> K [V, C] x [C, Cout]
     accumulated (unrolled, XLA fuses)
  c) like (a) but gather in f32 then cast
  d) one-hot segment-matmul is infeasible at V=58k (skipped)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_gather.py
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=58112)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--cout", type=int, default=64)
    ap.add_argument("--k", type=int, default=27)
    ap.add_argument("--hit", type=float, default=0.45,
                    help="neighbor hit rate (miss -> dump row V)")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    V, C, K, COUT = args.v, args.c, args.k, args.cout
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(V + 1, C), dt)
    w = jnp.asarray(rng.randn(K * C, COUT) * 0.05, dt)
    # realistic slots: per offset k, monotonic-ish hits with misses at V
    slots = np.empty((V, K), np.int32)
    for k in range(K):
        hit = rng.rand(V) < args.hit
        base = np.arange(V) + rng.randint(-40000, 40000)
        slots[:, k] = np.where(hit, np.clip(base, 0, V - 1), V)
    slots_j = jnp.asarray(slots)

    def timeit(fn, *a):
        out = fn(*a)
        _ = np.asarray(out).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        _ = np.asarray(out).ravel()[:1]
        return (time.perf_counter() - t0) / args.iters

    @jax.jit
    def variant_a(feats, slots, w):
        g = jnp.take_along_axis(
            feats[None], slots.reshape(1, V * K, 1), axis=1)
        return jax.lax.dot_general(
            g.reshape(V, K * C), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)

    @jax.jit
    def variant_a2(feats, slots, w):
        g = feats[slots.reshape(-1)]  # plain advanced indexing
        return jax.lax.dot_general(
            g.reshape(V, K * C), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)

    @jax.jit
    def variant_b(feats, slots, w):
        acc = jnp.zeros((V, COUT), jnp.float32)
        for k in range(K):
            g = feats[slots[:, k]]  # [V, C]
            acc = acc + jax.lax.dot_general(
                g, w[k * C:(k + 1) * C],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc.astype(dt)

    @jax.jit
    def gather_only(feats, slots):
        return jnp.take_along_axis(
            feats[None], slots.reshape(1, V * K, 1), axis=1)

    @jax.jit
    def gemm_only(g, w):
        return jax.lax.dot_general(
            g.reshape(V, K * C), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)

    bytes_g = V * K * C * (2 if dt == jnp.bfloat16 else 4)
    flops = 2 * V * K * C * COUT
    for name, fn, a in [
        ("a take_along_axis", variant_a, (feats, slots_j, w)),
        ("a2 adv-index     ", variant_a2, (feats, slots_j, w)),
        ("b per-offset x27 ", variant_b, (feats, slots_j, w)),
        ("gather only      ", gather_only, (feats, slots_j)),
    ]:
        t = timeit(fn, *a)
        print(f"{name}: {t*1e3:7.3f} ms   "
              f"({bytes_g/t/1e9:6.1f} GB/s gathered, "
              f"{flops/t/1e12:5.2f} TFLOP/s)")
    g = gather_only(feats, slots_j)
    t = timeit(gemm_only, g, w)
    print(f"gemm only        : {t*1e3:7.3f} ms   ({flops/t/1e12:5.2f} TFLOP/s)")


if __name__ == "__main__":
    main()
