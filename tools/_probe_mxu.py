"""Probe MXU throughput for one-hot dot shapes (dependent-chain, in-graph).
Sync via host transfer (block_until_ready is unreliable on axon tunnel)."""
import time, numpy as np, jax, jax.numpy as jnp

def bench_dot(m, k, n, iters=400, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    x0 = (jax.random.normal(key, (m, k)) / np.sqrt(k)).astype(dtype)
    b = (jax.random.normal(key, (k, n)) / np.sqrt(k)).astype(dtype)
    b2 = (jax.random.normal(key, (n, k)) / np.sqrt(n)).astype(dtype)
    @jax.jit
    def f(x, b, b2):
        def body(x, _):
            y = (x @ b).astype(dtype)
            return (y @ b2).astype(dtype), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out[:1, :1]
    _ = np.asarray(f(x0, b, b2))
    t0 = time.perf_counter(); _ = np.asarray(f(x0, b, b2))
    dt = (time.perf_counter() - t0) / iters / 2   # per dot
    tf = 2*m*k*n / dt / 1e12
    print(f"[{m},{k}]@[{k},{n}] {dtype.__name__}: {dt*1e6:.2f} us/dot = {tf:.1f} TF/s")

for shape in [(4096,4096,4096), (2048,2048,2048), (1152,128,128), (1152,128,512),
              (1152,768,128), (1152,512,128), (9216,128,128), (1024,1728,128),
              (1152,128,64), (576,128,128), (576,768,128)]:
    try:
        bench_dot(*shape)
    except Exception as e:
        print(shape, "FAILED", repr(e)[:150])
