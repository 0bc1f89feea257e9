import numpy as np, jax, jax.numpy as jnp
from second_tpu.ops import banded_sparse as bs

rng = np.random.RandomState(0)
B, V, K, KC, C, COUT = 1, 1024, 27, 9, 64, 64
rows = np.arange(V)[None, :, None]
slots = np.clip(rows + rng.randint(-100, 100, size=(B, V, K)), 0, V + 50).astype(np.int32)
feats = rng.randn(B, V, C).astype(np.float32)
wts = rng.randn(K, C, COUT).astype(np.float32) * 0.05
plan = bs.build_banded_plan(jnp.asarray(slots), None, V, KC, c=C)

def loss(f, w, interp):
    out = bs.banded_conv(f, plan, w, interpret=interp)
    return (out * jnp.sin(jnp.arange(out.size).reshape(out.shape) * 0.01)).sum()

g_ref = jax.grad(loss, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(wts), True)
g_tpu = jax.grad(loss, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(wts), False)
for name, a, b in (("dfeat", g_ref[0], g_tpu[0]), ("dw", g_ref[1], g_tpu[1])):
    a, b = np.asarray(a), np.asarray(b)
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(name, "rel err:", err)
