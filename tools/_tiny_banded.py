import numpy as np, jax, jax.numpy as jnp
from second_tpu.ops import banded_sparse as bs

rng = np.random.RandomState(0)
B, V, K, KC, C, COUT = 1, 1024, 27, 9, 64, 64
slots = rng.randint(0, V + 200, size=(B, V, K)).astype(np.int32)
# make mostly banded: slot near own row
rows = np.arange(V)[None, :, None]
slots = np.clip(rows + rng.randint(-100, 100, size=(B, V, K)), 0, V + 50).astype(np.int32)
feats = rng.randn(B, V, C).astype(np.float32)
wts = rng.randn(K, C, COUT).astype(np.float32) * 0.05

plan = bs.build_banded_plan(jnp.asarray(slots), None, V, KC, c=C)
out_ref = bs._banded_apply(jnp.asarray(feats), plan, jnp.asarray(wts), interpret=True)
out_tpu = bs._banded_apply(jnp.asarray(feats), plan, jnp.asarray(wts), interpret=False)
err = np.abs(np.asarray(out_ref) - np.asarray(out_tpu)).max()
print("max err:", err)
