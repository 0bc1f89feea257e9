"""Device mesh + sharding helpers (SPMD data parallelism).

The reference scales with single-process torch.nn.DataParallel
(second/pytorch/train.py:203-204, replicate + scatter/gather each
step); the TPU-native equivalent is ONE jitted program over a
``jax.sharding.Mesh`` with the batch sharded over the ``data`` axis and
parameters replicated — XLA inserts the gradient all-reduce over ICI.
A single chip is the degenerate 1-device mesh, multi-host extends the
same mesh over DCN; no other parallelism strategies exist upstream
(SURVEY.md §2.11).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name="data"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_example(mesh, axis_name="data"):
    """NamedSharding that splits the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh):
    return NamedSharding(mesh, P())


def put_sharded(example, mesh, axis_name="data"):
    """Device-put a host batch dict with the batch axis sharded."""
    sharding = shard_example(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), example
    )
