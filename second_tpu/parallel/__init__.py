from .mesh import make_mesh, put_sharded, replicate, shard_example  # noqa: F401
