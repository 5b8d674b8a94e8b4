from .mesh import make_mesh, replicate, shard_batch, shard_params_tp  # noqa: F401
