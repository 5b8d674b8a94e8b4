from .mesh import (make_mesh, maybe_initialize_distributed,  # noqa: F401
                   process_shard, replicate, shard_batch, shard_params_tp,
                   tp_param_specs)
