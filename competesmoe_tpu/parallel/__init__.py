from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_param_shardings,
    replicated,
    shard_params,
)
