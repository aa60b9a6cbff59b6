from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_param_shardings,
    replicated,
    shard_params,
)
from .distributed import DistributedEnv, detect_env, initialize  # noqa: F401
from .expert_parallel import make_ep_ffn_kv  # noqa: F401
