from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_param_shardings,
    put_batch,
    replicated,
    shard_params,
)
from .distributed import DistributedEnv, detect_env, initialize  # noqa: F401
from .ep_context import (  # noqa: F401
    current_ep_mesh,
    set_ep_mesh,
    use_expert_parallel,
)
from .expert_parallel import (  # noqa: F401
    make_ep_all_experts_kv,
    make_ep_all_experts_mlp2,
    make_ep_ffn_kv,
    make_ep_ffn_mlp2,
    make_ep_ffn_swiglu,
)
from .ring_attention import (  # noqa: F401
    make_ring_attention,
    make_ring_attention_masked,
)
from .seq_context import (  # noqa: F401
    current_seq_mesh,
    set_seq_mesh,
    use_sequence_parallel,
)
