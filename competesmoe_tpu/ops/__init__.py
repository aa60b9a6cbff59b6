from . import expert_compute, losses, routing  # noqa: F401
from .expert_compute import (  # noqa: F401
    GroupedSel,
    combine_topk,
    dense_all_experts_kv,
    dense_all_experts_mlp2,
    gather_topk_outputs,
    grouped_ffn_kv,
    grouped_ffn_mlp2,
    moe_ffn_kv,
    moe_ffn_mlp2,
    sort_by_expert,
)
from .routing import (  # noqa: F401
    cosine_logits,
    make_finite,
    normalize_weights,
    softmax_f32,
    top_k,
    topk_logits_softmax_weights,
    topk_sigmoid,
    topk_softmax,
)
