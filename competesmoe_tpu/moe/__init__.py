from . import layers, pretrain_layers  # noqa: F401  (populate registries)
from .config import MoEArgs  # noqa: F401
from .layers import MoEAux  # noqa: F401
from .registry import (  # noqa: F401
    MOE_REGISTRY,
    PRETRAIN_MOE_REGISTRY,
    get_moe,
    get_pretrain_moe,
    register_moe,
    register_pretrain_moe,
)
from .schedule import (  # noqa: F401
    FlipSchedule,
    build_flip_schedule,
    schedule_from_dict,
    schedule_to_dict,
)
