from .decoder import DecoderConfig, DecoderLM, KVCache  # noqa: F401
from .lm import LMConfig, MoELanguageModel, lm_loss_fn  # noqa: F401
from .llava import (  # noqa: F401
    LlavaConfig,
    LlavaModel,
    generate,
    splice_image_tokens,
)
from .projector import ProjectorConfig, VisionProjector  # noqa: F401
from .vision import (  # noqa: F401
    CLIPSMoEVisionTower,
    SiglipSMoEVisionTower,
    VisionConfig,
    multiscale_features,
)
