from . import conversation, mm_utils  # noqa: F401
from .conversation import Conversation, SeparatorStyle, conv_templates  # noqa: F401
from .mm_utils import (  # noqa: F401
    ImageProcessorConfig,
    KeywordsStoppingCriteria,
    expand2square,
    get_anyres_image_grid_shape,
    process_images,
    select_best_resolution,
    tokenizer_image_token,
)
