"""Image preprocessing + prompt tokenization utilities.

Re-design of `moe_model/mm_utils.py:30-265` without torch: PIL + numpy in,
numpy NHWC out (the JAX towers take NHWC).
"""

from __future__ import annotations

import ast
import base64
import dataclasses
import math
from io import BytesIO
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..constants import IMAGE_TOKEN_INDEX


@dataclasses.dataclass(frozen=True)
class ImageProcessorConfig:
    """Minimal CLIP/SigLIP image processor (resize -> rescale ->
    normalize). Defaults = google/siglip-so400m-patch14-224."""

    size: int = 224
    image_mean: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    image_std: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    resample: int = 3  # PIL.Image.BICUBIC

    @property
    def crop_size(self):
        return {"height": self.size, "width": self.size}

    def preprocess(self, image: Image.Image) -> np.ndarray:
        """-> [H, W, 3] float32 normalized."""
        img = image.convert("RGB").resize((self.size, self.size),
                                          self.resample)
        arr = np.asarray(img, np.float32) / 255.0
        mean = np.asarray(self.image_mean, np.float32)
        std = np.asarray(self.image_std, np.float32)
        return (arr - mean) / std


def expand2square(pil_img: Image.Image,
                  background_color) -> Image.Image:
    """Pad to square, centering the image (mm_utils.py:169-181)."""
    width, height = pil_img.size
    if width == height:
        return pil_img
    if width > height:
        result = Image.new(pil_img.mode, (width, width), background_color)
        result.paste(pil_img, (0, (width - height) // 2))
        return result
    result = Image.new(pil_img.mode, (height, height), background_color)
    result.paste(pil_img, ((height - width) // 2, 0))
    return result


def select_best_resolution(original_size: Tuple[int, int],
                           possible_resolutions) -> Tuple[int, int]:
    """Pick the anyres grid maximizing effective resolution then minimizing
    waste (mm_utils.py:30-57)."""
    ow, oh = original_size
    best, best_eff, best_waste = None, 0, float("inf")
    for w, h in possible_resolutions:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (w, h), eff, waste
    return best


def resize_and_pad_image(image: Image.Image,
                         target: Tuple[int, int]) -> Image.Image:
    """Aspect-preserving resize then center on black (mm_utils.py:60-92)."""
    ow, oh = image.size
    tw, th = target
    sw, sh = tw / ow, th / oh
    if sw < sh:
        nw, nh = tw, min(math.ceil(oh * sw), th)
    else:
        nh, nw = th, min(math.ceil(ow * sh), tw)
    resized = image.resize((nw, nh))
    out = Image.new("RGB", (tw, th), (0, 0, 0))
    out.paste(resized, ((tw - nw) // 2, (th - nh) // 2))
    return out


def divide_to_patches(image: Image.Image,
                      patch_size: int) -> List[Image.Image]:
    """Row-major crop grid (mm_utils.py:95-113)."""
    patches = []
    w, h = image.size
    for i in range(0, h, patch_size):
        for j in range(0, w, patch_size):
            patches.append(image.crop((j, i, j + patch_size,
                                       i + patch_size)))
    return patches


def get_anyres_image_grid_shape(image_size, grid_pinpoints, patch_size):
    """(mm_utils.py:116-134)"""
    if isinstance(grid_pinpoints, list):
        possible = grid_pinpoints
    else:
        possible = ast.literal_eval(grid_pinpoints)
    w, h = select_best_resolution(image_size, possible)
    return w // patch_size, h // patch_size


def process_anyres_image(image: Image.Image,
                         processor: ImageProcessorConfig,
                         grid_pinpoints) -> np.ndarray:
    """[1 + n_patches, H, W, 3] (mm_utils.py:137-162)."""
    if isinstance(grid_pinpoints, list):
        possible = grid_pinpoints
    else:
        possible = ast.literal_eval(grid_pinpoints)
    best = select_best_resolution(image.size, possible)
    padded = resize_and_pad_image(image, best)
    patches = divide_to_patches(padded, processor.crop_size["height"])
    base = image.resize((processor.size, processor.size))
    return np.stack([processor.preprocess(p)
                     for p in [base] + patches])


def load_image_from_base64(image: str) -> Image.Image:
    return Image.open(BytesIO(base64.b64decode(image)))


def process_images(images: Sequence[Image.Image],
                   image_processor: ImageProcessorConfig,
                   image_aspect_ratio: Optional[str] = None,
                   image_grid_pinpoints=None) -> np.ndarray:
    """Batch preprocessing (mm_utils.py:184-201). Returns [B, H, W, 3]
    (or a list when anyres shapes differ)."""
    if image_aspect_ratio == "pad":
        out = []
        for image in images:
            bg = tuple(int(x * 255) for x in image_processor.image_mean)
            out.append(image_processor.preprocess(
                expand2square(image.convert("RGB"), bg)))
        return np.stack(out)
    if image_aspect_ratio == "anyres":
        out = [process_anyres_image(im, image_processor,
                                    image_grid_pinpoints) for im in images]
        if all(x.shape == out[0].shape for x in out):
            return np.stack(out)
        return out
    return np.stack([image_processor.preprocess(im) for im in images])


def tokenizer_image_token(prompt: str, tokenizer,
                          image_token_index: int = IMAGE_TOKEN_INDEX
                          ) -> List[int]:
    """Tokenize around '<image>' and splice the image token id, keeping a
    single BOS (mm_utils.py:204-222)."""
    prompt_chunks = [tokenizer(chunk).input_ids
                     for chunk in prompt.split("<image>")]

    def insert_separator(X, sep):
        return [e for pair in zip(X, [sep] * len(X)) for e in pair][:-1]

    input_ids: List[int] = []
    offset = 0
    bos = getattr(tokenizer, "bos_token_id", None)
    if prompt_chunks and prompt_chunks[0] and bos is not None \
            and prompt_chunks[0][0] == bos:
        offset = 1
        input_ids.append(prompt_chunks[0][0])
    for x in insert_separator(prompt_chunks,
                              [image_token_index] * (offset + 1)):
        input_ids.extend(x[offset:])
    return input_ids


def get_model_name_from_path(model_path: str) -> str:
    model_path = model_path.strip("/")
    parts = model_path.split("/")
    if parts[-1].startswith("checkpoint-"):
        return parts[-2] + "_" + parts[-1]
    return parts[-1]


class KeywordsStoppingCriteria:
    """Stop generation when any keyword appears after the prompt
    (mm_utils.py:233-265); operates on generated id lists."""

    def __init__(self, keywords: List[str], tokenizer):
        self.keywords = keywords
        self.tokenizer = tokenizer
        self.keyword_ids = []
        self.max_keyword_len = 0
        bos = getattr(tokenizer, "bos_token_id", None)
        for kw in keywords:
            ids = tokenizer(kw).input_ids
            if len(ids) > 1 and bos is not None and ids[0] == bos:
                ids = ids[1:]
            self.max_keyword_len = max(self.max_keyword_len, len(ids))
            self.keyword_ids.append(ids)

    def should_stop(self, generated_ids: List[int]) -> bool:
        for ids in self.keyword_ids:
            if len(generated_ids) >= len(ids) and \
                    list(generated_ids[-len(ids):]) == list(ids):
                return True
        tail = generated_ids[-self.max_keyword_len:] \
            if self.max_keyword_len else []
        if tail:
            text = self.tokenizer.decode(tail, skip_special_tokens=True)
            return any(kw in text for kw in self.keywords)
        return False
