"""Single-process interactive chat CLI.

Re-design of `moe_model/serve/cli.py:32-127`: load model -> conversation
template -> process image -> streaming generate loop.
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional

import numpy as np

from ..multimodal.conversation import conv_templates
from ..multimodal.mm_utils import process_images, tokenizer_image_token


def chat_loop(adapter, image_path: Optional[str] = None,
              conv_template: str = "phi35", max_new_tokens: int = 256,
              temperature: float = 0.0, speculative: int = 0,
              in_stream=sys.stdin, out_stream=sys.stdout):
    """adapter: eval.JaxLlava. Reads prompts, prints replies token by
    token as they decode (the reference CLI's TextStreamer role,
    moe_model/serve/cli.py:95-118); speculative=K enables prompt-lookup
    speculation (greedy bit-exact; temp>0 via the unbiased rejection
    scheme)."""
    from ..models.llava import stream_generate

    conv = conv_templates[conv_template].copy()
    px = None
    if image_path:
        from PIL import Image
        img = Image.open(image_path)
        px = process_images([img], adapter.image_processor)
    first = True
    while True:
        out_stream.write(f"{conv.roles[0]}: ")
        out_stream.flush()
        try:
            inp = in_stream.readline()
        except KeyboardInterrupt:
            break
        if not inp:
            break
        inp = inp.strip()
        if not inp or inp in ("exit", "quit"):
            break
        if px is not None and first:
            inp = "<image>\n" + inp
            first = False
        conv.append_message(conv.roles[0], inp)
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt()
        ids = adapter.tokenizer_ids_for_prompt(prompt, px is not None)
        out_stream.write(f"{conv.roles[1]}: ")
        out_stream.flush()
        tokens: list = []
        printed = ""
        final = ""
        # hold back enough chars that a marker straddling a chunk
        # boundary ('<|end|>' arriving as '<|e' + 'nd|>') is never
        # partially printed; flushed after the stream ends
        hold = len("<|end|>") - 1
        for chunk in stream_generate(
                adapter.model, adapter.params,
                np.asarray([ids], np.int32), px,
                max_new_tokens=max_new_tokens, temperature=temperature,
                eos_token_id=getattr(adapter.tokenizer, "eos_token_id",
                                     None),
                stop_token_ids=adapter.stop_token_ids,
                speculative=speculative):
            tokens.extend(int(t) for t in chunk[0])
            text = adapter.tokenizer.decode(tokens,
                                            skip_special_tokens=True)
            if text.endswith("�"):
                continue    # incomplete multi-byte char: wait for more
            final = text = text.split("<|end|>")[0]
            safe = text[: max(0, len(text) - hold)]
            if safe.startswith(printed) and len(safe) > len(printed):
                out_stream.write(safe[len(printed):])
                out_stream.flush()
                printed = safe
        # conversation state always comes from the FINAL decoded text,
        # never from what happened to be printable incrementally
        if final.startswith(printed) and len(final) > len(printed):
            out_stream.write(final[len(printed):])
        conv.messages[-1][1] = final.strip()
        out_stream.write("\n")
        out_stream.flush()
    return conv
