"""Evaluation entry point (the `moe-eval` role,
evaluate/lmms_eval/__main__.py:39-359).

  python -m competesmoe_tpu.cli.eval_mm --model-dir ckpt/ \
    --tasks pope,mme --limit 100 --output-path results.json \
    --return-id-experts
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax.numpy as jnp


def main(argv=None):
    from .. import eval as harness
    from ..eval import tasks_builtin  # noqa: F401  (register builtin tasks)
    from ..models.builder import load_pretrained_model

    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--tokenizer", default="",
                    help="HF tokenizer dir (defaults to --model-dir)")
    ap.add_argument("--tasks", required=True,
                    help="comma-separated task names")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--max-new-tokens", type=int, default=128)
    ap.add_argument("--conv-template", default="phi35")
    ap.add_argument("--output-path", default="")
    ap.add_argument("--return-id-experts", action="store_true",
                    help="collect per-layer routing telemetry")
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--world-size", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args(argv)

    tokenizer, model, variables, image_processor, _ = \
        load_pretrained_model(a.model_dir, dtype=jnp.bfloat16)
    if tokenizer is None or a.tokenizer:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(
            a.tokenizer or a.model_dir)
    lm = harness.JaxLlava(model, variables, tokenizer, image_processor,
                          conv_template=a.conv_template,
                          batch_size=a.batch_size,
                          max_new_tokens=a.max_new_tokens)
    results = harness.simple_evaluate(
        lm, a.tasks.split(","), limit=a.limit, rank=a.rank,
        world_size=a.world_size, return_id_experts=a.return_id_experts,
        seed=a.seed)
    print(harness.make_table(results))
    if a.output_path:
        Path(a.output_path).write_text(json.dumps(results, default=str,
                                                  indent=1))
        print(f"wrote {a.output_path}")


if __name__ == "__main__":
    main()
