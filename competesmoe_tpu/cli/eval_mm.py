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
    ap.add_argument("--model-dir", default="")
    ap.add_argument("--tokenizer", default="",
                    help="HF tokenizer dir (defaults to --model-dir)")
    ap.add_argument("--tasks", default="",
                    help="comma-separated task names")
    ap.add_argument("--task-yaml", nargs="*", default=[],
                    help="reference-style task yaml files to register")
    ap.add_argument("--config", default="",
                    help="yaml with a LIST of eval run configs; each "
                         "entry's keys override these flags (the "
                         "reference __main__.py multi-config loop)")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--max-new-tokens", type=int, default=128)
    ap.add_argument("--conv-template", default="phi35")
    ap.add_argument("--output-path", default="")
    ap.add_argument("--log-samples", action="store_true")
    ap.add_argument("--wandb", action="store_true",
                    help="mirror results/samples tables to wandb "
                         "(logging_utils.py role)")
    ap.add_argument("--wandb-project", default="competesmoe_tpu-eval")
    ap.add_argument("--return-id-experts", action="store_true",
                    help="collect per-layer routing telemetry")
    # rank/world default from the scheduler env (SLURM/torchrun — the
    # reference's accelerate-driven rank split, models/llava.py:139-160)
    ap.add_argument("--rank", type=int, default=None)
    ap.add_argument("--world-size", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    # quantized inference (reference __main__ passes these through
    # model_args to builder.load_pretrained_model)
    ap.add_argument("--load-8bit", action="store_true")
    ap.add_argument("--load-4bit", action="store_true")
    ap.add_argument("--kv-quant", default="", choices=["", "int8"])
    ap.add_argument("--mesh", default="",
                    help="DxM tensor-parallel mesh (e.g. 1x8): shard the "
                         "decoder over M chips for eval of models larger "
                         "than one chip (serve.model_worker shares the "
                         "same path)")
    ap.add_argument("--speculative", type=int, default=0,
                    help="prompt-lookup speculative decoding for "
                         "batch-1 generation tasks: verify K drafted "
                         "tokens per device step (greedy: bit-exact, "
                         "scores unchanged; sampled gen_kwargs: "
                         "unbiased rejection scheme)")
    ap.add_argument("--engine-slots", type=int, default=0,
                    help="run generation tasks through the continuous-"
                         "batching DecodeEngine with N slots sharing "
                         "ONE batched decode step (token-exact vs the "
                         "solo path; ignored for --return-id-experts "
                         "runs, which need prefill telemetry)")
    ap.add_argument("--engine-pipeline", type=int, default=1,
                    help="with --engine-slots: pipelined tick dispatch "
                         "depth (decode call N+1 issued before call N "
                         "is read; token-exact). Ignored when "
                         "--speculative is set")
    ap.add_argument("--engine-max-len", type=int, default=0,
                    help="engine KV length (default: the model's "
                         "tokenizer_model_max_length)")
    ap.add_argument("--merge-dir", default="",
                    help="with --world-size > 1: shared directory for "
                         "cross-rank result merging — rank 0 prints "
                         "GLOBAL metrics over all ranks' samples "
                         "(the reference's accelerate gather role)")
    a = ap.parse_args(argv)
    if a.rank is None or a.world_size is None:
        from ..parallel.distributed import detect_env
        denv = detect_env()
        if a.rank is None:
            a.rank = denv.rank
        if a.world_size is None:
            a.world_size = denv.world_size

    # multi-config loop (evaluate/lmms_eval/__main__.py:120-160): a yaml
    # list of run configs, each overriding the CLI flags
    run_cfgs = [{}]
    if a.config:
        import yaml
        loaded = yaml.safe_load(Path(a.config).read_text())
        run_cfgs = loaded if isinstance(loaded, list) else [loaded]

    for path in a.task_yaml:
        from ..eval.task import load_task_yaml
        p = Path(path)
        if p.is_dir():
            # a reference-style tasks directory: register every yaml that
            # loads (some need deps unavailable offline — skip those)
            n_ok = 0
            for y in sorted(p.rglob("*.yaml")):
                try:
                    load_task_yaml(y)
                    n_ok += 1
                except Exception:
                    pass
            print(f"registered {n_ok} tasks from {p}")
        else:
            load_task_yaml(path)

    all_results = []
    for overrides in run_cfgs:
        run = argparse.Namespace(**{**vars(a), **{
            k.replace("-", "_"): v for k, v in (overrides or {}).items()}})
        if not run.model_dir or not run.tasks:
            raise SystemExit("--model-dir and --tasks are required "
                             "(via flags or --config entries)")
        tokenizer, model, variables, image_processor, _ = \
            load_pretrained_model(run.model_dir, dtype=jnp.bfloat16,
                                  load_8bit=run.load_8bit,
                                  load_4bit=run.load_4bit,
                                  kv_quant=run.kv_quant or None)
        if tokenizer is None or run.tokenizer:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(
                run.tokenizer or run.model_dir)
        if getattr(run, "mesh", ""):
            from ..serve.model_worker import shard_llava_params
            variables = shard_llava_params(variables, run.mesh)
        lm = harness.JaxLlava(model, variables, tokenizer,
                              image_processor,
                              conv_template=run.conv_template,
                              batch_size=run.batch_size,
                              max_new_tokens=run.max_new_tokens,
                              speculative=getattr(run, "speculative", 0),
                              engine_slots=getattr(run, "engine_slots", 0),
                              engine_max_len=getattr(run, "engine_max_len",
                                                     0),
                              engine_pipeline=getattr(
                                  run, "engine_pipeline", 1))
        results = harness.simple_evaluate(
            lm, run.tasks.split(","), limit=run.limit, rank=run.rank,
            world_size=run.world_size,
            return_id_experts=run.return_id_experts, seed=run.seed,
            merge_dir=getattr(run, "merge_dir", "") or None)
        print(harness.make_table(results))
        out_dir = Path(run.output_path) if run.output_path else \
            Path("eval_results")
        if run.output_path and run.output_path.endswith(".json"):
            Path(run.output_path).write_text(
                json.dumps(results, default=str, indent=1))
            print(f"wrote {run.output_path}")
        else:
            from ..eval.logging_utils import EvalResultsLogger
            rlog = EvalResultsLogger(out_dir, use_wandb=run.wandb,
                                     wandb_project=run.wandb_project,
                                     run_name=Path(run.model_dir).name)
            path = rlog.log_results(results,
                                    log_samples=run.log_samples)
            rlog.finish()
            print(f"wrote {path}")
        all_results.append(results)
    return all_results


if __name__ == "__main__":
    main()
