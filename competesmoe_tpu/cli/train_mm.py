"""Multimodal training entry point (the `moe-train` role,
moe_model/train/train_mem.py + train.py:1215-1526).

Wires the LLaVA data pipeline, the 3-stage recipe, flip schedules, the
Saver and the metric logger into a runnable loop:

  python -m competesmoe_tpu.cli.train_mm \
    --data-path llava_665k.json --image-folder images/ \
    --tokenizer microsoft/Phi-3.5-mini-instruct \
    --stage sft --moe-name competesmoe --num-experts 4 --num-selected 2 \
    --vision-tower-dir siglip.safetensors --decoder-dir phi35/ ...
"""

from __future__ import annotations

import argparse
import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    # data
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--image-folder", default="")
    ap.add_argument("--tokenizer", required=True,
                    help="HF tokenizer name/dir")
    ap.add_argument("--version", default="phi35",
                    choices=["phi35", "plain"])
    ap.add_argument("--image-aspect-ratio", default="pad")
    ap.add_argument("--model-max-length", type=int, default=2048)
    # model
    ap.add_argument("--model-dir", default="",
                    help="HF checkpoint dir to initialize from "
                         "(builder.load_pretrained_model)")
    ap.add_argument("--moe-name", default="competesmoe")
    ap.add_argument("--num-experts", type=int, default=4)
    ap.add_argument("--num-selected", type=int, default=2)
    ap.add_argument("--clip-smoe", action="store_true", default=True)
    ap.add_argument("--mlp-smoe", action="store_true", default=True)
    # schedule / losses (sft.sh defaults)
    ap.add_argument("--rate-flip", type=float, default=0.05)
    ap.add_argument("--warm-up", type=float, default=0.0)
    ap.add_argument("--max-compete-in-iter", type=int, default=2)
    ap.add_argument("--balance-loss-coef", type=float, default=0.01)
    ap.add_argument("--router-z-loss-coef", type=float, default=0.001)
    # train
    ap.add_argument("--stage", default="sft",
                    choices=["pretrain", "pft", "sft"])
    ap.add_argument("--learning-rate", type=float, default=4e-6)
    ap.add_argument("--mm-projector-lr", type=float, default=None)
    ap.add_argument("--per-device-batch-size", type=int, default=4)
    ap.add_argument("--num-train-steps", type=int, default=1000)
    ap.add_argument("--warmup-ratio", type=float, default=0.03)
    ap.add_argument("--save-interval", type=int, default=500)
    ap.add_argument("--log-interval", type=int, default=10)
    ap.add_argument("--output-dir", default="runs/mm")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bf16", action="store_true", default=True)
    return ap


def main(argv=None):
    from transformers import AutoTokenizer

    from ..data.mm_data import (
        LazySupervisedDataset,
        LengthGroupedSampler,
        SupervisedCollator,
    )
    from ..models.builder import load_pretrained_model
    from ..models.llava import LlavaModel
    from ..multimodal.mm_utils import ImageProcessorConfig
    from ..train.checkpoint import Saver
    from ..train.lm_trainer import TrainState
    from ..train.logger import ElapsedTimeMeter, MetricLogger
    from ..train.mm_task import (
        MMTrainConfig,
        build_mm_schedules,
        make_mm_optimizer,
        make_mm_train_step,
    )

    a = build_argparser().parse_args(argv)
    out_dir = Path(a.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    tokenizer = AutoTokenizer.from_pretrained(a.tokenizer)

    if not a.model_dir:
        raise SystemExit("--model-dir pointing at an HF-format checkpoint "
                         "is required (see models/builder.py)")
    _, model0, variables, image_processor, _ = load_pretrained_model(
        a.model_dir, dtype=jnp.bfloat16 if a.bf16 else jnp.float32)
    cfg = model0.cfg

    tcfg = MMTrainConfig(
        stage=a.stage, learning_rate=a.learning_rate,
        mm_projector_lr=a.mm_projector_lr, warmup_ratio=a.warmup_ratio,
        total_steps=a.num_train_steps, rate_flip=a.rate_flip,
        warm_up=a.warm_up, max_compete_in_iter=a.max_compete_in_iter,
        schedule_seed=a.seed)
    vis_sched, proj_sched = build_mm_schedules(cfg, tcfg)
    model = LlavaModel(cfg, vision_flip_schedule=vis_sched,
                       projector_flip_schedule=proj_sched)

    dataset = LazySupervisedDataset(
        a.data_path, a.image_folder, tokenizer,
        image_processor=image_processor, version=a.version,
        image_aspect_ratio=a.image_aspect_ratio,
        model_max_length=a.model_max_length)
    sampler = LengthGroupedSampler(dataset.modality_lengths,
                                   a.per_device_batch_size, seed=a.seed)
    img_shape = (cfg.vision.image_size, cfg.vision.image_size, 3)
    collator = SupervisedCollator(
        pad_token_id=tokenizer.pad_token_id or 0,
        pad_to=a.model_max_length, image_shape=img_shape)

    params = variables["params"]
    optimizer = make_mm_optimizer(tcfg, params)
    state = TrainState.create(params, optimizer)
    step_fn = make_mm_train_step(model, optimizer)

    saver = Saver(out_dir / "checkpoint", save_interval=a.save_interval)
    saver["state"] = state
    logger = MetricLogger(out_dir, stdout_interval=a.log_interval)
    meter = ElapsedTimeMeter()

    batches = iter(sampler)
    for step in range(a.num_train_steps):
        try:
            idx = next(batches)
        except StopIteration:
            batches = iter(sampler)
            idx = next(batches)
        batch = collator([dataset[i] for i in idx])
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        with meter:
            state, metrics = step_fn(state, batch)
        if step % a.log_interval == 0:
            metrics = {k: float(v) for k, v in metrics.items()}
            metrics["time_per_iteration"] = meter.mean_ms / 1000.0
            logger.log(step, metrics)
            meter.reset()
        if not math.isfinite(float(metrics.get("loss/total", 0.0))):
            raise FloatingPointError(f"non-finite loss at step {step}")
        saver["state"] = state
        saver.tick(step + 1)
    saver["state"] = state
    saver.save(a.num_train_steps)
    logger.close()


if __name__ == "__main__":
    main()
