"""Multimodal training entry point (the `moe-train` role,
moe_model/train/train_mem.py + train.py:1215-1526).

Wires the LLaVA data pipeline, the 3-stage recipe, flip schedules, the
Saver and the metric logger into a runnable loop — sharded over a
('data', 'expert') device mesh: dense params fully sharded over 'data'
(the ZeRO-3 analog of scripts/zero3.json), expert stacks on 'expert'
(the set_z3_leaf_modules role, train/train.py:1480 — experts are never
gathered, tokens travel via all-to-all), batch over the whole mesh,
gradient accumulation, resume-from-checkpoint, and optional LoRA
training (train.py:1310-1340).

  python -m competesmoe_tpu.cli.train_mm \
    --data-path llava_665k.json --image-folder images/ \
    --tokenizer microsoft/Phi-3.5-mini-instruct \
    --stage sft --moe-name competesmoe --num-experts 4 --num-selected 2 \
    --n-expert 2 --fsdp --grad-accum 2 --model-dir phi35-siglip/ ...
"""

from __future__ import annotations

import argparse
import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

VERSIONS = ["phi35", "phi3", "v1", "llama_2", "mpt", "smollm", "plain"]


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    # data
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--image-folder", default="")
    ap.add_argument("--tokenizer", required=True,
                    help="HF tokenizer name/dir")
    ap.add_argument("--version", default="phi35", choices=VERSIONS)
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
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="gradient-accumulation microbatches per step")
    ap.add_argument("--allow-tiny-dataset", action="store_true",
                    help="permit datasets smaller than one global batch "
                         "by cycling samples (smoke tests only)")
    ap.add_argument("--num-train-steps", type=int, default=1000)
    ap.add_argument("--warmup-ratio", type=float, default=0.03)
    ap.add_argument("--save-interval", type=int, default=500)
    ap.add_argument("--log-interval", type=int, default=10)
    ap.add_argument("--eval-interval", type=int, default=0,
                    help="run eval loss on --eval-data-path every N steps")
    ap.add_argument("--eval-data-path", default="")
    ap.add_argument("--eval-batches", type=int, default=8)
    ap.add_argument("--output-dir", default="runs/mm")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in "
                         "--output-dir (train.py:1501-1505's "
                         "resume_from_checkpoint auto-detect)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bf16", action="store_true", default=True)
    # sharding (scripts/zero3.json role)
    ap.add_argument("--n-expert", type=int, default=1,
                    help="expert-parallel axis size; devices/n_expert "
                         "becomes the data axis")
    ap.add_argument("--fsdp", action="store_true", default=True,
                    help="fully shard dense params over the data axis "
                         "(ZeRO-3 analog); --no-fsdp replicates them")
    ap.add_argument("--no-fsdp", dest="fsdp", action="store_false")
    ap.add_argument("--profile-start-step", type=int, default=-1,
                    help="capture a jax.profiler trace (TensorBoard) for "
                         "steps [N, N + --profile-n-steps)")
    ap.add_argument("--profile-n-steps", type=int, default=5)
    ap.add_argument("--opt-state-8bit", action="store_true",
                    help="hold Adam mu/nu blockwise-int8 "
                         "(train/quant_opt.py) — saves ~1.56 GB/chip at "
                         "5.1B, fitting the reference's seq-2048 sft "
                         "recipe on v5e-8 (docs/sharding.md)")
    ap.add_argument("--remat", action="store_true",
                    help="per-decoder-layer rematerialization "
                         "(jax.checkpoint): trade recompute FLOPs for "
                         "activation memory — the lever that fits the "
                         "5.1B sft on 16 GB chips")
    # LoRA training (train.py:1310-1340)
    ap.add_argument("--lora-enable", action="store_true")
    ap.add_argument("--lora-r", type=int, default=128)
    ap.add_argument("--lora-alpha", type=float, default=256)
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
    from ..parallel.ep_context import set_ep_mesh
    from ..parallel.mesh import (
        batch_sharding,
        make_mesh,
        make_param_shardings,
        put_batch,
        replicated,
    )
    from ..train.checkpoint import Saver
    from ..train.lm_trainer import TrainState
    from ..train.logger import ElapsedTimeMeter, MetricLogger
    from ..train.lora import (
        apply_lora,
        init_lora_params,
        lora_scaling,
        make_mm_lora_train_step,
    )
    from ..train.mm_task import (
        MMTrainConfig,
        build_mm_schedules,
        make_mm_eval_step,
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
    if a.remat:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, decoder=_dc.replace(cfg.decoder,
                                                   remat=True))

    tcfg = MMTrainConfig(
        stage=a.stage, learning_rate=a.learning_rate,
        mm_projector_lr=a.mm_projector_lr, warmup_ratio=a.warmup_ratio,
        total_steps=a.num_train_steps, rate_flip=a.rate_flip,
        warm_up=a.warm_up, max_compete_in_iter=a.max_compete_in_iter,
        schedule_seed=a.seed, opt_state_8bit=a.opt_state_8bit)
    vis_sched, proj_sched = build_mm_schedules(cfg, tcfg)
    model = LlavaModel(cfg, vision_flip_schedule=vis_sched,
                       projector_flip_schedule=proj_sched)

    dataset = LazySupervisedDataset(
        a.data_path, a.image_folder, tokenizer,
        image_processor=image_processor, version=a.version,
        image_aspect_ratio=a.image_aspect_ratio,
        model_max_length=a.model_max_length)
    # mesh: experts over 'expert', everything else data-parallel; batch is
    # global (per-device-batch * n_devices), sharded over the whole mesh.
    mesh = make_mesh(n_expert=a.n_expert)
    n_dev = len(jax.devices())
    if a.n_expert > 1:
        set_ep_mesh(mesh)
    global_batch = a.per_device_batch_size * n_dev
    if len(dataset) >= global_batch:
        sampler = LengthGroupedSampler(dataset.modality_lengths,
                                       global_batch, seed=a.seed)
    elif not a.allow_tiny_dataset:
        raise ValueError(
            f"dataset ({len(dataset)}) is smaller than one global batch "
            f"({global_batch} = {a.per_device_batch_size} x {n_dev} "
            f"devices): a real run would silently train on repeated "
            f"samples. Shrink --per-device-batch-size / the mesh, or "
            f"pass --allow-tiny-dataset for smoke tests.")
    else:
        # smoke runs (explicit --allow-tiny-dataset): dataset smaller
        # than one global batch — cycle indices so the sharded step
        # still gets a full batch
        print(f"dataset ({len(dataset)}) < global batch {global_batch}; "
              "cycling samples", flush=True)

        class _CycleSampler:
            epoch = 0

            def __iter__(self):
                idxs = list(range(len(dataset)))
                reps = -(-global_batch // len(idxs))
                self.epoch += 1
                yield (idxs * reps)[:global_batch]

        sampler = _CycleSampler()
    img_shape = (cfg.vision.image_size, cfg.vision.image_size, 3)
    collator = SupervisedCollator(
        pad_token_id=tokenizer.pad_token_id or 0,
        pad_to=a.model_max_length, image_shape=img_shape)

    params = variables["params"]
    with mesh:
        shardings = make_param_shardings(mesh, params, fsdp=a.fsdp)
        params = jax.device_put(params, shardings)
        b_shard = batch_sharding(mesh)

        if a.lora_enable:
            import optax
            base_params = params
            lora = init_lora_params(params, a.lora_r,
                                    jax.random.PRNGKey(a.seed))
            lora = jax.device_put(lora, replicated(mesh))
            optimizer = optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adamw(a.learning_rate, weight_decay=0.0))
            state = TrainState.create(lora, optimizer)
            lora_step = make_mm_lora_train_step(
                model, optimizer, lora_scaling(a.lora_r, a.lora_alpha),
                n_microbatch=a.grad_accum)

            def step_fn(state, batch):
                return lora_step(state, base_params, batch)
        else:
            optimizer = make_mm_optimizer(tcfg, params)
            state = TrainState.create(params, optimizer)
            step_fn = make_mm_train_step(model, optimizer,
                                         n_microbatch=a.grad_accum)

        saver = Saver(out_dir / "checkpoint",
                      save_interval=a.save_interval)
        saver["state"] = state
        saver["sampler"] = {"epoch": sampler.epoch}
        start_step = 0
        if a.resume and saver.latest_step() is not None:
            start_step = saver.restore()
            restored = saver["state"]
            # params: committed to their mesh shardings; opt_state/step:
            # uncommitted host copies, so jit propagates their placement
            # from the params (orbax restores everything committed to
            # device 0, which would conflict with the mesh otherwise)
            if a.lora_enable:
                new_params = jax.device_put(restored.params,
                                            replicated(mesh))
            else:
                new_params = jax.device_put(
                    restored.params,
                    make_param_shardings(mesh, restored.params,
                                         fsdp=a.fsdp))
            uncommit = jax.tree_util.tree_map(
                lambda x: jnp.asarray(np.asarray(x)),
                (restored.opt_state, restored.step))
            state = TrainState(params=new_params, opt_state=uncommit[0],
                               step=uncommit[1])
            saver["state"] = state
            sampler.epoch = int(saver["sampler"].get("epoch", 0))
            print(f"resumed from step {start_step}", flush=True)

        eval_step = None
        eval_dataset = None
        if a.eval_interval and a.eval_data_path:
            eval_dataset = LazySupervisedDataset(
                a.eval_data_path, a.image_folder, tokenizer,
                image_processor=image_processor, version=a.version,
                image_aspect_ratio=a.image_aspect_ratio,
                model_max_length=a.model_max_length)
            eval_step = make_mm_eval_step(model)

        logger = MetricLogger(out_dir, stdout_interval=a.log_interval)
        meter = ElapsedTimeMeter()

        # jax.profiler trace window (the LM task's -profile.* analog;
        # reference role: the commented torch.profiler block +
        # EfficiencyCallback timing)
        prof_start = a.profile_start_step
        prof_end = prof_start + a.profile_n_steps if prof_start >= 0 else -1

        batches = iter(sampler)
        for step in range(start_step, a.num_train_steps):
            if step == prof_start:
                jax.profiler.start_trace(str(out_dir / "trace"))
            try:
                idx = next(batches)
            except StopIteration:
                batches = iter(sampler)
                idx = next(batches)
            batch = collator([dataset[i] for i in idx])
            batch = {k: put_batch(v, mesh, b_shard)
                     for k, v in batch.items()}
            with meter:
                state, metrics = step_fn(state, batch)
            if step == prof_end - 1:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
            if step % a.log_interval == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["time_per_iteration"] = meter.mean_ms / 1000.0
                logger.log(step, metrics)
                meter.reset()
            if not math.isfinite(float(metrics.get("loss/total", 0.0))):
                raise FloatingPointError(f"non-finite loss at step {step}")
            if (eval_step is not None and step > 0
                    and step % a.eval_interval == 0):
                # LoRA runs: fold the TRAINED adapters into the frozen
                # base so eval/loss tracks training progress (evaluating
                # base_params alone would stay at the frozen-base value)
                params_now = (state.params if not a.lora_enable
                              else apply_lora(
                                  base_params, state.params,
                                  lora_scaling(a.lora_r, a.lora_alpha)))
                losses = []
                for bi in range(min(a.eval_batches,
                                    len(eval_dataset) // global_batch)):
                    ev = collator([eval_dataset[j] for j in
                                   range(bi * global_batch,
                                         (bi + 1) * global_batch)])
                    ev = {k: put_batch(v, mesh, b_shard)
                          for k, v in ev.items()}
                    losses.append(float(eval_step(params_now, ev)))
                logger.log(step, {"eval/loss": float(np.mean(losses))})
            saver["state"] = state
            saver["sampler"] = {"epoch": sampler.epoch}
            saver.tick(step + 1)
        saver["state"] = state
        saver.save(a.num_train_steps)
        logger.close()


if __name__ == "__main__":
    main()
