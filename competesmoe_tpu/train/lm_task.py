"""LM pretraining task: the full train/validate/checkpoint loop.

Re-design of `moe_pretrain_model/framework/task/{task,simple_task}.py` +
`tasks/{lm_base,transformer_lm_mixin,*_transformer}.py`:

- `@task` registry keyed by snake-case name (task/task_db.py)
- deterministic flip-schedule construction chained across layers
  (transformer_lm_mixin.py:257-268) — here a pure function of the seed
- train loop: batch fetch -> jitted step (bf16, microbatch accumulation,
  aux-reg fold-in) -> timing meters -> metric log -> saver tick
- periodic validation perplexity; NaN guard (simple_task.py:314-324)
- auto-resume from the latest checkpoint, restoring sampler position and
  run args (training_helper.py:195-242)
"""

from __future__ import annotations

import math
import time
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.lm_data import (
    InfiniteRandomSampler,
    SequentialMultibatchSampler,
    SyntheticLMDataset,
    open_chunk_dir,
)
from ..models.lm import LMConfig, MoELanguageModel
from ..moe import MoEArgs, build_flip_schedule
from ..parallel import batch_sharding, make_mesh, make_param_shardings
from ..utils.argparser import ArgumentParser, DotDict, args
from .checkpoint import Saver
from .lm_trainer import (
    OptConfig,
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from .logger import ElapsedTimeMeter, MetricLogger

TASK_REGISTRY: Dict[str, type] = {}


def task(name: Optional[str] = None):
    def decorate(cls):
        key = name or _snake(cls.__name__)
        TASK_REGISTRY[key] = cls
        return cls
    return decorate


def get_task(name: str) -> type:
    try:
        return TASK_REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown task {name!r}; registered: "
                         f"{', '.join(sorted(TASK_REGISTRY))}") from None


def _snake(name: str) -> str:
    out = []
    for i, c in enumerate(name):
        if c.isupper() and i > 0:
            out.append("_")
        out.append(c.lower())
    return "".join(out)


@args
def _task_args(parser: ArgumentParser):
    parser.add_argument("-task", default="synthetic_transformer")
    parser.add_argument("-name", default="run")
    parser.add_argument("-run_dir", default="runs")
    parser.add_argument("-seed", default=0)
    parser.add_argument("-restore", default="",
                        parser=parser.str_or_none_parser)
    parser.add_argument("-test_only", default=False)
    parser.add_argument("-stop_after", default=1000)
    parser.add_argument("-batch_size", default=64)
    parser.add_argument("-n_microbatch", default=1)
    parser.add_argument("-lr", default=2.5e-4)
    parser.add_argument("-lr_sched.type", default="cos",
                        choice=["cos", "constant"])
    parser.add_argument("-lr_warmup", default=0)
    parser.add_argument("-grad_clip", default=0.25)
    parser.add_argument("-wd", default=0.0)
    # blockwise-int8 Adam mu/nu (train/quant_opt.py)
    parser.add_argument("-opt.state_8bit", default=False)
    parser.add_argument("-amp", default=True)  # bf16 activations
    parser.add_argument("-save_interval", default=1000)
    parser.add_argument("-keep_last", default=2)
    parser.add_argument("-log_interval", default=10)
    parser.add_argument("-valid_interval", default=500)
    parser.add_argument("-valid_batches", default=10)
    parser.add_argument("-n_expert_shards", default=1)
    # sequence/context parallelism: shard attention over a 'seq' mesh
    # axis — plain causal attention runs as a K/V ring over ICI
    # (parallel/ring_attention.py), removing the single-chip T^2 score
    # matrix. The reference has no long-context mechanism (SURVEY §5).
    parser.add_argument("-n_seq_shards", default=1)
    # fully-sharded dense params over the data axis (the reference's
    # DeepSpeed ZeRO-3 role, scripts/zero3.json; experts keep their own
    # axis like set_z3_leaf_modules kept them gather-free)
    parser.add_argument("-fsdp", default=False)
    parser.add_argument("-fsdp.min_size", default=65536)
    # per-block rematerialization: recompute activations in backward
    # (jax.checkpoint) — the long-unroll memory lever
    parser.add_argument("-remat", default=False)
    # profiling: capture a jax.profiler trace for steps [start, start+n)
    # (the reference's commented torch.profiler block + -speedtest,
    # simple_task.py:361-381,439-445)
    parser.add_argument("-nan_detect", default=False)
    parser.add_argument("-profile.start_step", default=-1)
    parser.add_argument("-profile.n_steps", default=5)
    # experiment tracking (reference visualize/plot.py W&B logger)
    parser.add_argument("-log", default="tb", choice=["tb", "wandb"])
    parser.add_argument("-wandb.project", default="competesmoe_tpu")
    parser.add_argument("-log_async", default=False)
    # lm
    parser.add_argument("-lm.unroll", default=1024)
    parser.add_argument("-lm.vocab_size", default=8000)
    parser.add_argument("-lm.data_dir", default="")
    # streaming corpora (c4/slimpajama/pes2o tasks)
    parser.add_argument("-lm.cache_dir", default="./cache")
    parser.add_argument("-lm.n_shards", default=1)
    parser.add_argument("-lm.valid_n_shards", default=1)
    parser.add_argument("-lm.token_limit", default="none",
                        parser=parser.int_or_none_parser)
    # comma/glob list of LOCAL shard files; overrides the remote spec
    parser.add_argument("-lm.shards", default="")
    parser.add_argument("-lm.tokenizer_algo", default="unigram",
                        choice=["unigram", "bpe"])
    parser.add_argument("-lm.tokenizer_n_files", default="none",
                        parser=parser.int_or_none_parser)
    parser.add_argument("-lm.thestack_languages", default="python")
    # mixture_transformer (latent-mode Markov corpus for the A/B study,
    # docs/science.md)
    parser.add_argument("-lm.mixture.n_modes", default=16)
    parser.add_argument("-lm.mixture.coherence", default=0.85)
    parser.add_argument("-lm.mixture.zipf_alpha", default=1.2)
    # preemption auto-resume (training_helper.py:159-182 job records)
    parser.add_argument("-job_record_dir", default="jobs")
    # downstream zero-shot QA battery (reference lm_eval_mixin.py:16-39)
    parser.add_argument("-lm.eval.enabled", default=True)
    parser.add_argument("-lm.eval.pad_quantum", default=128)
    for _qa in ("lambada", "blimp", "cbt", "hellaswag", "piqa", "ai2arc",
                "openbookqa", "race", "siqa", "winogrande",
                "commonsenseqa"):
        parser.add_argument(f"-lm.eval.{_qa}.enabled", default=False)
        parser.add_argument(f"-lm.eval.{_qa}.path", default="")
    parser.add_argument("-lm.eval.piqa.labels_path", default="")
    parser.add_argument("-lm.eval.siqa.labels_path", default="")
    # transformer
    parser.add_argument("-state_size", default=512)
    parser.add_argument("-transformer.encoder_n_layers", default=16)
    parser.add_argument("-transformer.n_heads", default=4)
    parser.add_argument("-transformer.head_projection_size", default="none",
                        parser=parser.int_or_none_parser)
    parser.add_argument("-transformer.attn_backend", default="auto",
                        choice=["auto", "einsum", "flash"])
    parser.add_argument("-transformer.universal.group_size", default=1)
    parser.add_argument("-transformer.universal.group_type", default="abab",
                        choice=["abab", "aabb"])
    parser.add_argument("-dropout", default=0.0)
    # rope
    parser.add_argument("-rope.rotate_fraction", default=0.5)
    parser.add_argument("-rope.base", default=10000.0)
    # MoA attention (reference -moe.att.* flags,
    # transformer_lm_mixin.py:48-65)
    parser.add_argument("-moe.att.enable", default=False)
    parser.add_argument("-moe.att.n_experts", default=4)
    parser.add_argument("-moe.att.k", default=2)
    parser.add_argument("-moe.att.q_expert", default=True)
    parser.add_argument("-moe.att.k_expert", default=True)
    parser.add_argument("-moe.att.v_expert", default=True)
    parser.add_argument("-moe.att.o_expert", default=True)
    parser.add_argument("-moe.att.v_size", default="none",
                        parser=parser.int_or_none_parser)
    parser.add_argument("-moe.att.drop_expert", default=0.0)
    parser.add_argument("-moe.att.selection_dropout", default=0.0)
    # moe
    parser.add_argument("-moe_name", default="competesmoe")
    parser.add_argument("-moe.n_experts", default=64)
    parser.add_argument("-moe.expert_size", default=128)
    parser.add_argument("-pkm.n_heads", default=8)
    parser.add_argument("-moe.impl", default="auto",
                        choice=["auto", "dense", "grouped", "ep", "fused"])
    # moe losses / competesmoe schedule (names match the reference flags,
    # transformer_lm_mixin.py:76-92)
    parser.add_argument("-balance_loss_coef", default=0.01)
    parser.add_argument("-balance_loss_coef_comp", default=0.01)
    parser.add_argument("-router_z_loss_coef", default=0.001)
    parser.add_argument("-router_loss_coef", default=0.01)
    parser.add_argument("-max_compete_in_iter", default=2)
    parser.add_argument("-warm_up", default=0.05)
    parser.add_argument("-rate_flip", default=0.07)
    parser.add_argument("-router_theta", default=0.1)
    parser.add_argument("-scale_weight", default=1.0)
    parser.add_argument("-hybrid", default=False)
    parser.add_argument("-tribrid", default=False)
    parser.add_argument("-in_topk", default=False)
    parser.add_argument("-balance_affinity", default=False)
    parser.add_argument("-is_cosine", default=False)
    parser.add_argument("-is_norm_weight", default=False)
    parser.add_argument("-norm_sigmoid", default=False)


def moe_args_from(a: DotDict) -> MoEArgs:
    return MoEArgs(
        balance_loss_coef=a.balance_loss_coef,
        balance_loss_coef_comp=a.balance_loss_coef_comp,
        router_z_loss_coef=a.router_z_loss_coef,
        router_loss_coef=a.router_loss_coef,
        max_compete_in_iter=a.max_compete_in_iter,
        warm_up=a.warm_up, rate_flip=a.rate_flip,
        router_theta=a.router_theta, scale_weight=a.scale_weight,
        hybrid=a.hybrid, tribrid=a.tribrid, in_topk=a.in_topk,
        balance_affinity=a.balance_affinity, is_cosine=a.is_cosine,
        is_norm_weight=a.is_norm_weight, norm_sigmoid=a.norm_sigmoid,
        schedule_seed=a.seed,
    ).validate()


def lm_config_from(a: DotDict) -> LMConfig:
    return LMConfig(
        vocab_size=a.lm.vocab_size, d_model=a.state_size,
        n_layers=a.transformer.encoder_n_layers,
        n_heads=a.transformer.n_heads,
        head_dim=a.transformer.head_projection_size,
        dropout=a.dropout, moe_name=a.moe_name,
        n_experts=a.moe.n_experts, expert_size=a.moe.expert_size,
        moe_topk=a.pkm.n_heads, moe_args=moe_args_from(a),
        moe_impl=a.moe.impl,
        rotate_fraction=a.rope.rotate_fraction, rope_base=a.rope.base,
        att_moe=a.moe.att.enable, att_n_experts=a.moe.att.n_experts,
        att_k=a.moe.att.k, att_q_expert=a.moe.att.q_expert,
        att_k_expert=a.moe.att.k_expert, att_v_expert=a.moe.att.v_expert,
        att_o_expert=a.moe.att.o_expert, att_v_size=a.moe.att.v_size,
        att_expert_dropout=a.moe.att.drop_expert,
        att_selection_dropout=a.moe.att.selection_dropout,
        attn_backend=a.transformer.attn_backend,
        universal_group_size=a.transformer.universal.group_size,
        universal_group_type=a.transformer.universal.group_type,
        remat=bool(a.remat),
        dtype=jnp.bfloat16 if a.amp else jnp.float32,
    )


@task("synthetic_transformer")
class SyntheticTransformerTask:
    """LM pretraining on the synthetic corpus (offline stand-in for the
    reference's {c4,slimpajama,pes2o,thestack}_transformer tasks)."""

    def __init__(self, a: DotDict):
        self.a = a
        self.run_dir = Path(a.run_dir) / a.name
        self.run_dir.mkdir(parents=True, exist_ok=True)
        from .logger import AsyncMetricLogger
        logger_cls = AsyncMetricLogger if a.log_async else MetricLogger
        self.logger = logger_cls(self.run_dir,
                                 use_wandb=a.log == "wandb",
                                 wandb_project=a.wandb.project,
                                 run_name=a.name,
                                 stdout_interval=a.log_interval)
        self.dataset, self.valid_dataset = self.create_datasets()
        self.sampler = SequentialMultibatchSampler(
            n_items=len(self.dataset), batch_size=a.batch_size)

        cfg = lm_config_from(a)
        self.cfg = cfg
        schedule = None
        if cfg.moe_name == "competesmoe" and not a.test_only:
            schedule = build_flip_schedule(
                cfg.n_layers, a.stop_after, a.warm_up, a.rate_flip,
                a.max_compete_in_iter, seed=a.seed)
        self.schedule = schedule
        self.model = MoELanguageModel(cfg, flip_schedule=schedule)

        self.mesh = make_mesh(n_expert=a.n_expert_shards,
                              n_seq=a.n_seq_shards)
        if a.n_seq_shards > 1 and a.lm.unroll % a.n_seq_shards != 0:
            raise ValueError(
                f"-lm.unroll {a.lm.unroll} must divide by "
                f"-n_seq_shards {a.n_seq_shards} (ring attention blocks)")
        n_dev = self.mesh.devices.size
        if a.batch_size % n_dev != 0:
            raise ValueError(
                f"-batch_size {a.batch_size} must be divisible by the "
                f"number of devices ({n_dev}); the global batch is "
                f"sharded over the full mesh")
        if a.moe.impl == "ep" and a.n_expert_shards <= 1:
            raise ValueError("-moe.impl ep requires -n_expert_shards > 1")
        # Route MoE dispatch through the explicit all-to-all path
        # (parallel/expert_parallel.py) instead of XLA auto-sharding; the
        # context is scoped to this task's loops (see _ep_scope) so it is
        # read at jit-trace time without leaking process-global state.
        self._use_ep = (a.n_expert_shards > 1
                        and a.moe.impl in ("auto", "ep"))
        self.optimizer = make_optimizer(OptConfig(
            lr=a.lr, lr_sched=a.lr_sched.type, warmup_steps=a.lr_warmup,
            total_steps=a.stop_after, grad_clip=a.grad_clip,
            weight_decay=a.wd, state_8bit=a.opt.state_8bit))

        with self.mesh, self._ep_scope():
            tokens0 = jnp.zeros((a.batch_size, a.lm.unroll + 1), jnp.int32)
            params = self.model.init(jax.random.PRNGKey(a.seed),
                                     tokens0[:, :-1])["params"]
            params = jax.device_put(
                params,
                make_param_shardings(self.mesh, params, fsdp=a.fsdp,
                                     fsdp_min_size=a.fsdp.min_size))
            self.state = TrainState.create(params, self.optimizer)
        self.train_step = make_train_step(self.model, self.optimizer,
                                          n_microbatch=a.n_microbatch)
        self.eval_step = make_eval_step(self.model)

        # Preemption auto-resume (training_helper.py:159-182): a restarted
        # scheduler job reads its job record to find the checkpoint dir of
        # the interrupted run, even when the run name changed.
        from ..parallel.distributed import detect_env, is_restart, \
            run_identifier
        self.denv = detect_env()
        ckpt_dir = self.run_dir / "checkpoint"
        record = Path(a.job_record_dir) / run_identifier(self.denv)
        if is_restart(self.denv) and record.exists():
            recorded = Path(record.read_text().strip())
            if recorded.exists():
                print(f"restart detected; resuming from job record "
                      f"{recorded}")
                ckpt_dir = recorded

        self.saver = Saver(ckpt_dir,
                           save_interval=a.save_interval,
                           keep_last=a.keep_last)
        self.saver["state"] = self.state
        self.saver["sampler"] = self.sampler
        self.saver["args"] = ArgumentParser.namespace_to_dict(a)
        if schedule is not None:
            from ..moe.schedule import schedule_to_dict
            self.saver["flip_schedule"] = schedule_to_dict(schedule)
        self.start_step = 0
        if a.restore:
            self.start_step = self.restore(a.restore)
        elif self.saver.latest_step() is not None:
            self.start_step = self.restore()
        if self.denv.is_preemptible and self.denv.is_master:
            record.parent.mkdir(parents=True, exist_ok=True)
            record.write_text(str(ckpt_dir))

    def _ep_scope(self):
        """Parallel-dispatch context for this task's jit traces: expert
        parallelism (all-to-all MoE dispatch) and/or sequence
        parallelism (ring attention over the 'seq' axis)."""
        import contextlib
        stack = contextlib.ExitStack()
        if self._use_ep:
            from ..parallel.ep_context import use_expert_parallel
            stack.enter_context(use_expert_parallel(self.mesh))
        if "seq" in self.mesh.axis_names:
            from ..parallel.seq_context import use_sequence_parallel
            stack.enter_context(use_sequence_parallel(self.mesh))
        return stack

    # -- data --

    def create_datasets(self):
        a = self.a
        train = SyntheticLMDataset(a.lm.vocab_size, a.lm.unroll,
                                   n_windows=1 << 16, seed=a.seed)
        valid = SyntheticLMDataset(a.lm.vocab_size, a.lm.unroll,
                                   n_windows=1 << 10, seed=a.seed + 1)
        return train, valid

    # -- checkpoint --

    def restore(self, path_or_step=None) -> int:
        """Accepts a step number, a `model-<step>` checkpoint path, or a
        checkpoint directory (the reference's `--restore <ckpt_path>`
        convention, run_tests.py:36 / training_helper.py:195-242)."""
        step = None
        if isinstance(path_or_step, str) and path_or_step:
            p = Path(path_or_step)
            if p.exists():
                if p.name.startswith("model-"):
                    # point the saver at the foreign checkpoint dir
                    self.saver.dir = p.parent
                    step = int(p.name.split("-", 1)[1])
                else:
                    self.saver.dir = p
            else:
                step = int(path_or_step)
        self.saver["state"] = self.state
        restored = self.saver.restore(step)
        self.state = self.saver["state"]
        # The competition schedule is part of training state: a resumed run
        # must keep the ORIGINAL schedule even if stop_after changed
        # (the reference serializes prob_flips as a buffer,
        # competesmoe.py:32). Rebuild the model/steps if it differs.
        if self.schedule is not None and "flip_schedule" in \
                self.saver._elements:
            from ..moe.schedule import schedule_from_dict, schedule_to_dict
            saved = schedule_from_dict(self.saver["flip_schedule"])
            if not np.array_equal(saved.flips, self.schedule.flips):
                print("restoring original flip schedule from checkpoint")
                self.schedule = saved
                self.model = MoELanguageModel(self.cfg, flip_schedule=saved)
                self.train_step = make_train_step(
                    self.model, self.optimizer,
                    n_microbatch=self.a.n_microbatch)
                self.eval_step = make_eval_step(self.model)
                self.saver["flip_schedule"] = schedule_to_dict(saved)
        print(f"restored checkpoint at step {restored}")
        return restored

    # -- loops --

    def fetch_batch(self) -> jax.Array:
        idx = next(self.sampler)
        batch = self.dataset.batch(idx)
        from ..parallel import put_batch
        return put_batch(batch, self.mesh)

    def validate(self) -> float:
        total_nll, total_tok = 0.0, 0
        sampler = SequentialMultibatchSampler(
            n_items=len(self.valid_dataset), batch_size=self.a.batch_size)
        with self.mesh, self._ep_scope():
            for _ in range(self.a.valid_batches):
                batch = jnp.asarray(self.valid_dataset.batch(next(sampler)))
                from ..parallel import put_batch
                batch = put_batch(batch, self.mesh)
                nll, n = self.eval_step(self.state.params, batch)
                total_nll += float(nll)
                total_tok += int(n)
            self._log_expert_usage(batch)
        return math.exp(total_nll / max(total_tok, 1))

    def _log_expert_usage(self, batch) -> None:
        """Eval-time routing telemetry: per-layer expert histograms and
        selection entropy (the reference's add_dist_experts /
        add_dist_weight channels, layers/moe/moe.py:160-183)."""
        try:
            if not hasattr(self, "_telemetry_fn"):
                self._telemetry_fn = jax.jit(
                    lambda p, t: self.model.apply(
                        {"params": p}, t, train=False,
                        return_id_experts=True)[1])
            aux = self._telemetry_fn(self.state.params, batch[:, :-1])
        except Exception as e:
            # warn once instead of silently dropping telemetry forever
            if not getattr(self, "_telemetry_warned", False):
                self._telemetry_warned = True
                print(f"expert-usage telemetry failed "
                      f"({type(e).__name__}: {e}); disabled for this run",
                      flush=True)
            return
        metrics = {}
        usage_rows = {}
        for key, val in aux.items():
            if key.endswith("/selected_experts") and val is not None:
                layer = key.split("/")[0]
                sel = np.asarray(val).reshape(-1)
                hist = np.bincount(sel, minlength=self.cfg.n_experts)
                frac = hist / max(hist.sum(), 1)
                usage_rows[layer] = frac
                metrics[f"expert_usage/{layer}_nonzero_frac"] = float(
                    (hist > 0).mean())
                p = np.clip(frac, 1e-12, None)
                metrics[f"expert_usage/{layer}_entropy"] = float(
                    -(p * np.log(p)).sum())
        if metrics:
            self.logger.log(int(self.state.step), metrics,
                            to_stdout=False)
        if usage_rows:
            # per-layer expert-usage heatmap (the reference's
            # add_dist_experts histogram plots, visualize/plot.py Heatmap)
            from .plots import Heatmap, log_plots
            order = sorted(usage_rows,
                           key=lambda k: int(k.replace("layer", "") or 0))
            mat = np.stack([usage_rows[k] for k in order])
            log_plots(self.logger, int(self.state.step), {
                "expert_usage/heatmap": Heatmap(
                    map=mat, xlabel="expert", ylabel="layer",
                    y_marks=order)})

    def train(self) -> None:
        a = self.a
        import copy
        import queue
        import threading

        iter_meter = ElapsedTimeMeter()   # async dispatch cost only
        load_meter = ElapsedTimeMeter()   # queue wait (0 when prefetched)
        prof_start = a.profile.start_step
        prof_end = prof_start + a.profile.n_steps if prof_start >= 0 else -1
        from ..parallel import put_batch

        # Background prefetch (the reference's StoppingParallelProducer,
        # simple_task.py:175-180): window generation + device upload
        # overlap the device step. The producer walks its OWN sampler
        # copy; the checkpointed sampler is re-pinned to the consumed
        # step before every saver tick, so a resume replays nothing and
        # skips nothing regardless of queue depth.
        q: queue.Queue = queue.Queue(maxsize=2)
        stop_evt = threading.Event()
        prod_sampler = copy.copy(self.sampler)

        def produce():
            try:
                while not stop_evt.is_set():
                    idx = next(prod_sampler)
                    b = put_batch(self.dataset.batch(idx), self.mesh)
                    while not stop_evt.is_set():
                        try:
                            q.put(b, timeout=0.5)
                            break
                        except queue.Full:
                            continue
            except Exception as e:  # noqa: BLE001 — surfaced at q.get
                q.put(e)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()

        def check_finite(step_metrics):
            step_i, m = step_metrics
            loss = float(m["loss/total"])
            if not math.isfinite(loss):
                raise FloatingPointError(
                    f"non-finite loss at step {step_i}: "
                    f"{ {k: float(v) for k, v in m.items()} }")
            return loss

        prev = None          # (step, device-metrics) — one-step NaN lag
        wall_t0 = time.perf_counter()
        wall_steps = 0
        try:
            with self.mesh, self._ep_scope():
                for step in range(self.start_step, a.stop_after):
                    if step == prof_start:
                        jax.profiler.start_trace(str(self.run_dir / "trace"))
                    if step == prof_end:
                        jax.profiler.stop_trace()
                        print(f"profiler trace written to "
                              f"{self.run_dir / 'trace'}")
                    with load_meter:
                        batch = q.get()
                        if isinstance(batch, Exception):
                            raise batch
                    with iter_meter:
                        self.state, metrics = self.train_step(self.state,
                                                              batch)
                    # Deferred NaN guard: fetching the PREVIOUS step's
                    # loss blocks only until step-1 finishes while this
                    # step is already queued on the device — the loop
                    # pipelines instead of hard-syncing every step (the
                    # reference checks in-step, simple_task.py:314-324;
                    # the abort here lags one step).
                    if prev is not None:
                        check_finite(prev)
                    prev = (step, metrics)
                    wall_steps += 1
                    if step % a.log_interval == 0 or step == a.stop_after - 1:
                        from .logger import device_memory_stats
                        logm = {k: float(v) for k, v in metrics.items()}
                        prev = None
                        if not math.isfinite(logm.get("loss/total", 0.0)):
                            raise FloatingPointError(
                                f"non-finite loss at step {step}: {logm}")
                        tokens = a.batch_size * a.lm.unroll
                        # honest per-step wall time (device-synced by the
                        # float conversions above): the r4 ms_per_iter
                        # channel timed only async dispatch and
                        # overstated throughput ~4.5x (214k vs a measured
                        # 47k tok/s at batch 8 — tools/profile_train_step)
                        wall_ms = 1e3 * (time.perf_counter() - wall_t0) \
                            / max(wall_steps, 1)
                        logm.update({
                            "timing/ms_per_step_wall": wall_ms,
                            "timing/ms_per_iter": iter_meter.mean_ms,
                            "timing/ms_per_load": load_meter.mean_ms,
                            "timing/ms_per_token": wall_ms / tokens,
                            "step_tokens_per_second":
                                tokens / (wall_ms / 1000.0),
                        })
                        logm.update(device_memory_stats())
                        self.logger.log(step, logm)
                        iter_meter.reset()
                        load_meter.reset()
                        wall_t0 = time.perf_counter()
                        wall_steps = 0
                    if (a.valid_interval and step
                            and step % a.valid_interval == 0):
                        ppl = self.validate()
                        self.logger.log(step, {"valid/perplexity": ppl},
                                        to_stdout=True)
                        wall_t0 = time.perf_counter()
                        wall_steps = 0
                    # re-pin the checkpointed sampler to the CONSUMED
                    # position (the producer's copy runs ahead by the
                    # queue depth)
                    self.sampler.pos = step + 1
                    self.saver["state"] = self.state
                    self.saver.tick(step + 1)
                if prev is not None:
                    check_finite(prev)
                self.saver["state"] = self.state
                self.saver.save(a.stop_after)
        finally:
            stop_evt.set()

    def test(self) -> Dict[str, float]:
        res = {"valid/perplexity": self.validate()}
        res.update(self.run_downstream_evals())
        return res

    # -- zero-shot QA battery (reference lm_eval_mixin.py:40-174) --

    def _qa_encode(self):
        """Tokenizer for QA prompts: the streaming corpus vocab when the
        task has one, else a stable hash fallback (synthetic runs)."""
        tok = getattr(self.dataset, "tokenizer", None)
        if tok is not None:
            return lambda s: tok.encode(s).ids
        import zlib
        v = self.a.lm.vocab_size

        def hash_encode(s: str):
            return [(zlib.crc32(w.encode()) % (v - 1)) + 1
                    for w in s.split()]
        return hash_encode

    def run_downstream_evals(self) -> Dict[str, float]:
        a = self.a
        if not a.lm.eval.enabled:
            return {}
        from ..data import qa_datasets as qa
        from ..eval.lm_zeroshot import LMZeroShotEvaluator, lambada_accuracy

        encode = self._qa_encode()
        ev = LMZeroShotEvaluator(self.model, {"params": self.state.params},
                                 pad_quantum=a.lm.eval.pad_quantum,
                                 max_len=a.lm.unroll)
        res: Dict[str, float] = {}
        with self.mesh, self._ep_scope():
            if a.lm.eval.lambada.enabled:
                items = qa.lambada_items(
                    qa.ensure_file(a.lm.eval.lambada.path, "lambada",
                                   a.lm.cache_dir), encode)
                for k, v in lambada_accuracy(ev, items).items():
                    res[f"lambada/{k}"] = v
            simple = {
                "hellaswag": lambda: qa.hellaswag_docs(
                    qa.ensure_file(a.lm.eval.hellaswag.path, "hellaswag",
                                   a.lm.cache_dir), encode),
                "piqa": lambda: qa.piqa_docs(
                    qa.ensure_file(a.lm.eval.piqa.path, "piqa",
                                   a.lm.cache_dir),
                    qa.ensure_file(a.lm.eval.piqa.labels_path,
                                   "piqa_labels", a.lm.cache_dir), encode),
                "ai2arc": lambda: qa.arc_docs(a.lm.eval.ai2arc.path, encode),
                "openbookqa": lambda: qa.openbookqa_docs(
                    a.lm.eval.openbookqa.path, encode),
                "commonsenseqa": lambda: qa.commonsenseqa_docs(
                    a.lm.eval.commonsenseqa.path, encode),
                "winogrande": lambda: qa.winogrande_docs(
                    a.lm.eval.winogrande.path, encode),
                "siqa": lambda: qa.siqa_docs(
                    a.lm.eval.siqa.path, a.lm.eval.siqa.labels_path,
                    encode),
                "race": lambda: qa.race_docs(a.lm.eval.race.path, encode),
                "cbt": lambda: qa.cbt_docs(a.lm.eval.cbt.path, encode),
                "blimp": lambda: qa.blimp_docs(a.lm.eval.blimp.path,
                                               encode),
            }
            for name, load in simple.items():
                if not getattr(a.lm.eval, name).enabled:
                    continue
                for k, v in ev.evaluate(load()).items():
                    res[f"{name}/{k}"] = v
        return res


class _StreamingTransformerTask(SyntheticTransformerTask):
    """LM pretraining over a streaming shard corpus (the reference's
    {c4,slimpajama,pes2o}_transformer tasks): shards are fetched/cached,
    a SentencePiece-style Unigram vocab is trained on the first shards,
    and tokens are written to uint16 mmap chunks
    (framework/dataset/text/chunked_setencepiece_lm_dataset.py)."""

    SPEC_NAME = None  # streaming spec class name, set by subclasses

    def _make_spec(self):
        from ..data import streaming
        a = self.a
        if a.lm.shards:
            import glob as _glob
            shards: list = []
            for part in a.lm.shards.split(","):
                hits = sorted(_glob.glob(part))
                shards.extend(hits if hits else [part])
            return streaming.LocalShardSpec(shards=shards)
        return getattr(streaming, self.SPEC_NAME)(**self._spec_kwargs())

    def _spec_kwargs(self):
        return {}

    def create_datasets(self):
        from ..data.streaming import ChunkedLMCorpus, LocalShardSpec
        a = self.a
        spec = self._make_spec()
        cache = Path(a.lm.cache_dir) / type(self).__name__
        train = ChunkedLMCorpus(
            spec, a.lm.unroll, cache, split="train",
            vocab_size=a.lm.vocab_size, n_shards=a.lm.n_shards,
            token_limit=a.lm.token_limit, algo=a.lm.tokenizer_algo,
            tokenizer_n_files=a.lm.tokenizer_n_files)
        if isinstance(spec, LocalShardSpec):
            valid = train  # offline fixtures rarely ship a valid split
        else:
            valid = ChunkedLMCorpus(
                spec, a.lm.unroll, cache, split="validation",
                vocab_size=a.lm.vocab_size, n_shards=a.lm.valid_n_shards,
                token_limit=a.lm.token_limit, algo=a.lm.tokenizer_algo,
                tokenizer_n_files=a.lm.tokenizer_n_files)
        return train, valid


@task("c4_transformer")
class C4TransformerTask(_StreamingTransformerTask):
    SPEC_NAME = "C4Spec"


@task("slimpajama_transformer")
class SlimPajamaTransformerTask(_StreamingTransformerTask):
    SPEC_NAME = "SlimPajamaSpec"


@task("pes2o_transformer")
class PES2OTransformerTask(_StreamingTransformerTask):
    SPEC_NAME = "PES2OSpec"


@task("thestack_transformer")
class TheStackTransformerTask(_StreamingTransformerTask):
    SPEC_NAME = "TheStackSpec"

    def _spec_kwargs(self):
        return {"languages": self.a.lm.thestack_languages}


@task("mixture_transformer")
class MixtureTransformerTask(SyntheticTransformerTask):
    """LM pretraining on the latent-mode Markov mixture corpus
    (data/lm_data.py:SyntheticMixtureLMDataset) — the offline arena for
    the CompeteSMoE-vs-SMoE algorithm A/B (docs/science.md). Routing
    quality is causally tied to loss here: each window's successor rule
    depends on a hidden mode, so expert specialization per mode is the
    loss-minimizing policy. Replaces the reference's SlimPajama arena
    (sweeps/slimpajama_moe_no_attmoe_154M_competesmoe.yaml) which needs
    network egress this environment does not have."""

    def create_datasets(self):
        from ..data.lm_data import SyntheticMixtureLMDataset
        a = self.a
        kw = dict(n_modes=a.lm.mixture.n_modes,
                  coherence=a.lm.mixture.coherence,
                  zipf_alpha=a.lm.mixture.zipf_alpha)
        train = SyntheticMixtureLMDataset(
            a.lm.vocab_size, a.lm.unroll, n_windows=1 << 20,
            seed=a.seed, **kw)
        # valid split: same modes/permutations (seed governs window
        # draws only through the per-index rng; the perms must match so
        # valid measures the same language) — disjoint window indices
        # via a distinct seed offset.
        valid = SyntheticMixtureLMDataset(
            a.lm.vocab_size, a.lm.unroll, n_windows=1 << 10,
            seed=a.seed + 7919, **kw)
        valid.perms = train.perms  # same language, held-out windows
        return train, valid


@task("chunked_transformer")
class ChunkedTransformerTask(SyntheticTransformerTask):
    """LM pretraining over pre-tokenized uint16 mmap chunk dirs
    (-lm.data_dir), the offline equivalent of the reference's streaming
    dataset tasks once `tokenize_to_chunks` has run."""

    def create_datasets(self):
        a = self.a
        if not a.lm.data_dir:
            raise ValueError("chunked_transformer requires -lm.data_dir")
        d = Path(a.lm.data_dir)
        train = open_chunk_dir(d / "train", a.lm.unroll)
        valid_dir = d / "valid"
        valid = (open_chunk_dir(valid_dir, a.lm.unroll)
                 if valid_dir.exists() else train)
        return train, valid
