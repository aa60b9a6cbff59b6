#!/usr/bin/env python
"""CompeteSMoE-vs-SMoE algorithm A/B at the reference's 154M LM geometry.

The reference exists to claim competition-trained routers beat vanilla
softmax routing (paper arXiv:2505.13380; the algorithm at
/root/reference/moe_pretrain_model/layers/moe/competesmoe.py:381-616).
Routing parity with torch was proven in rounds 1-4; this tool measures
whether the ALGORITHM does its job in this implementation: two arms, one
flag apart (-moe_name competesmoe vs smoe), byte-identical data at every
step (same corpus seed, deterministic windows), identical token budget.

Arena: the latent-mode Markov mixture corpus (data/lm_data.py:
SyntheticMixtureLMDataset) — mode identity is recoverable only from
transition context, so expert specialization per mode is the
loss-minimizing policy and routing quality is causally tied to
perplexity. The reference's SlimPajama arena needs network egress this
environment does not have (sweeps yaml maps 1:1 otherwise).

Phases (resumable; each skips if its output exists):
  train     — run both arms via the real CLI (cli/main.py), sequentially
              (the axon tunnel is single-client).
  analyze   — parse both runs' log_trainer.jsonl curves; load final
              checkpoints; compute matched-window validation perplexity,
              per-mode perplexity, router-vs-affinity agreement at the
              end state, and per-layer mode<->expert mutual information
              (the specialization the competition is supposed to induce).
  report    — write results/r5/algo_ab.json + a markdown summary block.

Usage:
  python tools/run_algo_ab.py --steps 5000 --out results/r5
  python tools/run_algo_ab.py --analyze-only   # after training finished
"""
from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# The reference's 154M comparison config
# (sweeps/slimpajama_moe_no_attmoe_154M_competesmoe.yaml), minus the
# W&B/GPU plumbing; competesmoe schedule flags from the same yaml.
GEOMETRY = {
    "-state_size": 512,
    "-transformer.encoder_n_layers": 16,
    "-transformer.n_heads": 4,
    "-transformer.head_projection_size": 82,
    "-moe.n_experts": 64,
    "-moe.expert_size": 128,
    "-pkm.n_heads": 8,
    "-lm.unroll": 1024,
    "-lm.vocab_size": 8000,
    "-batch_size": 64,
    # one v5e chip can't hold the 64x1024 activation set in one shot
    # (57.8 GB program; the reference splits it over 4 GPUs) — 8
    # microbatches of 8x1024 accumulate to the same update
    "-n_microbatch": 8,
    "-lr": 2.5e-4,
    "-lr_sched.type": "cos",
    "-grad_clip": 0.1,
    "-wd": 0.01,
    "-amp": 1,
    "-dropout": 0.0,
}
COMPETE_FLAGS = {
    "-rate_flip": 0.07,
    "-warm_up": 0.0,
    "-max_compete_in_iter": 3,
    "-router_loss_coef": 0.001,
    "-hybrid": 1,
    "-tribrid": 0,
    "-in_topk": 0,
    "-router_theta": 0.2,
    "-balance_loss_coef": 0.01,
    "-balance_loss_coef_comp": 0.01,
    "-balance_affinity": 1,
}


def arm_dir(out_root: Path, arm: str, seed: int) -> Path:
    return out_root / f"ab_{arm}_s{seed}"


def train_arm(arm: str, steps: int, seed: int, out_root: Path,
              valid_interval: int, save_interval: int = 500) -> None:
    run = arm_dir(out_root, arm, seed)
    done = run / "checkpoint" / f"model-{steps}"
    if done.exists():
        print(f"SKIP train {arm} s{seed}: {done} exists")
        return
    cmd = [sys.executable, "-m", "competesmoe_tpu.cli.main",
           "-task", "mixture_transformer",
           "-name", run.name, "-run_dir", str(out_root),
           "-seed", str(seed), "-moe_name", arm,
           "-stop_after", str(steps),
           "-valid_interval", str(valid_interval), "-valid_batches", "4",
           # fine-grained checkpoints: background windows can be short,
           # so a reaped run resumes losing <= save_interval steps
           "-save_interval", str(save_interval), "-keep_last", "2",
           "-log_interval", "10", "-lm.eval.enabled", "0"]
    for flags in (GEOMETRY, COMPETE_FLAGS):
        for k, v in flags.items():
            cmd += [k, str(v)]
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    env["COMPETESMOE_COMPILATION_CACHE"] = env["JAX_COMPILATION_CACHE_DIR"]
    print(f"TRAIN {arm} seed {seed}: {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, env=env)


def load_curves(run: Path) -> dict:
    """Pull the channels the study needs out of log_trainer.jsonl.

    The logger appends across preemption resumes, so a replayed window
    logs the same step twice — keep the LAST record per step (the one
    whose optimizer state actually flowed into the final model).
    """
    ce, ppl, agree = {}, {}, {}
    tok_s, wall_ms = [], []
    with open(run / "log_trainer.jsonl") as f:
        for line in f:
            m = json.loads(line)
            s = m["step"]
            if "loss/ce" in m:
                ce[s] = m["loss/ce"]
            if "valid/perplexity" in m:
                ppl[s] = m["valid/perplexity"]
            if m.get("competesmoe/router_agreement", -1) >= 0:
                agree[s] = m["competesmoe/router_agreement"]
            if "step_tokens_per_second" in m:
                tok_s.append(m["step_tokens_per_second"])
            if "timing/ms_per_step_wall" in m:
                wall_ms.append(m["timing/ms_per_step_wall"])
    return {"step": sorted(ce), "loss_ce": [ce[s] for s in sorted(ce)],
            "valid_step": sorted(ppl),
            "valid_ppl": [ppl[s] for s in sorted(ppl)],
            "agree_step": sorted(agree),
            "agreement": [agree[s] for s in sorted(agree)],
            "tok_s": tok_s, "wall_ms": wall_ms}


def matched_wallclock_ppl(compete: dict, smoe: dict, steps: int) -> dict:
    """The caveat check: competesmoe pays a flip-step premium per step,
    so at matched WALL-CLOCK (not matched tokens) smoe trains further.
    Evaluate the inverse framing that needs no extra training: the
    competesmoe valid-ppl curve interpolated at the step count it would
    have reached in the wall time smoe spent on all `steps` steps,
    vs smoe's final ppl."""
    import statistics
    w_c = statistics.median(compete["curves"]["wall_ms"])
    w_s = statistics.median(smoe["curves"]["wall_ms"])
    eq_steps = min(float(steps), steps * w_s / w_c)
    vs, vp = compete["curves"]["valid_step"], compete["curves"]["valid_ppl"]
    ppl_c = None
    for i in range(1, len(vs)):
        if vs[i] >= eq_steps:
            t = (eq_steps - vs[i - 1]) / max(vs[i] - vs[i - 1], 1e-9)
            ppl_c = vp[i - 1] + t * (vp[i] - vp[i - 1])
            break
    if ppl_c is None and vp:
        ppl_c = vp[-1]
    return {
        "median_wall_ms_competesmoe": round(w_c, 1),
        "median_wall_ms_smoe": round(w_s, 1),
        "flip_wall_premium_pct": round(100.0 * (w_c / w_s - 1.0), 2),
        "competesmoe_equivalent_steps": round(eq_steps, 1),
        "competesmoe_ppl_at_smoe_wallclock": ppl_c,
        "smoe_ppl_final": smoe["curves"]["valid_ppl"][-1]
        if smoe["curves"]["valid_ppl"] else None,
    }


def _build_task(arm: str, steps: int, seed: int, out_root: Path):
    """Reconstruct the task in test mode and restore its final state."""
    from competesmoe_tpu.train.lm_task import get_task
    from competesmoe_tpu.utils.argparser import build_parser
    run = arm_dir(out_root, arm, seed)
    argv = ["-task", "mixture_transformer", "-name", run.name,
            "-run_dir", str(out_root), "-seed", str(seed),
            "-moe_name", arm, "-stop_after", str(steps),
            "-test_only", "1", "-lm.eval.enabled", "0"]
    for flags in (GEOMETRY, COMPETE_FLAGS):
        for k, v in flags.items():
            argv += [k, str(v)]
    a = build_parser().parse(argv)
    return get_task(a.task)(a)


def analyze_arm(arm: str, steps: int, seed: int, out_root: Path,
                n_valid_batches: int) -> dict:
    """Final-state metrics on a matched window set: overall + per-mode
    perplexity, per-layer expert usage, and mode<->expert mutual
    information from routing decisions."""
    import jax
    platform = os.environ.get("COMPETESMOE_PLATFORM")
    if platform:  # sitecustomize pins axon; env alone is ignored
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    import numpy as np

    t = _build_task(arm, steps, seed, out_root)
    a = t.a
    valid = t.valid_dataset
    n_modes = a.lm.mixture.n_modes
    n_exp = t.cfg.n_experts

    # telemetry fn: logits + per-layer selected experts in one pass
    @jax.jit
    def probe(params, tokens):
        inputs, targets = tokens[:, :-1], tokens[:, 1:]
        logits, aux = t.model.apply({"params": params}, inputs,
                                    train=False, return_id_experts=True)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None],
                                   axis=-1)[..., 0]  # [B, T]
        sels = {k: v for k, v in aux.items()
                if k.endswith("/selected_experts") and v is not None}
        return nll, sels

    bsz = a.batch_size
    per_mode_nll = np.zeros(n_modes)
    per_mode_tok = np.zeros(n_modes)
    joint = None  # [L, n_modes, n_experts] selection counts
    layer_names = None
    idx = 0
    for _ in range(n_valid_batches):
        ids = np.arange(idx, idx + bsz) % len(valid)
        idx += bsz
        batch = valid.batch(ids)
        modes = np.array([valid.mode_of(int(i)) for i in ids])
        nll, sels = probe(t.state.params, jnp.asarray(batch))
        nll = np.asarray(nll)
        if joint is None:
            layer_names = sorted(
                sels, key=lambda k: int(k.split("/")[0].replace("layer", "")
                                        or 0))
            joint = np.zeros((len(layer_names), n_modes, n_exp))
        for m in range(n_modes):
            rows = modes == m
            per_mode_nll[m] += nll[rows].sum()
            per_mode_tok[m] += nll[rows].size
            if rows.any():
                for li, name in enumerate(layer_names):
                    sel = np.asarray(sels[name])[rows].reshape(-1)
                    joint[li, m] += np.bincount(sel, minlength=n_exp)

    ppl_overall = math.exp(per_mode_nll.sum() / per_mode_tok.sum())
    per_mode_ppl = [
        math.exp(per_mode_nll[m] / per_mode_tok[m])
        if per_mode_tok[m] else float("nan") for m in range(n_modes)]

    # mode<->expert mutual information per layer (bits): how much a
    # routing decision tells you about the latent mode. 0 = experts
    # ignore the mode; upper bound = min(H(mode), H(expert)).
    mi_bits, h_expert_bits = [], []
    for li in range(joint.shape[0]):
        j = joint[li] / max(joint[li].sum(), 1.0)
        pm = j.sum(1, keepdims=True)
        pe = j.sum(0, keepdims=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            terms = j * np.log2(j / (pm @ pe))
        mi_bits.append(float(np.nansum(terms)))
        pe1 = pe[pe > 0]
        h_expert_bits.append(float(-(pe1 * np.log2(pe1)).sum()))

    return {
        "arm": arm, "seed": seed,
        "valid_ppl_matched": ppl_overall,
        "per_mode_ppl": per_mode_ppl,
        "per_mode_ppl_worst": float(np.nanmax(per_mode_ppl)),
        "per_mode_ppl_best": float(np.nanmin(per_mode_ppl)),
        "mode_expert_mi_bits_per_layer": mi_bits,
        "mode_expert_mi_bits_mean": float(np.mean(mi_bits)),
        "expert_entropy_bits_per_layer": h_expert_bits,
        "n_valid_tokens": int(per_mode_tok.sum()),
        "curves": load_curves(arm_dir(out_root, arm, seed)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="competesmoe,smoe")
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--valid-interval", type=int, default=250)
    ap.add_argument("--save-interval", type=int, default=500)
    ap.add_argument("--analyze-batches", type=int, default=8)
    ap.add_argument("--out", default="results/r5")
    ap.add_argument("--analyze-only", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke geometry (pipeline check, no science)")
    args = ap.parse_args()

    if args.tiny:
        os.environ.setdefault("COMPETESMOE_PLATFORM", "cpu")
        GEOMETRY.update({
            "-state_size": 64, "-transformer.encoder_n_layers": 2,
            "-transformer.n_heads": 2,
            "-transformer.head_projection_size": 32,
            "-moe.n_experts": 8, "-moe.expert_size": 32,
            "-pkm.n_heads": 2, "-lm.unroll": 64,
            "-lm.vocab_size": 512, "-batch_size": 8})
        COMPETE_FLAGS["-rate_flip"] = 0.5

    out_root = (REPO / args.out).resolve()
    out_root.mkdir(parents=True, exist_ok=True)
    arms = args.arms.split(",")

    if not args.analyze_only:
        for arm in arms:
            train_arm(arm, args.steps, args.seed, out_root,
                      args.valid_interval, args.save_interval)

    sys.path.insert(0, str(REPO))
    results = {"steps": args.steps, "seed": args.seed,
               "tokens_per_arm": args.steps * GEOMETRY["-batch_size"]
               * GEOMETRY["-lm.unroll"],
               "geometry": GEOMETRY, "compete_flags": COMPETE_FLAGS,
               "arms": {}}
    for arm in arms:
        print(f"ANALYZE {arm}", flush=True)
        results["arms"][arm] = analyze_arm(
            arm, args.steps, args.seed, out_root, args.analyze_batches)

    if len(arms) == 2:
        a0, a1 = (results["arms"][x] for x in arms)
        results["delta"] = {
            "valid_ppl": a0["valid_ppl_matched"] - a1["valid_ppl_matched"],
            "valid_ppl_rel_pct": 100.0 * (
                a0["valid_ppl_matched"] / a1["valid_ppl_matched"] - 1.0),
            "mi_bits_mean": a0["mode_expert_mi_bits_mean"]
            - a1["mode_expert_mi_bits_mean"],
        }
        if a0["curves"]["wall_ms"] and a1["curves"]["wall_ms"]:
            results["matched_wallclock"] = matched_wallclock_ppl(
                a0, a1, args.steps)

    out_file = out_root / f"algo_ab_s{args.seed}.json"
    with open(out_file, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_file}")
    for arm in arms:
        r = results["arms"][arm]
        ag = r["curves"]["agreement"]
        print(f"{arm:12s} ppl={r['valid_ppl_matched']:.3f} "
              f"worst-mode={r['per_mode_ppl_worst']:.3f} "
              f"MI={r['mode_expert_mi_bits_mean']:.3f} bits "
              + (f"agreement {ag[0]:.3f}->{ag[-1]:.3f}" if ag else ""))


if __name__ == "__main__":
    main()
