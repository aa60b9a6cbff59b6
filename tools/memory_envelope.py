"""Memory-fit envelope for the flagship 5.1B sft stage on a v5e-8 mesh.

Answers the question the 3-stage recipe user actually has: what per-chip
batch fits in 15.75 GB HBM with fsdp + expert-parallel + remat at bf16?
(The reference trains sft at per-GPU batch 5 x 2-accum on A100-80GB,
scripts/train/phi35mini/siglip/sft.sh.)

Method (per-chip peak = static + transient, each from its reliable
source):

* static (exact arithmetic): bf16 params + Adam mu/nu (optax states
  inherit the param dtype; cli/train_mm.py --bf16 defaults True) + one
  grad-buffer copy, each leaf divided by its `parallel.mesh.param_spec`
  shard factor on the ('data','expert') mesh — no compiler involved.
  Reported for both v5e-8 layouts (4x2 and 8x1).
* transient (compiled): XLA's buffer assignment (`memory_analysis().
  temp_size_in_bytes`) of the mm GRADIENT program compiled single-chip
  at the PER-CHIP batch — under batch-sharded fsdp, activation temps
  live per chip exactly like a single-chip run at the local batch.
  Grad-only rather than the full optimizer step because the v5e AOT
  compiler enforces whole-program HBM residency INCLUDING the
  unsharded single-chip arguments (the full train step's params + Adam
  tree measured a 21.4 GB argument refusal at 4 layers, 2026-08-19);
  optimizer args are priced exactly by the static term anyway.
  Compiled at --layers and --layers/2 and linearly extrapolated to
  --extrapolate-to (decoder depth dominates; the vision tower runs at
  full depth in both compiles, landing in the intercept). A compile
  refusal at some batch is recorded as a row, not a crash.
* fsdp all-gather transient: + 2 x the largest dense leaf (the gathered
  weight and its prefetch double-buffer).

Run on the real TPU backend (AOT — nothing is allocated or executed, so
the single tunneled chip suffices and the temp numbers are v5e buffer
assignments). On CPU (--platform cpu / COMPETESMOE_PLATFORM=cpu) the
temps are inflated ~3-6x by CPU lowering (bf16 dots upcast to f32
buffers, fewer fusions) — calibration in the round-4 notes — so CPU runs
are labeled upper bounds. Results land in docs/sharding.md; battery item
9 (tools/run_tpu_battery.sh) produces the on-chip row.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("COMPETESMOE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["COMPETESMOE_PLATFORM"])

import jax.numpy as jnp
import numpy as np


def build_model(layers: int, vis_layers: int, seq_len: int, remat: bool,
                image_size: int):
    from competesmoe_tpu.models.builder import llava_config_from_hf
    from competesmoe_tpu.models.llava import LlavaModel
    from competesmoe_tpu.train.mm_task import (
        MMTrainConfig,
        build_mm_schedules,
    )

    hf = dict(
        model_type="llava_phi", vocab_size=32064, hidden_size=3072,
        intermediate_size=8192, num_hidden_layers=layers,
        num_attention_heads=32, num_key_value_heads=32, rms_norm_eps=1e-5,
        max_position_embeddings=131072,
        original_max_position_embeddings=4096,
        mm_hidden_size=1152, mm_projector_type="moe", moe_name="smoe",
        num_experts=4, num_selected=2, clip_smoe=True, mlp_smoe=True,
        scales=[1],
        vision_config=dict(hidden_size=1152, intermediate_size=4304,
                           num_hidden_layers=vis_layers,
                           num_attention_heads=16,
                           image_size=image_size, patch_size=14),
        tokenizer_model_max_length=seq_len)
    cfg = llava_config_from_hf(hf, dtype=jnp.bfloat16)
    if remat:
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder, remat=True))
    tcfg = MMTrainConfig(stage="sft", total_steps=100)
    vs, ps = build_mm_schedules(cfg, tcfg)
    return LlavaModel(cfg, vision_flip_schedule=vs,
                      projector_flip_schedule=ps), cfg, tcfg


def param_shapes(model, cfg, dtype=jnp.bfloat16):
    """Abstract param tree with float leaves cast to the TRAINING dtype.

    flax init defaults param_dtype=f32, but cli/train_mm.py loads the
    checkpoint at bf16 (--bf16 defaults True, matching the reference's
    bf16 deepspeed recipe) and optax states inherit the param dtype —
    pricing the f32 init tree would double both the static term and the
    backward temps."""
    tree = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 8), jnp.int32),
                             jnp.zeros((1, cfg.vision.image_size,
                                        cfg.vision.image_size, 3),
                                       jnp.float32)),
        jax.random.PRNGKey(0))["params"]
    return jax.tree_util.tree_map(
        lambda l: (jax.ShapeDtypeStruct(l.shape, dtype)
                   if jnp.issubdtype(l.dtype, jnp.floating) else l),
        tree)


def static_bytes_per_chip(params, data_size: int, expert_size: int,
                          opt_8bit: bool = False):
    """Exact per-chip bytes of params + Adam mu/nu under the
    param_spec fsdp/expert rules (largest dense leaf also returned —
    the all-gather transient term).

    opt_8bit prices mu/nu per train/quant_opt.py's rules exactly:
    leaves with size>=4096 store 1 byte/element + a 4-byte f32 scale
    per 256-element block of the last dim; smaller leaves stay at the
    param dtype."""
    from competesmoe_tpu.parallel.mesh import param_spec

    total = 0
    moment = 0  # one moment tree (mu == nu in bytes)
    largest_dense = 0

    def visit(path, leaf):
        nonlocal total, moment, largest_dense
        names = [getattr(p, "key", getattr(p, "name", str(p)))
                 for p in path]
        spec = param_spec(names, leaf, data_size)
        factor = 1
        for ax in spec:
            if ax == "data":
                factor *= data_size
            elif ax == "expert":
                factor *= expert_size
        nbytes = leaf.size * leaf.dtype.itemsize
        if "data" in tuple(spec):
            largest_dense = max(largest_dense, nbytes)
        total += -(-nbytes // factor)
        if opt_8bit and leaf.size >= 4096 and len(leaf.shape) >= 1:
            d = leaf.shape[-1]
            scales = (leaf.size // max(d, 1)) * (-(-d // 256))
            mbytes = leaf.size + 4 * scales  # int8 codes + f32 scales
        else:
            mbytes = nbytes
        moment += -(-mbytes // factor)

    jax.tree_util.tree_map_with_path(visit, params)
    # params + Adam mu/nu (optax keeps states in the params' own dtype,
    # so by default this prices whatever dtype the caller's tree holds —
    # bf16, matching cli/train_mm.py's --bf16 default; pricing an f32
    # master tree instead would double the estimate). With opt_8bit the
    # moments follow quant_opt's exact layout instead. The grad buffer
    # (one more sharded param-sized copy, live between backward and the
    # update) is returned separately; 2x largest dense leaf is the fsdp
    # all-gather + prefetch transient.
    return total + 2 * moment, total, 2 * largest_dense


def temp_bytes_single_chip(layers, vis_layers, seq_len, per_chip, remat,
                           image_size):
    """XLA temp buffer bytes of the mm GRADIENT computation compiled
    single-chip at the per-chip batch (AOT: no data allocated).

    Grad-only, not the full optimizer step, on purpose: the v5e AOT
    compiler enforces whole-program HBM residency INCLUDING arguments,
    and a single-chip compile holds the full UNSHARDED params + f32 Adam
    state as arguments (21.4 GB at 4 decoder layers — measured refusal,
    2026-08-19). Those arguments are exactly what the static term prices
    with the real shard factors, so the compiler is only consulted for
    what it alone knows: the activation/backward temp buffers, which
    under batch-sharded fsdp live per chip exactly like a single-chip
    run at the local batch. The optimizer update adds elementwise temps
    only (negligible); its states are in the static term.

    Returns (temp_bytes, None) or (None, oom_message) when even the
    grad program's params+batch+grads exceed HBM — itself a
    measurement, recorded in the output row.
    """
    model, cfg, _ = build_model(layers, vis_layers, seq_len, remat,
                                image_size)
    params = param_shapes(model, cfg)
    B = per_chip
    batch = {
        "input_ids": jax.ShapeDtypeStruct((B, seq_len), jnp.int32),
        "labels": jax.ShapeDtypeStruct((B, seq_len), jnp.int32),
        "attention_mask": jax.ShapeDtypeStruct((B, seq_len), jnp.int32),
        "images": jax.ShapeDtypeStruct(
            (B, cfg.vision.image_size, cfg.vision.image_size, 3),
            jnp.float32),
    }

    def loss_fn(p, batch, step):
        out = model.apply({"params": p}, batch["input_ids"],
                          batch.get("images"), labels=batch["labels"],
                          attention_mask=batch["attention_mask"],
                          step=step, train=True)
        return out.loss

    grad = jax.jit(jax.grad(loss_fn))
    try:
        compiled = grad.lower(params, batch,
                              jax.ShapeDtypeStruct((), jnp.int32)
                              ).compile()
    except Exception as e:  # noqa: BLE001 — AOT HBM refusal is data
        msg = str(e)
        if "Ran out of memory" in msg or "RESOURCE_EXHAUSTED" in msg:
            head = msg.split("\n")[0][:300]
            return None, head
        raise
    return int(compiled.memory_analysis().temp_size_in_bytes), None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8,
                    help="decoder depth actually compiled (plus half of "
                         "it, for the linear extrapolation)")
    ap.add_argument("--vis-layers", type=int, default=27)
    ap.add_argument("--extrapolate-to", type=int, default=32)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--batches", default="1,5")
    ap.add_argument("--data-size", type=int, default=4,
                    help="'data' mesh axis size (v5e-8 default 4x2)")
    ap.add_argument("--expert-size", type=int, default=2)
    ap.add_argument("--mem-gb", type=float, default=15.75,
                    help="per-chip HBM (v5e)")
    ap.add_argument("--no-remat-ab", action="store_true",
                    help="skip the remat-off comparison point")
    ap.add_argument("--opt-8bit", action="store_true",
                    help="price Adam mu/nu at train/quant_opt.py's "
                         "blockwise-int8 layout (--opt-state-8bit in "
                         "cli/train_mm.py)")
    a = ap.parse_args(argv)

    platform = jax.devices()[0].platform
    # static term: exact, from the full-depth geometry, at the
    # TRAINING dtype (bf16), for both candidate v5e-8 mesh layouts
    model, cfg, _ = build_model(a.extrapolate_to, a.vis_layers, a.seq_len,
                                True, a.image_size)
    params = param_shapes(model, cfg)
    static_b, param_b, ag_b = static_bytes_per_chip(
        params, a.data_size, a.expert_size, opt_8bit=a.opt_8bit)
    static8, param8, ag8 = static_bytes_per_chip(
        params, 8, 1, opt_8bit=a.opt_8bit)
    n_params = sum(l.size for l in jax.tree_util.tree_leaves(params))
    print(json.dumps({
        "params_b": round(n_params / 1e9, 3),
        "static_gb_per_chip": round(static_b / 1e9, 2),
        "grad_buffer_gb": round(param_b / 1e9, 2),
        "allgather_transient_gb": round(ag_b / 1e9, 2),
        "mesh": f"data={a.data_size} expert={a.expert_size}",
        "opt_state_8bit": a.opt_8bit,
        "alt_mesh_d8e1": {"static_gb_per_chip": round(static8 / 1e9, 2),
                          "grad_buffer_gb": round(param8 / 1e9, 2),
                          "allgather_transient_gb": round(ag8 / 1e9, 2)},
    }), flush=True)

    rows = []
    for per_chip in [int(b) for b in a.batches.split(",")]:
        for remat in ([True] if a.no_remat_ab else [True, False]):
            lo, oom_lo = temp_bytes_single_chip(
                a.layers // 2, a.vis_layers, a.seq_len, per_chip, remat,
                a.image_size)
            hi, oom_hi = (temp_bytes_single_chip(
                a.layers, a.vis_layers, a.seq_len, per_chip, remat,
                a.image_size) if oom_lo is None else (None, "skipped: "
                                                      "half-depth OOM"))
            row = {"per_chip_batch": per_chip, "remat": remat,
                   "layers": a.extrapolate_to,
                   "static_gb": round(static_b / 1e9, 2)}
            if lo is None or hi is None:
                # the AOT compiler refused even the grad probe: the
                # unsharded-args artifact at this batch — record it
                row.update({"fits_v5e": False,
                            "compile_oom": oom_lo or oom_hi})
            else:
                slope = (hi - lo) / (a.layers - a.layers // 2)
                temp = hi + slope * (a.extrapolate_to - a.layers)
                # a NEGATIVE slope (seen on-chip 2026-08-19 at batch 5:
                # 6.33 GB @4L -> 5.16 GB @8L) means the probe peak is
                # dominated by a depth-independent phase (vision tower +
                # splice at large batch), so a linear extrapolation goes
                # non-physical (-1.85 GB and a false "fits"). Clamp to
                # the worst measured temp — depth can't shrink the
                # depth-independent peak — and flag the row.
                clamped = temp < max(lo, hi)
                if clamped:
                    temp = max(lo, hi)
                peak = (static_b + param_b + ag_b + temp) / 1e9
                row.update({
                    "pred_temp_gb": round(temp / 1e9, 2),
                    "pred_peak_gb": round(peak, 2),
                    "fits_v5e": peak < a.mem_gb,
                    "compiled_at_layers": [a.layers // 2, a.layers],
                    "temp_gb_at_compiled": [round(lo / 1e9, 2),
                                            round(hi / 1e9, 2)],
                    **({"slope_clamped": True} if clamped else {}),
                })
            rows.append(row)
            print(json.dumps({"progress": rows[-1]}), flush=True)

    print(json.dumps({
        "metric": "mm_sft_5p1b_memory_envelope",
        "value": max((r["per_chip_batch"] for r in rows
                      if r["remat"] and r["fits_v5e"]), default=0),
        "unit": "max_per_chip_batch_fitting",
        "detail": {
            "rows": rows, "seq_len": a.seq_len,
            "opt_state_8bit": a.opt_8bit,
            "mesh": f"data={a.data_size} expert={a.expert_size}",
            "mem_gb": a.mem_gb, "platform": platform,
            "method": "static = exact sharded bf16 params+Adam "
                      "arithmetic (+1 grad copy, +2x largest-leaf AG "
                      "buffer); transient = single-chip AOT buffer "
                      "assignment of the GRAD program at the per-chip "
                      "batch, linear layer extrapolation"
                      + (" [CPU-compiled: temps are ~3-6x UPPER BOUNDS "
                         "(f32 upcasts, fewer fusions); re-run on the "
                         "chip]" if platform == "cpu" else ""),
        }}))


if __name__ == "__main__":
    main()
