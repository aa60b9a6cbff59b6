"""Memory-fit envelope for the flagship 5.1B sft stage on a v5e-8 mesh.

Answers the question the 3-stage recipe user actually has: what per-chip
batch fits in 15.75 GB HBM with fsdp + expert-parallel + remat at bf16?
(The reference trains sft at per-GPU batch 5 x 2-accum on A100-80GB,
scripts/train/phi35mini/siglip/sft.sh.)

Method (per-chip peak = static + transient, each from its reliable
source):

* static (exact arithmetic): params + Adam mu/nu, each leaf divided by
  its `parallel.mesh.param_spec` shard factor on the ('data','expert')
  mesh — no compiler involved.
* transient (compiled): XLA's buffer assignment (`memory_analysis().
  temp_size_in_bytes`) of the REAL mm train step compiled single-chip at
  the PER-CHIP batch — under batch-sharded fsdp, activation temps live
  per chip exactly like a single-chip run at the local batch. Compiled
  at --layers and --layers/2 and linearly extrapolated to
  --extrapolate-to (decoder depth dominates; the vision tower runs at
  full depth in both compiles, landing in the intercept).
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


def param_shapes(model, cfg):
    return jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 8), jnp.int32),
                             jnp.zeros((1, cfg.vision.image_size,
                                        cfg.vision.image_size, 3),
                                       jnp.float32)),
        jax.random.PRNGKey(0))["params"]


def static_bytes_per_chip(params, data_size: int, expert_size: int):
    """Exact per-chip bytes of params + Adam mu/nu under the
    param_spec fsdp/expert rules (largest dense leaf also returned —
    the all-gather transient term)."""
    from competesmoe_tpu.parallel.mesh import param_spec

    total = 0
    largest_dense = 0

    def visit(path, leaf):
        nonlocal total, largest_dense
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

    jax.tree_util.tree_map_with_path(visit, params)
    return 3 * total, 2 * largest_dense  # params + mu + nu; 2x AG buffer


def temp_bytes_single_chip(layers, vis_layers, seq_len, per_chip, remat,
                           image_size):
    """XLA temp buffer bytes of the mm train step compiled single-chip
    at the per-chip batch (AOT: no data allocated)."""
    from competesmoe_tpu.train.lm_trainer import TrainState
    from competesmoe_tpu.train.mm_task import (
        make_mm_optimizer,
        make_mm_train_step,
    )

    model, cfg, tcfg = build_model(layers, vis_layers, seq_len, remat,
                                   image_size)
    params = param_shapes(model, cfg)
    optimizer = make_mm_optimizer(tcfg, params)
    opt_state = jax.eval_shape(optimizer.init, params)
    state = TrainState(params=params, opt_state=opt_state,
                       step=jax.ShapeDtypeStruct((), jnp.int32))
    B = per_chip
    batch = {
        "input_ids": jax.ShapeDtypeStruct((B, seq_len), jnp.int32),
        "labels": jax.ShapeDtypeStruct((B, seq_len), jnp.int32),
        "attention_mask": jax.ShapeDtypeStruct((B, seq_len), jnp.int32),
        "images": jax.ShapeDtypeStruct(
            (B, cfg.vision.image_size, cfg.vision.image_size, 3),
            jnp.float32),
    }
    step = make_mm_train_step(model, optimizer, donate=True)
    compiled = step.lower(state, batch).compile()
    return int(compiled.memory_analysis().temp_size_in_bytes)


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
    a = ap.parse_args(argv)

    platform = jax.devices()[0].platform
    # static term: exact, from the full-depth geometry
    model, cfg, _ = build_model(a.extrapolate_to, a.vis_layers, a.seq_len,
                                True, a.image_size)
    params = param_shapes(model, cfg)
    static_b, ag_b = static_bytes_per_chip(params, a.data_size,
                                           a.expert_size)
    n_params = sum(l.size for l in jax.tree_util.tree_leaves(params))
    print(json.dumps({"params_b": round(n_params / 1e9, 3),
                      "static_gb_per_chip": round(static_b / 1e9, 2),
                      "allgather_transient_gb": round(ag_b / 1e9, 2)}),
          flush=True)

    rows = []
    for per_chip in [int(b) for b in a.batches.split(",")]:
        for remat in ([True] if a.no_remat_ab else [True, False]):
            lo = temp_bytes_single_chip(a.layers // 2, a.vis_layers,
                                        a.seq_len, per_chip, remat,
                                        a.image_size)
            hi = temp_bytes_single_chip(a.layers, a.vis_layers,
                                        a.seq_len, per_chip, remat,
                                        a.image_size)
            slope = (hi - lo) / (a.layers - a.layers // 2)
            temp = hi + slope * (a.extrapolate_to - a.layers)
            peak = (static_b + ag_b + temp) / 1e9
            rows.append({
                "per_chip_batch": per_chip, "remat": remat,
                "layers": a.extrapolate_to,
                "static_gb": round(static_b / 1e9, 2),
                "pred_temp_gb": round(temp / 1e9, 2),
                "pred_peak_gb": round(peak, 2),
                "fits_v5e": peak < a.mem_gb,
                "compiled_at_layers": [a.layers // 2, a.layers],
                "temp_gb_at_compiled": [round(lo / 1e9, 2),
                                        round(hi / 1e9, 2)],
            })
            print(json.dumps({"progress": rows[-1]}), flush=True)

    print(json.dumps({
        "metric": "mm_sft_5p1b_memory_envelope",
        "value": max((r["per_chip_batch"] for r in rows
                      if r["remat"] and r["fits_v5e"]), default=0),
        "unit": "max_per_chip_batch_fitting",
        "detail": {
            "rows": rows, "seq_len": a.seq_len,
            "mesh": f"data={a.data_size} expert={a.expert_size}",
            "mem_gb": a.mem_gb, "platform": platform,
            "method": "static = exact sharded params+Adam arithmetic; "
                      "transient = single-chip AOT buffer assignment at "
                      "the per-chip batch, linear layer extrapolation"
                      + (" [CPU-compiled: temps are ~3-6x UPPER BOUNDS "
                         "(f32 upcasts, fewer fusions); re-run on the "
                         "chip]" if platform == "cpu" else ""),
        }}))


if __name__ == "__main__":
    main()
