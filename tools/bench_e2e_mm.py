"""End-to-end CompeteSMoE-5.1B multimodal generate benchmark.

Times the full serving pipeline on one chip: image -> SigLIP-so400m MoE
tower -> MoE projector -> image-token splice -> Phi-3.5 decoder prefill ->
32-token greedy scan decode, at the released model's geometry with random
weights (throughput is architecture/bandwidth-bound).

  python tools/bench_e2e_mm.py [--quant int8] [--kv-quant int8] [--batch B]

Prints one JSON line with seconds per (prefill + 32 tokens) and derived
tok/s, steady-state (second call; first call compiles).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import sys
import time

import jax

# the axon sitecustomize pins the TPU backend at interpreter start;
# JAX_PLATFORMS env alone cannot override it after that, so honor an
# explicit request (COMPETESMOE_PLATFORM=cpu => CPU smoke run)
if _os.environ.get("COMPETESMOE_PLATFORM"):
    jax.config.update("jax_platforms",
                      _os.environ["COMPETESMOE_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from competesmoe_tpu.constants import IMAGE_TOKEN_INDEX
from competesmoe_tpu.models.builder import llava_config_from_hf
from competesmoe_tpu.models.llava import LlavaModel, generate

HF_5P1B = dict(
    model_type="llava_phi", vocab_size=32064, hidden_size=3072,
    intermediate_size=8192, num_hidden_layers=32,
    num_attention_heads=32, num_key_value_heads=32, rms_norm_eps=1e-5,
    max_position_embeddings=131072,
    original_max_position_embeddings=4096,
    mm_hidden_size=1152, mm_projector_type="moe", moe_name="smoe",
    num_experts=4, num_selected=2, clip_smoe=True, mlp_smoe=True,
    scales=[1],
    vision_config=dict(hidden_size=1152, intermediate_size=4304,
                       num_hidden_layers=27, num_attention_heads=16,
                       image_size=224, patch_size=14),
    tokenizer_model_max_length=2048)


def random_params(model, ids, px, seed=0):
    """Random params built ON DEVICE (host-numpy + device_put measured
    ~8 min for the 5.09B tree through the tunnel; tools/bench_decode.py
    has the same fix): one jitted initializer, big float leaves bf16,
    small ones (norms/scales) f32."""
    shapes = jax.eval_shape(
        lambda k: model.init(k, ids, px), jax.random.PRNGKey(seed))
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def build(key):
        keys = jax.random.split(key, len(leaves))
        out = []
        for k, leaf in zip(keys, leaves):
            if jnp.issubdtype(leaf.dtype, jnp.integer):
                hi = 8 if leaf.dtype == jnp.int4 else 128
                out.append(jax.random.randint(
                    k, leaf.shape, 1 - hi, hi,
                    jnp.int32).astype(leaf.dtype))
            elif leaf.size < 10**6:
                out.append(jax.random.normal(k, leaf.shape) * 2e-4)
            else:
                out.append((jax.random.normal(k, leaf.shape) * 0.02)
                           .astype(jnp.bfloat16))
        return jax.tree_util.tree_unflatten(treedef, out)

    return build(jax.random.PRNGKey(seed))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--new-tokens", type=int, default=32)
    ap.add_argument("--quant", default="", choices=["", "int8", "int4"])
    ap.add_argument("--kv-quant", default="", choices=["", "int8"])
    a = ap.parse_args()

    cfg = llava_config_from_hf(HF_5P1B, "llava_phi", jnp.bfloat16)
    if a.quant or a.kv_quant:
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(
                cfg.decoder, quant=a.quant or None,
                kv_quant=a.kv_quant or None))
    model = LlavaModel(cfg)

    B = a.batch
    prompt = np.full((B, 48), 5, np.int32)
    prompt[:, 8] = IMAGE_TOKEN_INDEX
    px = np.zeros((B, 224, 224, 3), np.float32)

    t0 = time.time()
    params = random_params(model, jnp.asarray(prompt[:, :4].clip(0)),
                           jnp.asarray(px))
    # put on device ONCE — host numpy params would re-upload ~5 GB per
    # call (measured: 363 s/call through the tunneled chip)
    params = jax.device_put(params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"built {n/1e9:.2f}B params in {time.time()-t0:.0f}s",
          file=sys.stderr)

    def run():
        toks, _ = generate(model, params, prompt, px,
                           max_new_tokens=a.new_tokens, temperature=0.0)
        return toks

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        toks = run()
        times.append(time.time() - t0)
    e2e = min(times)

    # TTFT via the serving path (stream_generate): time to the FIRST
    # yielded chunk — by construction prefill + one sampling step, the
    # property the true-streaming worker restored (VERDICT r2 item 2;
    # round-2's worker generated everything before the first byte).
    from competesmoe_tpu.models.llava import stream_generate

    def first_chunk_s():
        gen = stream_generate(model, params, prompt, px,
                              max_new_tokens=a.new_tokens,
                              temperature=0.0)
        t0 = time.time()
        next(gen)
        dt = time.time() - t0
        gen.close()
        return dt

    first_chunk_s()  # compile
    ttft = min(first_chunk_s() for _ in range(3))
    print(json.dumps({
        "metric": "e2e_mm_prefill_plus_decode_s",
        "value": round(e2e, 3),
        "unit": "s",
        "detail": {
            "geometry": "CompeteSMoE-5.1B (SigLIP-so400m MoE + MoE "
                        "projector + Phi-3.5-mini)",
            "batch": B, "new_tokens": a.new_tokens,
            "prompt_tokens": int(prompt.shape[1]),
            "image_tokens": cfg.num_image_tokens,
            "quant": a.quant or "bf16",
            "kv_quant": a.kv_quant or "bf16",
            "params_b": round(n / 1e9, 2),
            "tok_per_s_per_seq": round(a.new_tokens / e2e, 1),
            "streaming_ttft_s": round(ttft, 3),
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
