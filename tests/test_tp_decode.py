"""Tensor-parallel decoder sharding (VERDICT r1 item 8): param
PartitionSpecs + sharded KV cache produce identical decode results on the
virtual 8-device mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from competesmoe_tpu.models.decoder import DecoderConfig, DecoderLM, KVCache
from competesmoe_tpu.parallel.mesh import (
    decoder_param_shardings,
    kv_cache_sharding,
    make_tp_mesh,
)


def tiny_cfg(**kw):
    return DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128,
        original_max_position_embeddings=128, fused_qkv=True,
        dtype=jnp.float32, **kw)


def test_tp_decode_matches_unsharded():
    cfg = tiny_cfg()
    model = DecoderLM(cfg)
    B, T, kvlen = 4, 8, 32
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, T), 1, 64)
    params = model.init(jax.random.PRNGKey(1), ids)

    def decode(params, ids, cache):
        logits, cache, _ = model.apply(params, ids, cache=cache)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        toks = [tok]
        for _ in range(4):
            logits, cache, _ = model.apply(params, tok[:, None],
                                           cache=cache)
            tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            toks.append(tok)
        return np.stack([np.asarray(t) for t in toks])

    ref = decode(params, ids, KVCache.create(cfg, B, kvlen))

    mesh = make_tp_mesh(n_model=4, devices=jax.devices()[:8])
    shardings = decoder_param_shardings(mesh, params)
    sh_params = jax.device_put(params, shardings)
    cache = KVCache.create(cfg, B, kvlen)
    cache = KVCache(
        k=jax.device_put(cache.k, kv_cache_sharding(mesh)),
        v=jax.device_put(cache.v, kv_cache_sharding(mesh)),
        pos=jax.device_put(cache.pos, NamedSharding(mesh, P("data"))))
    with mesh:
        got = decode(sh_params,
                     jax.device_put(ids, NamedSharding(mesh, P("data"))),
                     cache)
    np.testing.assert_array_equal(ref, got)

    # the big matmul params are genuinely sharded over the model axis
    flat = jax.tree_util.tree_leaves_with_path(shardings)
    specs = {"/".join(getattr(p, "key", str(p)) for p in path): s.spec
             for path, s in flat}
    qkv = [s for k, s in specs.items() if "qkv_proj/kernel" in k]
    assert all(s == P(None, "model") for s in qkv) and qkv
    o = [s for k, s in specs.items() if "o_proj/kernel" in k]
    assert all(s == P("model", None) for s in o) and o
    lm = [s for k, s in specs.items() if "lm_head/kernel" in k]
    assert all(s == P(None, "model") for s in lm) and lm


def test_tp_decode_int8_kv_scales_sharded():
    """int8 KV cache under tensor parallelism: scales shard alongside the
    cache (the bench_decode --mesh --kv-quant path) and decode matches the
    unsharded int8 run exactly."""
    cfg = tiny_cfg(kv_quant="int8")
    model = DecoderLM(cfg)
    B, T, kvlen = 4, 8, 32
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, T), 1, 64)
    params = model.init(jax.random.PRNGKey(1), ids)

    def decode(params, ids, cache):
        logits, cache, _ = model.apply(params, ids, cache=cache)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        toks = [tok]
        for _ in range(3):
            logits, cache, _ = model.apply(params, tok[:, None],
                                           cache=cache)
            tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            toks.append(tok)
        return np.stack([np.asarray(t) for t in toks])

    ref = decode(params, ids, KVCache.create(cfg, B, kvlen))

    mesh = make_tp_mesh(n_model=4, devices=jax.devices()[:8])
    sh_params = jax.device_put(params,
                               decoder_param_shardings(mesh, params))
    cache = KVCache.create(cfg, B, kvlen)
    scale_sh = NamedSharding(mesh, P(None, "data", None, "model"))
    cache = KVCache(
        k=jax.device_put(cache.k, kv_cache_sharding(mesh)),
        v=jax.device_put(cache.v, kv_cache_sharding(mesh)),
        pos=jax.device_put(cache.pos, NamedSharding(mesh, P("data"))),
        k_scale=jax.device_put(cache.k_scale, scale_sh),
        v_scale=jax.device_put(cache.v_scale, scale_sh))
    with mesh:
        got = decode(sh_params,
                     jax.device_put(ids, NamedSharding(mesh, P("data"))),
                     cache)
    np.testing.assert_array_equal(ref, got)


def test_tp_decode_gqa_and_split_proj():
    """Split q/k/v projections + GQA (llama-style) shard correctly too."""
    cfg = tiny_cfg().__class__(**{**dataclasses.asdict(tiny_cfg()),
                                  "fused_qkv": False,
                                  "num_key_value_heads": 2})
    model = DecoderLM(cfg)
    B, T = 2, 6
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, T), 1, 64)
    params = model.init(jax.random.PRNGKey(3), ids)
    logits_ref, _, _ = model.apply(params, ids)

    mesh = make_tp_mesh(n_model=2, devices=jax.devices()[:4])
    sh = jax.device_put(params, decoder_param_shardings(mesh, params))
    with mesh:
        logits, _, _ = jax.jit(
            lambda p, i: model.apply(p, i))(sh, ids)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(logits_ref), rtol=2e-5,
                               atol=1e-5)


def test_quant_dense_decode_matches_dequantized():
    """QuantDense int8 runtime == explicit dequantized matmul, and the
    int8 decoder produces logits close to a bf16 decoder holding the
    dequantized weights (the load_8bit path, VERDICT item 9 runtime)."""
    import numpy as np
    from competesmoe_tpu.models.decoder import QuantDense

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    layer = QuantDense(16, mode="int8", dtype=jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    kq = np.asarray(params["params"]["kernel_q"], np.float32)
    sc = np.asarray(params["params"]["scale"])
    ref = np.asarray(x, np.float32) @ (kq * sc[None, :])
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)

    # full decoder: quantize a bf16 model's params -> int8 runtime and
    # compare logits against the same dequantized values in a plain model
    from competesmoe_tpu.models.builder import quantize_decoder_to_int8

    cfg = tiny_cfg()
    model = DecoderLM(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 1, 64)
    params = model.init(jax.random.PRNGKey(2), ids)["params"]
    qparams = quantize_decoder_to_int8(params)
    qcfg = dataclasses.replace(cfg, quant="int8")
    qmodel = DecoderLM(qcfg)
    qlogits, _, _ = qmodel.apply({"params": qparams}, ids)

    # dequantize back into the plain model for the reference forward
    def dequant(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict) and "kernel_q" in v:
                out[k] = dict(v)
                out[k]["kernel"] = (v["kernel_q"].astype(np.float32)
                                    * np.asarray(v["scale"])[None, :])
                del out[k]["kernel_q"], out[k]["scale"]
            elif isinstance(v, dict):
                out[k] = dequant(v)
            else:
                out[k] = v
        return out

    ref_logits, _, _ = model.apply({"params": dequant(qparams)}, ids)
    np.testing.assert_allclose(np.asarray(qlogits), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-4)
