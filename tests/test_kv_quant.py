"""int8 KV-cache decode tests (DecoderConfig.kv_quant)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from competesmoe_tpu.models.decoder import (
    DecoderLM,
    KVCache,
    _quantize_kv,
    phi35_mini_config,
)


def tiny_cfg(**kw):
    base = dataclasses.replace(
        phi35_mini_config(), num_hidden_layers=2, vocab_size=128,
        hidden_size=64, intermediate_size=128, num_attention_heads=4,
        num_key_value_heads=4, rope_scaling_type=None,
        rope_short_factor=None, rope_long_factor=None, dtype=jnp.float32)
    return dataclasses.replace(base, **kw)


def test_quantize_kv_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 32),
                          jnp.float32)
    q, s = _quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 4, 8)
    xd = q.astype(jnp.float32) * s[..., None]
    rel = float(jnp.max(jnp.abs(xd - x)) / jnp.max(jnp.abs(x)))
    assert rel < 0.01  # int8 per-(token,head) symmetric quantization


def test_kv_cache_create_int8():
    cfg = tiny_cfg(kv_quant="int8")
    cache = KVCache.create(cfg, batch=3, max_len=16)
    assert cache.k.dtype == jnp.int8
    assert cache.k_scale.shape == (2, 3, 16, 4)
    bf16_cache = KVCache.create(tiny_cfg(), batch=3, max_len=16)
    assert bf16_cache.k_scale is None


def test_int8_kv_decode_close_to_bf16_kv():
    """Prefill + decode logits with the int8 cache stay within int8
    quantization noise of the full-precision cache."""
    cfg_b = tiny_cfg()
    cfg_q = tiny_cfg(kv_quant="int8")
    m_b, m_q = DecoderLM(cfg_b), DecoderLM(cfg_q)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 10), 0, 128)
    params = m_b.init(jax.random.PRNGKey(1), ids)

    lb, cb, _ = m_b.apply(params, ids, cache=KVCache.create(cfg_b, 2, 24))
    lq, cq, _ = m_q.apply(params, ids, cache=KVCache.create(cfg_q, 2, 24))
    scale = float(jnp.abs(lb).max())
    assert float(jnp.abs(lb - lq).max()) < 0.05 * scale
    np.testing.assert_array_equal(np.asarray(cb.pos), np.asarray(cq.pos))

    # one decode step with each cache: logits still close
    tok = jnp.argmax(lb[:, -1], -1)[:, None]
    lb2, _, _ = m_b.apply(params, tok, cache=cb)
    lq2, _, _ = m_q.apply(params, tok, cache=cq)
    assert float(jnp.abs(lb2 - lq2).max()) < 0.05 * scale


def test_int8_kv_respects_padding_mask():
    """Left-padded prefill rows must not let pad K/V leak into attention
    (the dump-slot convention survives quantization)."""
    cfg = tiny_cfg(kv_quant="int8")
    model = DecoderLM(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (1, 6), 1, 128)
    params = model.init(jax.random.PRNGKey(1), ids)

    # unpadded
    l1, c1, _ = model.apply(params, ids, cache=KVCache.create(cfg, 1, 16))
    # left-padded by 3 garbage tokens
    pad = jnp.zeros((1, 3), jnp.int32)
    ids_p = jnp.concatenate([pad, ids], axis=1)
    am = jnp.concatenate([jnp.zeros((1, 3), jnp.int32),
                          jnp.ones((1, 6), jnp.int32)], axis=1)
    l2, c2, _ = model.apply(params, ids_p, attention_mask=am,
                            cache=KVCache.create(cfg, 1, 16))
    np.testing.assert_allclose(np.asarray(l1[:, -1]),
                               np.asarray(l2[:, -1]), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(c1.pos), np.asarray(c2.pos))


def test_attn_window_token_exact():
    """Windowed KV reads (attn_window) produce identical decode tokens:
    slots at or past the live prefix are masked anyway, so slicing them
    off only skips their HBM traffic (tools/bench_decode.py windowed)."""
    import numpy as np

    from competesmoe_tpu.models.decoder import (
        DecoderConfig, DecoderLM, KVCache)

    cfg = DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        original_max_position_embeddings=128, fused_qkv=True,
        dtype=jnp.float32)
    model = DecoderLM(cfg)
    B, T, MAX = 2, 6, 64
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, T), 1, 64)
    params = model.init(jax.random.PRNGKey(1), ids)

    def decode(window):
        cache = KVCache.create(cfg, B, MAX)
        logits, cache, _ = model.apply(params, ids, cache=cache)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        toks = [np.asarray(tok)]
        for _ in range(5):
            logits, cache, _ = model.apply(params, tok[:, None],
                                           cache=cache,
                                           attn_window=window)
            tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            toks.append(np.asarray(tok))
        return np.stack(toks)

    full = decode(None)
    win = decode(16)   # prefill 6 + 5 steps = 11 live slots < 16
    np.testing.assert_array_equal(full, win)


def test_attn_window_int8_kv_token_exact():
    import numpy as np

    from competesmoe_tpu.models.decoder import (
        DecoderConfig, DecoderLM, KVCache)

    cfg = DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        original_max_position_embeddings=128, fused_qkv=True,
        kv_quant="int8", dtype=jnp.float32)
    model = DecoderLM(cfg)
    B, T, MAX = 2, 6, 64
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, T), 1, 64)
    params = model.init(jax.random.PRNGKey(1), ids)

    def decode(window):
        cache = KVCache.create(cfg, B, MAX)
        logits, cache, _ = model.apply(params, ids, cache=cache)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        toks = [np.asarray(tok)]
        for _ in range(4):
            logits, cache, _ = model.apply(params, tok[:, None],
                                           cache=cache,
                                           attn_window=window)
            tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            toks.append(np.asarray(tok))
        return np.stack(toks)

    np.testing.assert_array_equal(decode(None), decode(16))


def test_int4_weight_runtime_decode():
    """w4a16: kernels stored nibble-packed (two int4 values per int8
    byte — decoder.pack_int4; jnp.int4 cannot cross jit boundaries on
    the axon TPU backend), decode runs and tracks the bf16 model (loose
    tolerance — 4-bit grid)."""
    import dataclasses

    import numpy as np

    from competesmoe_tpu.models.builder import quantize_decoder_to_int8
    from competesmoe_tpu.models.decoder import (
        DecoderConfig, DecoderLM, KVCache)

    cfg = DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        original_max_position_embeddings=128, fused_qkv=True,
        dtype=jnp.float32)
    model = DecoderLM(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 6), 1, 64)
    params = model.init(jax.random.PRNGKey(1), ids)["params"]
    ref, _, _ = model.apply({"params": params}, ids)

    q4 = quantize_decoder_to_int8(params, bits=4)
    kq = q4["layers_0"]["self_attn"]["qkv_proj"]["kernel_q"]
    assert kq.dtype == jnp.int8
    assert kq.shape[0] == cfg.hidden_size // 2   # nibble-packed
    cfg4 = dataclasses.replace(cfg, quant="int4")
    model4 = DecoderLM(cfg4)
    out, _, _ = model4.apply({"params": q4}, ids)
    # 4-bit grid: ranking should broadly survive on a tiny random model
    ref_p = jax.nn.softmax(np.asarray(ref, np.float32), axis=-1)
    out_p = jax.nn.softmax(np.asarray(out, np.float32), axis=-1)
    assert np.abs(ref_p - out_p).max() < 0.35
    # and decode with cache runs
    cache = KVCache.create(cfg4, 2, 16)
    logits, cache, _ = model4.apply({"params": q4}, ids, cache=cache)
    assert np.isfinite(np.asarray(logits)).all()
