"""Blockwise-int8 Adam state (train/quant_opt.py) — the seq-2048 memory
lever (docs/sharding.md). Reference role: the optimizer states ZeRO-3
shards in /root/reference/scripts/zero3.json; on 16 GB v5e chips the
same sft recipe needs the moments at 1 byte/element.

Covers: quantizer round-trip bounds, training parity vs optax.adamw on
a real regression, state byte accounting, checkpoint round-trip through
the Saver, and the mm optimizer wiring.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from competesmoe_tpu.train.quant_opt import (
    QuantLeaf,
    dequantize_signed,
    dequantize_sqrt,
    quantize_signed,
    quantize_sqrt,
    quantized_adamw,
    scale_by_quant_adam,
    state_bytes,
)

pytestmark = pytest.mark.fast


def test_signed_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    for shape in [(4096,), (16, 300), (3, 5, 1024)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        q = quantize_signed(x, block=256)
        assert q.q.shape == x.shape and q.q.dtype == jnp.int8
        y = dequantize_signed(q, block=256)
        # absmax linear int8: error <= scale/2 = blockmax/254 per elem
        blockmax = np.abs(np.asarray(x)).max()
        assert float(jnp.abs(y - x).max()) <= blockmax / 254 + 1e-7


def test_sqrt_roundtrip_relative_error():
    rng = np.random.default_rng(1)
    # nu-like: squared-gradient EMA spans orders of magnitude
    x = jnp.asarray((rng.normal(size=(8, 1024)) ** 2
                     * 10.0 ** rng.uniform(-6, 0, size=(8, 1))
                     ).astype(np.float32))
    q = quantize_sqrt(x, block=256)
    assert q.q.dtype == jnp.uint8
    y = dequantize_sqrt(q, block=256)
    # sqrt-domain codes: elementwise error of sqrt(x) <= sqrt(max)/510
    r, rq = np.sqrt(np.asarray(x)), np.sqrt(np.asarray(y))
    per_block_max = r.reshape(8, 4, 256).max(-1, keepdims=True)
    err = np.abs(rq.reshape(8, 4, 256) - r.reshape(8, 4, 256))
    assert (err <= per_block_max / 509 + 1e-7).all()
    assert float(jnp.abs(y - x).max()) >= 0.0  # finite


def test_ragged_last_dim_roundtrip():
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(7, 1000)).astype(np.float32))  # 1000 % 256 != 0
    q = quantize_signed(x, block=256)
    assert q.q.shape == x.shape
    assert q.scale.shape == (7, 4)
    y = dequantize_signed(q, block=256)
    assert float(jnp.abs(y - x).max()) < np.abs(np.asarray(x)).max() / 200


def _train(opt, w0, X, Y, steps=300):
    params = {"w": w0}
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss(p):
            return jnp.mean((X @ p["w"] - Y) ** 2)
        l, g = jax.value_and_grad(loss)(params)
        upd, state2 = opt.update(g, state, params)
        return optax.apply_updates(params, upd), state2, l

    for _ in range(steps):
        params, state, l = step(params, state)
    return float(l), params, state


def test_quantized_adam_matches_fp_adam_on_regression():
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.normal(size=(256, 4096)).astype(np.float32))
    w_true = jnp.asarray(rng.normal(size=(4096, 8)).astype(np.float32))
    Y = X @ w_true
    w0 = jnp.zeros((4096, 8), jnp.float32)  # size >= 4096 -> quantized

    l_fp, _, _ = _train(optax.adamw(1e-2, weight_decay=1e-4), w0, X, Y)
    l_q, _, st = _train(quantized_adamw(1e-2, weight_decay=1e-4),
                        w0, X, Y)
    # both must actually optimize, to a comparable floor
    init_loss = float(jnp.mean(Y ** 2))
    assert l_fp < init_loss * 1e-2
    assert l_q < init_loss * 1e-2
    assert l_q < max(l_fp * 3.0, l_fp + 1e-3)
    # and the moments really are 8-bit
    inner = st[0]  # scale_by_quant_adam state within the chain
    mu_leaf = inner.mu["w"]
    assert isinstance(mu_leaf, QuantLeaf)
    assert mu_leaf.q.dtype == jnp.int8
    assert inner.nu["w"].q.dtype == jnp.uint8


def test_small_leaves_stay_float():
    params = {"big": jnp.zeros((64, 128)), "tiny": jnp.zeros((17,))}
    t = scale_by_quant_adam()
    st = t.init(params)
    assert isinstance(st.mu["big"], QuantLeaf)
    assert not isinstance(st.mu["tiny"], QuantLeaf)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, st2 = t.update(g, st, params)
    assert upd["tiny"].shape == (17,)
    assert st2.mu["tiny"].dtype == params["tiny"].dtype


def test_state_bytes_half_of_bf16_moments():
    params = {"w": jnp.zeros((512, 512), jnp.bfloat16)}
    st8 = scale_by_quant_adam().init(params)
    stf = optax.scale_by_adam().init(params)
    b8 = state_bytes((st8.mu, st8.nu))
    bf = state_bytes((stf.mu, stf.nu))
    # int8 codes + f32 scale per 256-block ~= 0.508x of bf16 moments
    assert b8 < 0.52 * bf


def test_mm_optimizer_flag_builds_quant_state():
    from competesmoe_tpu.train.mm_task import (
        MMTrainConfig,
        make_mm_optimizer,
    )
    params = {"decoder": {"w": jnp.zeros((64, 128), jnp.bfloat16)},
              "vision_tower": {"w": jnp.zeros((64, 128), jnp.bfloat16)},
              "mm_projector": {"w": jnp.zeros((64, 128), jnp.bfloat16)}}
    tcfg = MMTrainConfig(stage="sft", total_steps=10, opt_state_8bit=True)
    opt = make_mm_optimizer(tcfg, params)
    st = opt.init(params)
    found = [l for l in jax.tree_util.tree_leaves(
        st, is_leaf=lambda x: isinstance(x, QuantLeaf))
        if isinstance(x := l, QuantLeaf)]
    assert found, "no QuantLeaf in mm opt state with opt_state_8bit"
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = opt.update(g, st, params)
    assert upd["decoder"]["w"].shape == (64, 128)


def test_checkpoint_roundtrip(tmp_path):
    from competesmoe_tpu.train.checkpoint import Saver

    params = {"w": jnp.asarray(np.random.default_rng(5).normal(
        size=(64, 128)).astype(np.float32))}
    opt = quantized_adamw(1e-2)
    st = opt.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    _, st = opt.update(g, st, params)

    saver = Saver(tmp_path / "ckpt", save_interval=1)
    saver["state"] = {"opt": st}
    saver.save(step=1)
    saver2 = Saver(tmp_path / "ckpt", save_interval=1)
    saver2["state"] = {"opt": opt.init(params)}  # template
    assert saver2.restore() == 1
    st2 = saver2["state"]["opt"]
    for a, b in zip(jax.tree_util.tree_leaves(st),
                    jax.tree_util.tree_leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
