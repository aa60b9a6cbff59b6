"""MoA (FullMoeRopeAttention) tests.

The reference's MoA path is dormant (its `att_forward` is commented out in
layers/moe/moe.py:456-489), so there is no runnable torch oracle; instead
the semantics defined by that commented code are checked against a
from-first-principles numpy loop oracle here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from competesmoe_tpu.models.lm import LMConfig, MoELanguageModel, lm_loss_fn
from competesmoe_tpu.models.moa import (
    AttentionExpertBank,
    FullMoeRopeAttention,
    att_entropy_balance,
)
from competesmoe_tpu.moe import MoEArgs

pytestmark = pytest.mark.slow



def moa_cfg(**kw):
    base = dict(vocab_size=64, d_model=32, n_layers=2, n_heads=2,
                n_experts=4, expert_size=8, moe_topk=2, moe_name="smoe",
                moe_args=MoEArgs(), att_moe=True, att_n_experts=4, att_k=2)
    base.update(kw)
    return LMConfig(**base)


def bank_oracle(x, w_gate, experts, topk):
    """Loop oracle for att_forward + compute_moe (moe.py:456-489):
    per-head top-k over the gate logits, sigmoid combine weights."""
    B, T, D = x.shape
    H, E, IN, OUT = experts.shape
    logits = (x @ w_gate.T).reshape(B, T, H, E)
    out = np.zeros((B, T, H, OUT), np.float64)
    idx_all = np.zeros((B, T, H, topk), np.int64)
    for b in range(B):
        for t in range(T):
            for h in range(H):
                idx = np.argsort(-logits[b, t, h])[:topk]
                idx_all[b, t, h] = sorted(idx, key=lambda e:
                                          -logits[b, t, h, e])
                for e in idx:
                    w = 1.0 / (1.0 + np.exp(-logits[b, t, h, e]))
                    out[b, t, h] += w * (x[b, t] @ experts[h, e])
    return out, idx_all, logits


@pytest.fixture(scope="module")
def bank_setup():
    rng = np.random.RandomState(0)
    B, T, D, H, E, OUT, K = 2, 5, 16, 2, 4, 8, 2
    x = rng.randn(B, T, D).astype(np.float32)
    bank = AttentionExpertBank(n_heads=H, n_experts=E, d_sel=D, in_size=D,
                               out_size=OUT, topk=K)
    params = bank.init(jax.random.PRNGKey(1), jnp.asarray(x),
                       method=AttentionExpertBank.select)
    return x, bank, params


def test_bank_select_and_project_match_loop_oracle(bank_setup):
    x, bank, params = bank_setup
    w_gate = np.asarray(params["params"]["w_gate"])
    experts = np.asarray(params["params"]["experts"])

    idx, val, logits = bank.apply(params, jnp.asarray(x),
                                  method=AttentionExpertBank.select)
    out = bank.apply(params, jnp.asarray(x), idx, val,
                     method=AttentionExpertBank.project)

    ref_out, ref_idx, ref_logits = bank_oracle(x, w_gate, experts,
                                               bank.topk)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=1e-4)
    np.testing.assert_array_equal(np.sort(np.asarray(idx), -1),
                                  np.sort(ref_idx, -1))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-4)


def test_bank_project_out_sums_heads_and_topk(bank_setup):
    x, bank, params = bank_setup
    experts = np.asarray(params["params"]["experts"])
    H, E, IN, OUT = experts.shape
    B, T = x.shape[:2]
    rng = np.random.RandomState(3)
    res = rng.randn(B, T, H, IN).astype(np.float32)

    idx, val, _ = bank.apply(params, jnp.asarray(x),
                             method=AttentionExpertBank.select)
    out = bank.apply(params, jnp.asarray(res), idx, val,
                     method=AttentionExpertBank.project_out)
    assert out.shape == (B, T, OUT)

    idx_np, val_np = np.asarray(idx), np.asarray(val)
    ref = np.zeros((B, T, OUT), np.float64)
    for b in range(B):
        for t in range(T):
            for h in range(H):
                for j in range(bank.topk):
                    ref[b, t] += val_np[b, t, h, j] * (
                        res[b, t, h] @ experts[h, idx_np[b, t, h, j]])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_gate_init_replicates_renorm_rows():
    """The gate init = N(0, std) then renorm_rows (moe.py:111-112):
    x /= ||x||_row; x *= row_std / new_overall_std."""
    from competesmoe_tpu.models.moa import _renormed_rows_init
    key = jax.random.PRNGKey(7)
    got = np.asarray(_renormed_rows_init(0.05)(key, (8, 16)))

    x = 0.05 * np.asarray(jax.random.normal(key, (8, 16), jnp.float32))
    std_t = x.std(axis=-1, keepdims=True)
    x = x / np.linalg.norm(x, axis=-1, keepdims=True)
    x = x * (std_t / x.std())
    np.testing.assert_allclose(got, x, atol=1e-6)
    assert abs(got.std() - 0.05) < 0.02


def test_att_entropy_balance_prefers_uniform_routing():
    B, T, H, E = 2, 16, 2, 4
    uniform = jnp.zeros((B, T, H, E))
    skewed = jnp.zeros((B, T, H, E)).at[..., 0].set(8.0)
    assert float(att_entropy_balance(uniform)) < \
        float(att_entropy_balance(skewed))


def test_moa_attention_forward_and_grads():
    cfg = moa_cfg()
    attn = FullMoeRopeAttention(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, cfg.d_model))
    params = attn.init(jax.random.PRNGKey(1), x, train=True)
    out, aux = attn.apply(params, x, train=True)
    assert out.shape == (2, 7, cfg.d_model)
    assert set(aux.losses) == {"att_q_ebalance", "att_k_ebalance",
                               "att_v_ebalance", "att_o_ebalance"}
    assert np.isfinite(float(aux.aux_loss))

    def loss(p):
        o, a = attn.apply(p, x, train=True)
        return jnp.sum(o**2) + a.aux_loss

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # every expert bank's gate receives gradient (sigmoid weights are
    # differentiable, unlike a hard top-k)
    for name in ("q_bank", "k_bank", "v_bank", "o_bank"):
        g = np.asarray(grads["params"][name]["w_gate"])
        assert np.abs(g).sum() > 0, name


def test_moa_attention_is_causal():
    cfg = moa_cfg()
    attn = FullMoeRopeAttention(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, cfg.d_model))
    params = attn.init(jax.random.PRNGKey(1), x)
    out1, _ = attn.apply(params, x)
    x2 = x.at[:, -1].set(99.0)  # future token change
    out2, _ = attn.apply(params, x2)
    np.testing.assert_allclose(np.asarray(out1[:, :-1]),
                               np.asarray(out2[:, :-1]), atol=1e-5)


def test_moa_non_expert_fallbacks():
    cfg = moa_cfg(att_q_expert=False, att_o_expert=False)
    attn = FullMoeRopeAttention(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, cfg.d_model))
    params = attn.init(jax.random.PRNGKey(1), x, train=True)
    out, aux = attn.apply(params, x, train=True)
    assert out.shape == (2, 5, cfg.d_model)
    assert set(aux.losses) == {"att_k_ebalance", "att_v_ebalance"}
    assert "q_dense" in params["params"]
    assert "o_dense" in params["params"]


def test_moa_v_projection_size():
    cfg = moa_cfg(att_v_size=12)
    attn = FullMoeRopeAttention(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, cfg.d_model))
    params = attn.init(jax.random.PRNGKey(1), x)
    out, _ = attn.apply(params, x)
    assert out.shape == (1, 4, cfg.d_model)
    assert params["params"]["v_bank"]["experts"].shape == \
        (cfg.n_heads, cfg.att_n_experts, cfg.d_model, 12)
    assert params["params"]["o_bank"]["experts"].shape == \
        (cfg.n_heads, cfg.att_n_experts, 12, cfg.d_model)


def test_lm_with_moa_end_to_end_train_step():
    """SUT-style stack: universal sharing + MoA attention + MoE FFN, one
    grad step (the reference's sut_transformer role)."""
    cfg = moa_cfg(n_layers=4, universal_group_size=2)
    model = MoELanguageModel(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 9), 0,
                                cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), tokens)

    def loss_fn(p):
        logits, aux = model.apply(p, tokens, train=True)
        ce, _ = lm_loss_fn(logits[:, :-1], tokens[:, 1:])
        return ce + aux["total_aux_loss"]

    l0 = float(loss_fn(params))
    grads = jax.grad(loss_fn)(params)
    params2 = jax.tree_util.tree_map(lambda p, g: p - 0.1 * g, params,
                                     grads)
    l1 = float(loss_fn(params2))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0


def test_moa_expert_dropout_changes_selection_distribution():
    bank = AttentionExpertBank(n_heads=2, n_experts=4, d_sel=16, in_size=16,
                               out_size=8, topk=2, expert_dropout=0.9)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 16))
    params = bank.init(
        {"params": jax.random.PRNGKey(1),
         "expert_drop": jax.random.PRNGKey(2)}, x, train=True,
        method=AttentionExpertBank.select)
    idx_eval, _, _ = bank.apply(params, x, train=False,
                                method=AttentionExpertBank.select)
    idx_a, _, _ = bank.apply(params, x, train=True,
                             rngs={"expert_drop": jax.random.PRNGKey(3)},
                             method=AttentionExpertBank.select)
    idx_b, _, _ = bank.apply(params, x, train=True,
                             rngs={"expert_drop": jax.random.PRNGKey(4)},
                             method=AttentionExpertBank.select)
    assert not np.array_equal(np.asarray(idx_a), np.asarray(idx_b))
    assert not np.array_equal(np.asarray(idx_a), np.asarray(idx_eval))
