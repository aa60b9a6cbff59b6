"""Golden parity vs. an independent PyTorch implementation of the reference
semantics (Fsoft-AIC/CompeteSMoE). Weights are generated in torch, copied
into the JAX layers, and outputs / routing decisions / aux losses compared.

These oracles are re-implementations of the documented behavior (see
SURVEY.md §2a/§2b), not copies of the reference code.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as tF

from competesmoe_tpu.moe import MoEArgs, get_moe, get_pretrain_moe

torch.manual_seed(0)

B, N, D, E, K = 2, 7, 16, 4, 2

pytestmark = pytest.mark.parity



def torch_moe_mlp2_forward(x, gate_w, w1, b1, w2, b2, k):
    """Reference MoeLayer forward semantics: f32 softmax -> topk -> normalize
    -> per-expert Linear/GELU/Linear -> weighted combine."""
    logits = x @ gate_w.T
    gate_softmax = tF.softmax(logits, dim=-1, dtype=torch.float32)
    weights, sel = torch.topk(gate_softmax, k)
    weights = weights / torch.sum(weights, dim=-1, keepdim=True).to(x.dtype)
    out = torch.zeros(x.shape[0], x.shape[1], w2.shape[-1], dtype=x.dtype)
    for e in range(w1.shape[0]):
        h = tF.gelu(x @ w1[e] + b1[e])
        oe = h @ w2[e] + b2[e]
        for j in range(k):
            m = (sel[..., j] == e).to(x.dtype) * weights[..., j].to(x.dtype)
            out = out + m[..., None] * oe
    return out, logits, gate_softmax, weights, sel


def test_multimodal_smoe_forward_parity():
    x = torch.randn(B, N, D)
    gate_w = torch.randn(E, D) * 0.02
    w1 = torch.randn(E, D, D) * 0.2
    b1 = torch.randn(E, D) * 0.05
    w2 = torch.randn(E, D, D) * 0.2
    b2 = torch.randn(E, D) * 0.05

    t_out, t_logits, t_softmax, t_w, t_sel = torch_moe_mlp2_forward(
        x, gate_w, w1, b1, w2, b2, K)

    layer = get_moe("smoe")(in_dim=D, out_dim=D, n_experts=E, n_selected=K,
                            args=MoEArgs())
    params = {"params": {
        "gate_kernel": jnp.asarray(gate_w.numpy().T),
        "experts_w1": jnp.asarray(w1.numpy()),
        "experts_b1": jnp.asarray(b1.numpy()),
        "experts_w2": jnp.asarray(w2.numpy()),
        "experts_b2": jnp.asarray(b2.numpy()),
    }}
    y, aux = layer.apply(params, jnp.asarray(x.numpy()), train=True)

    np.testing.assert_array_equal(np.asarray(aux.selected_experts),
                                  t_sel.numpy())
    np.testing.assert_allclose(np.asarray(y), t_out.numpy(), rtol=2e-4,
                               atol=2e-5)

    # Aux losses: balance (top-1 quirk) + z-loss
    z = t_logits.logsumexp(-1).square().mean()
    dp = t_softmax.mean(dim=1)
    oh = tF.one_hot(t_sel[..., 0], E).float().mean(dim=1)
    bal = (dp * oh).mean() * E**2
    want = bal * 0.01 + z * 0.001
    np.testing.assert_allclose(float(aux.aux_loss), float(want), rtol=1e-4)


def test_multimodal_competesmoe_competition_parity():
    """Flip-step affinity routing: mean(softplus(expert_out)) top-k."""
    x = torch.randn(B, N, D)
    gate_w = torch.randn(E, D) * 0.02
    w1 = torch.randn(E, D, D) * 0.2
    b1 = torch.randn(E, D) * 0.05
    w2 = torch.randn(E, D, D) * 0.2
    b2 = torch.randn(E, D) * 0.05

    # torch oracle of competition_policy
    outs = []
    for e in range(E):
        h = tF.gelu(x @ w1[e] + b1[e])
        outs.append(h @ w2[e] + b2[e])
    outs = torch.stack(outs, dim=2)  # [B,N,E,D]
    affinity = tF.softplus(outs).mean(-1)
    aff_softmax = tF.softmax(affinity, dim=-1, dtype=torch.float32)
    t_w, t_sel = torch.topk(affinity, K)
    t_w = t_w / t_w.sum(-1, keepdim=True)
    t_out = torch.einsum("bnkd,bnk->bnd",
                         torch.gather(outs, 2, t_sel[..., None].expand(
                             B, N, K, D)), t_w)

    flips = np.ones(10, dtype=bool)
    layer = get_moe("competesmoe")(
        in_dim=D, out_dim=D, n_experts=E, n_selected=K, args=MoEArgs(),
        flip_schedule=flips, step_warm=0)
    params = {"params": {
        "gate_kernel": jnp.asarray(gate_w.numpy().T),
        "experts_w1": jnp.asarray(w1.numpy()),
        "experts_b1": jnp.asarray(b1.numpy()),
        "experts_w2": jnp.asarray(w2.numpy()),
        "experts_b2": jnp.asarray(b2.numpy()),
    }}
    y, aux = layer.apply(params, jnp.asarray(x.numpy()), train=True, step=0)
    np.testing.assert_array_equal(np.asarray(aux.selected_experts),
                                  t_sel.numpy())
    np.testing.assert_allclose(np.asarray(y), t_out.numpy(), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(aux.gate_softmax), aff_softmax.numpy(), rtol=1e-5,
        atol=1e-6)
    # router-distillation MSE
    gate_softmax = tF.softmax(x @ gate_w.T, dim=-1, dtype=torch.float32)
    want_rl = tF.mse_loss(gate_softmax, aff_softmax)
    np.testing.assert_allclose(float(aux.losses["routerloss"]),
                               float(want_rl), rtol=1e-4)


def test_pretrain_smoe_forward_parity():
    """MoEUT-style: x@keys -> relu -> @values with top-k softmax routing."""
    d, e_sz, n_exp, k = 16, 12, 8, 2
    x = torch.randn(B, N, d)
    w_gate = torch.randn(n_exp, d) * (d**-0.5)
    keys = torch.randn(n_exp, d, e_sz) * (d**-0.5)
    values = torch.randn(n_exp, e_sz, d) * ((n_exp * e_sz)**-0.5)

    logits = x @ w_gate.T
    gate_softmax = tF.softmax(logits, dim=-1, dtype=torch.float32)
    t_w, t_sel = torch.topk(gate_softmax, k)
    t_w = t_w / t_w.sum(-1, keepdim=True).to(x.dtype)
    out = torch.zeros(B, N, d)
    for ei in range(n_exp):
        h = torch.relu(x @ keys[ei])
        oe = h @ values[ei]
        for j in range(k):
            m = (t_sel[..., j] == ei).to(x.dtype) * t_w[..., j].to(x.dtype)
            out = out + m[..., None] * oe

    layer = get_pretrain_moe("smoe")(dmodel=d, n_experts=n_exp,
                                     expert_size=e_sz, n_heads=k,
                                     args=MoEArgs())
    params = {"params": {
        "w_gate": jnp.asarray(w_gate.numpy()),
        "keys": jnp.asarray(keys.numpy()),
        "values": jnp.asarray(values.numpy()),
    }}
    y, aux = layer.apply(params, jnp.asarray(x.numpy()), train=True,
                         return_id_experts=True)
    np.testing.assert_array_equal(np.asarray(aux.selected_experts),
                                  t_sel.numpy())
    np.testing.assert_allclose(np.asarray(y), out.numpy(), rtol=2e-4,
                               atol=2e-5)

    # entropy-balance reg: -entropy(log-mean softmax over tokens)
    lp = torch.log_softmax(logits.float(), -1)
    mean_lp = lp.logsumexp(dim=-2) - np.log(N)
    bal = -(-(mean_lp * mean_lp.exp()).sum(-1)).mean() * 0.01
    np.testing.assert_allclose(float(aux.aux_loss), float(bal), rtol=1e-4)


def test_pretrain_deepseekv2_parity():
    d, e_sz, n_exp, k = 16, 12, 8, 2
    x = torch.randn(B, N, d)
    w_gate = torch.randn(n_exp, d) * (d**-0.5)
    keys = torch.randn(n_exp, d, e_sz) * (d**-0.5)
    values = torch.randn(n_exp, e_sz, d) * ((n_exp * e_sz)**-0.5)
    keys_s = torch.randn(1, d, e_sz) * (d**-0.5)
    values_s = torch.randn(1, e_sz, d) * (e_sz**-0.5)

    logits = x @ w_gate.T
    t_w, t_sel = torch.topk(logits, k)
    t_w = tF.softmax(t_w, dim=-1).to(x.dtype)
    out = torch.zeros(B, N, d)
    for ei in range(n_exp):
        oe = torch.relu(x @ keys[ei]) @ values[ei]
        for j in range(k):
            m = (t_sel[..., j] == ei).to(x.dtype) * t_w[..., j]
            out = out + m[..., None] * oe
    out = out + torch.relu(x @ keys_s[0]) @ values_s[0]

    layer = get_pretrain_moe("deepseekv2")(dmodel=d, n_experts=n_exp,
                                           expert_size=e_sz, n_heads=k,
                                           args=MoEArgs())
    params = {"params": {
        "w_gate": jnp.asarray(w_gate.numpy()),
        "keys": jnp.asarray(keys.numpy()),
        "values": jnp.asarray(values.numpy()),
        "keys_shared": jnp.asarray(keys_s.numpy()),
        "values_shared": jnp.asarray(values_s.numpy()),
    }}
    y, aux = layer.apply(params, jnp.asarray(x.numpy()), train=False,
                         return_id_experts=True)
    np.testing.assert_array_equal(np.asarray(aux.selected_experts),
                                  t_sel.numpy())
    np.testing.assert_allclose(np.asarray(y), out.numpy(), rtol=2e-4,
                               atol=2e-5)


def test_multimodal_xmoe_routing_parity():
    x = torch.randn(B, N, D)
    red = E // 2
    inp_red = torch.randn(red, D) * 0.1
    emb = torch.randn(E, red) * 0.02

    reduced = x @ inp_red.T
    emb_renorm = emb * (1.5 / emb.norm(p=2, dim=-1, keepdim=True))
    xn = tF.normalize(reduced.float(), p=2.0, dim=-1, eps=1e-4)
    logits = (xn @ emb_renorm.float().T).to(x.dtype)
    gate_softmax = tF.softmax(logits / 0.3, dim=-1,
                              dtype=torch.float32).to(x.dtype)
    t_w, t_sel = torch.topk(gate_softmax, K)
    t_w = torch.softmax(t_w, dim=-1)

    layer = get_moe("xmoe")(in_dim=D, out_dim=D, n_experts=E, n_selected=K,
                            args=MoEArgs())
    xj = jnp.asarray(x.numpy())
    params = layer.init(jax.random.PRNGKey(0), xj)
    p = dict(params["params"])
    p["inp_reduction"] = jnp.asarray(inp_red.numpy().T)
    p["expert_embeddings"] = jnp.asarray(emb.numpy())
    y, aux = layer.apply({"params": p}, xj, train=True)
    np.testing.assert_array_equal(np.asarray(aux.selected_experts),
                                  t_sel.numpy())


def test_pretrain_competesmoe_competition_parity():
    """Pretrain-tree competition: two batched matmuls over all experts,
    affinity = mean(softplus(out)) (competition_policy_mlp_faster)."""
    d, e_sz, n_exp, k = 16, 12, 8, 2
    x = torch.randn(B, N, d)
    w_gate = torch.randn(n_exp, d) * (d**-0.5)
    keys = torch.randn(n_exp, d, e_sz) * (d**-0.5)
    values = torch.randn(n_exp, e_sz, d) * ((n_exp * e_sz)**-0.5)

    h = torch.matmul(x.view(-1, d), keys)          # [E, T, e]
    h = torch.relu(h)
    outs = torch.matmul(h, values).transpose(1, 0)  # [T, E, d]
    affinity = tF.softplus(outs).mean(-1)
    aff_softmax = tF.softmax(affinity, dim=-1, dtype=torch.float32)
    t_w, t_sel = torch.topk(affinity, k)
    t_w = t_w / t_w.sum(-1, keepdim=True)
    t_out = torch.einsum(
        "tkd,tk->td",
        torch.gather(outs, 1, t_sel[..., None].expand(-1, k, d)), t_w)
    t_out = t_out.view(B, N, d)
    t_sel = t_sel.view(B, N, k)
    gate_softmax = tF.softmax(x @ w_gate.T, dim=-1, dtype=torch.float32)
    want_rl = tF.mse_loss(gate_softmax, aff_softmax.view(B, N, n_exp))

    flips = np.ones(10, dtype=bool)
    layer = get_pretrain_moe("competesmoe")(
        dmodel=d, n_experts=n_exp, expert_size=e_sz, n_heads=k,
        args=MoEArgs(), flip_schedule=flips, step_warm=0)
    params = {"params": {
        "w_gate": jnp.asarray(w_gate.numpy()),
        "keys": jnp.asarray(keys.numpy()),
        "values": jnp.asarray(values.numpy()),
    }}
    y, aux = layer.apply(params, jnp.asarray(x.numpy()), train=True, step=0)
    np.testing.assert_array_equal(np.asarray(aux.selected_experts),
                                  t_sel.numpy())
    np.testing.assert_allclose(np.asarray(y), t_out.numpy(), rtol=2e-4,
                               atol=2e-5)
    got_rl = float(aux.losses["mlp_router_loss"]) / 0.01  # router_loss_coef
    np.testing.assert_allclose(got_rl, float(want_rl), rtol=1e-4)
