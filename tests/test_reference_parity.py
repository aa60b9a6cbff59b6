"""Parity vs the ACTUAL PyTorch reference in /root/reference.

Unlike tests/test_torch_parity.py (re-implemented oracles), every oracle
here is the reference's own nn.Module run on CPU with weights copied into
the JAX layers — the north star's "routing decisions match the PyTorch
reference exactly" measured against the real code
(moe_model/model/moe/*.py, moe_pretrain_model/layers/moe/competesmoe.py).

The pretrain tree's CVMM kernel is Triton (GPU-only); for full-forward
parity its `compute_moe_main` is monkeypatched with a mathematically
equivalent dense torch computation — routing, affinities, and every loss
still come from unmodified reference code.
"""

import types
from types import SimpleNamespace
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import reference_loader as rl
from competesmoe_tpu.moe import MoEArgs, build_flip_schedule
from competesmoe_tpu.moe import layers as jl
from competesmoe_tpu.moe import pretrain_layers as jpl

torch.manual_seed(0)

RTOL, ATOL = 2e-5, 2e-6


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

pytestmark = pytest.mark.parity


def mm_cls(name):
    rl.mm_moe(name)  # ensure module (and its registration) is loaded
    return rl.mm_moe("register").MOE_REGISTRY[
        {"shard_smoe": "smoe_share", "deepseekv3": "deepseekv3",
         "smoe": "smoe", "xmoe": "xmoe", "competesmoe": "competesmoe",
         "smoe_perturbed": "smoe_perturbed",
         "smoe_sigmoidgating": "smoe_sigmoidgating"}[name]]


def mm_args(**over):
    d = dict(balance_loss_coef=0.01, router_z_loss_coef=0.001,
             rate_flip=0.3, warm_up=0.0, max_compete_in_iter=2,
             router_loss_coef=0.01, diversity_loss_coef=0.01,
             bal_comp_loss_coef=0.01, router_theta=0.1,
             hybrid=False, norm_sigmoid=False, init_weight=True)
    d.update(over)
    return SimpleNamespace(**d)


def moe_args(**over):
    return MoEArgs(**over)


def t2n(t):
    # .copy() matters: the cosine-gate layers renorm their embeddings
    # IN-PLACE during forward, and numpy() returns a view
    return t.detach().cpu().numpy().copy()


def copy_mm_weights(ref, n_experts=None):
    """Stacked-tensor params from the reference's ModuleList experts."""
    p = {
        "experts_w1": np.stack([t2n(e[0].weight).T for e in ref.experts]),
        "experts_b1": np.stack([t2n(e[0].bias) for e in ref.experts]),
        "experts_w2": np.stack([t2n(e[2].weight).T for e in ref.experts]),
        "experts_b2": np.stack([t2n(e[2].bias) for e in ref.experts]),
    }
    if hasattr(ref, "gate") and isinstance(ref.gate, torch.nn.Linear):
        p["gate_kernel"] = t2n(ref.gate.weight).T
    return p


def merge_params(init_params, new):
    params = dict(init_params["params"])
    for k, v in new.items():
        assert k in params, f"param {k} missing from JAX layer ({list(params)})"
        assert params[k].shape == v.shape, \
            f"{k}: {params[k].shape} vs {v.shape}"
        params[k] = jnp.asarray(v)
    return {"params": params}


def run_mm_pair(ref, jax_layer, x, step=None, **apply_kw):
    """Run reference (requires_grad=True → loss branch) and JAX layer on
    the same input/weights."""
    xt = torch.tensor(x, requires_grad=True)
    out_t, aux_t, _, infor = ref(xt)
    init = jax_layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = merge_params(init, copy_mm_weights(ref))
    out_j, aux_j = jax_layer.apply(params, jnp.asarray(x), train=True,
                                   step=step, return_id_experts=True,
                                   **apply_kw)
    return (t2n(out_t), float(aux_t), infor), (np.asarray(out_j), aux_j), params


def check_close(a, b, rtol=RTOL, atol=ATOL):
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# multimodal tree: full forward parity
# ---------------------------------------------------------------------------

def test_mm_smoe_forward_parity():
    ref = mm_cls("smoe")(in_embed_dim=24, out_embed_dim=24,
                         num_of_experts=4, num_selected=2, args=mm_args())
    x = np.random.default_rng(0).standard_normal((2, 6, 24)).astype(np.float32)
    (out_t, aux_t, infor), (out_j, aux_j), _ = run_mm_pair(
        ref, jl.SMoELayer(in_dim=24, out_dim=24, n_experts=4, n_selected=2,
                          args=moe_args()), x)
    # routing decisions: exact match against the reference's own topk
    np.testing.assert_array_equal(
        np.asarray(aux_j.selected_experts),
        t2n(ref.log_metrics["selected_experts"]))
    check_close(out_j, out_t)
    check_close(float(aux_j.aux_loss), aux_t)
    check_close(float(aux_j.losses["balance_loss"]),
                float(infor["balance_loss"]))
    check_close(float(aux_j.losses["router_z_loss"]),
                float(infor["router_z_loss"]))


def test_mm_sigmoidgating_forward_parity():
    ref = mm_cls("smoe_sigmoidgating")(
        in_embed_dim=24, out_embed_dim=24, num_of_experts=4, num_selected=2,
        args=mm_args())
    x = np.random.default_rng(1).standard_normal((2, 6, 24)).astype(np.float32)
    (out_t, aux_t, infor), (out_j, aux_j), _ = run_mm_pair(
        ref, jl.SMoESigmoidGating(in_dim=24, out_dim=24, n_experts=4,
                                  n_selected=2, args=moe_args()), x)
    check_close(out_j, out_t)
    check_close(float(aux_j.aux_loss), aux_t)


def _xmoe_like_params(ref):
    p = copy_mm_weights(ref)
    p["inp_reduction"] = t2n(ref.inp_reduction.weight).T
    p["expert_embeddings"] = t2n(ref.expert_embeddings)
    del p["gate_kernel"]  # the ref's nn.Linear gate is unused in forward
    return p


@pytest.mark.parametrize("name,cls", [
    ("xmoe", jl.XMoELayer), ("smoe_perturbed", jl.PerturbedCosineGating)])
def test_mm_cosine_gate_forward_parity(name, cls):
    ref = mm_cls(name)(in_embed_dim=24, out_embed_dim=24, num_of_experts=4,
                       num_selected=2, args=mm_args())
    x = np.random.default_rng(2).standard_normal((2, 6, 24)).astype(np.float32)
    # copy BEFORE forward: the reference renorms expert_embeddings in-place
    new = _xmoe_like_params(ref)
    xt = torch.tensor(x, requires_grad=True)
    out_t, aux_t, _, infor = ref(xt)
    layer = cls(in_dim=24, out_dim=24, n_experts=4, n_selected=2,
                args=moe_args())
    init = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = merge_params(init, new)
    out_j, aux_j = layer.apply(params, jnp.asarray(x), train=True)
    check_close(out_j, t2n(out_t))
    check_close(float(aux_j.aux_loss), float(aux_t))
    check_close(float(aux_j.losses["balance_loss"]),
                float(infor["balance_loss"]))


@pytest.mark.parametrize("name,cls", [
    ("shard_smoe", jl.SharedExpertV2), ("deepseekv3", jl.SharedExpertV3)])
def test_mm_shared_expert_forward_parity(name, cls):
    ref = mm_cls(name)(in_embed_dim=24, out_embed_dim=24, num_of_experts=4,
                       num_selected=2, args=mm_args())
    x = np.random.default_rng(3).standard_normal((2, 6, 24)).astype(np.float32)
    (out_t, aux_t, infor), (out_j, aux_j), _ = run_mm_pair(
        ref, cls(in_dim=24, out_dim=24, n_experts=4, n_selected=2,
                 args=moe_args()), x)
    check_close(out_j, out_t)
    check_close(float(aux_j.aux_loss), aux_t)


def _mm_compete_pair(flips_value, args_over=None, jargs_over=None, step=3):
    aover = args_over or {}
    jover = jargs_over or {}
    ref = mm_cls("competesmoe")(
        in_embed_dim=24, out_embed_dim=24, num_of_experts=4, num_selected=2,
        args=mm_args(**aover))
    ref.step_warm = 0
    ref.total_steps = 10
    ref.prob_flips = torch.full((10,), bool(flips_value), dtype=torch.bool)
    ref.current_steps = step
    sched = np.full(10, bool(flips_value))
    layer = jl.CompeteSMoELayer(in_dim=24, out_dim=24, n_experts=4,
                                n_selected=2, args=moe_args(**jover),
                                flip_schedule=sched, step_warm=0)
    return ref, layer


def test_mm_competesmoe_router_branch_parity():
    ref, layer = _mm_compete_pair(flips_value=False)
    x = np.random.default_rng(4).standard_normal((2, 6, 24)).astype(np.float32)
    (out_t, aux_t, infor), (out_j, aux_j), _ = run_mm_pair(
        ref, layer, x, step=jnp.int32(3))
    check_close(out_j, out_t)
    check_close(float(aux_j.aux_loss), aux_t)
    check_close(float(aux_j.losses["balance_loss"]),
                float(infor["balance_loss"]))


@pytest.mark.parametrize("hybrid", [False, True])
def test_mm_competesmoe_competition_branch_parity(hybrid):
    ref, layer = _mm_compete_pair(
        flips_value=True, args_over={"hybrid": hybrid},
        jargs_over={"hybrid": hybrid, "router_theta": 0.1})
    x = np.random.default_rng(5).standard_normal((2, 6, 24)).astype(np.float32)
    (out_t, aux_t, infor), (out_j, aux_j), _ = run_mm_pair(
        ref, layer, x, step=jnp.int32(3))
    check_close(out_j, out_t)
    check_close(float(aux_j.aux_loss), aux_t)
    for key in ("routerloss", "diversity_loss", "balance_loss"):
        check_close(float(aux_j.losses[key]), float(infor[key]),
                    rtol=1e-4, atol=1e-7)
    assert float(infor["routerloss"]) > 0.0  # competition really fired


# ---------------------------------------------------------------------------
# flip schedule vs the reference generator (create_balanced_flip_current)
# ---------------------------------------------------------------------------

def test_flip_schedule_matches_reference_generator():
    """Replay identical Bernoulli draws through the reference's
    set_total_steps (rank 0 path) and our build_flip_schedule: the chained
    shift-left/right rebalancing must produce identical schedules.
    rate_flip=0.5 with cap 1 forces heavy shifting, so the rebalancing
    logic (not just the draws) is exercised."""
    n_layers, total, warm, rate, cap, seed = 3, 200, 0.05, 0.5, 1, 7
    ours = build_flip_schedule(n_layers, total, warm, rate, cap, seed=seed)

    ref = mm_cls("competesmoe")(
        in_embed_dim=8, out_embed_dim=8, num_of_experts=4, num_selected=2,
        args=mm_args(rate_flip=rate, warm_up=warm, max_compete_in_iter=cap))
    flip_steps = total - int(warm * total)
    draws = iter(np.random.default_rng(seed).random(flip_steps * n_layers))

    def fake_rand(*a, **k):
        return torch.tensor([next(draws)])

    prob_flips_final = {}
    with mock.patch("torch.rand", fake_rand):
        for lid in range(n_layers):
            ref.set_total_steps(total, lid, prob_flips_final)
    assert ref.step_warm == ours.step_warm
    for lid in range(n_layers):
        np.testing.assert_array_equal(
            t2n(prob_flips_final[lid]).astype(bool), ours.flips[lid],
            err_msg=f"layer {lid} schedule diverges from the reference")
    # the cap must have forced at least one shift for this config
    per_step = ours.flips.sum(0)
    assert per_step.max() <= cap
    assert ours.flips.sum() > 0


# ---------------------------------------------------------------------------
# pretrain tree: full forward parity (dense stand-in for the Triton GEMM)
# ---------------------------------------------------------------------------

def pt_args(**over):
    d = dict(warm_up=0.0, rate_flip=0.3, stop_after=10, max_compete_in_iter=2,
             is_cosine=False, hybrid=False, tribrid=False, in_topk=False,
             is_norm_weight=False, norm_sigmoid=False,
             balance_loss_coef=0.01, balance_loss_coef_comp=0.01,
             router_loss_coef=0.01, router_theta=0.1,
             balance_affinity=False, test_only=False, scale_weight=1.0)
    d.update(over)
    return SimpleNamespace(**d)


def _dense_compute_moe_main(self, x, selected_experts, weights):
    """Mathematically-equal dense replacement for the Triton CVMM pipeline
    (cvmm_prepare_sel2 → grouped GEMM → weighted combine) so the reference
    forward runs on CPU. Routing/losses still use unmodified reference code."""
    h = torch.einsum("bnd,edh->bneh", x, self.keys)
    h = self.activation(h)
    out = torch.einsum("bneh,ehv->bnev", h, self.values)
    idx = selected_experts[..., None].expand(
        *selected_experts.shape, out.shape[-1])
    tk = torch.gather(out, 2, idx)
    return (tk * weights[..., None].to(tk.dtype)).sum(2)


def make_pt_ref(args, d=32, e=8, es=16, k=4):
    rl.pt_moe("competesmoe")  # load so the @register_moe decorator runs
    cls = rl.pt_moe("register").MOE_REGISTRY["competesmoe"]
    ref = cls(dmodel=d, n_experts=e, expert_size=es, n_heads=k,
              std_gate=d ** -0.5, std_expert=d ** -0.5, args=args)
    ref.compute_moe_main = types.MethodType(_dense_compute_moe_main, ref)
    ref.train()
    ref.regularization_present = True
    return ref


def copy_pt_weights(ref):
    return {"w_gate": t2n(ref.w_gate), "keys": t2n(ref.keys),
            "values": t2n(ref.values)}


def run_pt_pair(aover, jover, flips_value, d=32, e=8, es=16, k=4, step=3):
    jover = {"router_theta": 0.1, **jover}  # align with pt_args default
    ref = make_pt_ref(pt_args(**aover), d, e, es, k)
    ref.step_warm = 0
    ref.current_steps = step
    ref.prob_flips_final = {0: torch.full((10,), bool(flips_value),
                                          dtype=torch.bool)}
    x = np.random.default_rng(11).standard_normal((2, 6, d)).astype(np.float32)
    xt = torch.tensor(x, requires_grad=True)
    out_t = ref(xt, id_layer=0)
    regs = {name: float(v) for name, v in ref.get_reg_loss().items()}

    sched = np.full(10, bool(flips_value))
    layer = jpl.PretrainCompeteSMoE(
        dmodel=d, n_experts=e, expert_size=es, n_heads=k,
        args=moe_args(**jover), flip_schedule=sched, step_warm=0)
    init = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = merge_params(init, copy_pt_weights(ref))
    out_j, aux_j = layer.apply(params, jnp.asarray(x), train=True,
                               step=jnp.int32(step))
    return t2n(out_t), regs, np.asarray(out_j), aux_j


def test_pt_competesmoe_router_branch_parity():
    out_t, regs, out_j, aux_j = run_pt_pair({}, {}, flips_value=False)
    check_close(out_j, out_t)
    check_close(float(aux_j.losses["mlp_ebalance"]), regs["mlp_ebalance"],
                rtol=1e-4, atol=1e-8)
    check_close(float(aux_j.aux_loss), regs["mlp_ebalance"],
                rtol=1e-4, atol=1e-8)


@pytest.mark.parametrize("variant", [
    {}, {"hybrid": True}, {"tribrid": True}, {"in_topk": True},
    {"balance_affinity": True}])
def test_pt_competesmoe_competition_branch_parity(variant):
    out_t, regs, out_j, aux_j = run_pt_pair(variant, variant,
                                            flips_value=True)
    check_close(out_j, out_t)
    check_close(float(aux_j.losses["mlp_router_loss"]),
                regs["mlp_router_loss"], rtol=1e-4, atol=1e-8)
    check_close(float(aux_j.losses["mlp_comp_diver_loss"]),
                regs["mlp_comp_diver_loss"], rtol=1e-4, atol=1e-8)
    if variant.get("balance_affinity"):
        check_close(float(aux_j.losses["mlp_comp_ebalance"]),
                    regs["mlp_comp_ebalance"], rtol=1e-4, atol=1e-8)
    check_close(float(aux_j.aux_loss), sum(regs.values()),
                rtol=1e-4, atol=1e-8)
    assert regs["mlp_router_loss"] > 0.0


@pytest.mark.parametrize("gate_variant", [
    {"is_cosine": True}, {"is_norm_weight": True},
    {"norm_sigmoid": True, "scale_weight": 2.0}])
def test_pt_competesmoe_gate_variants_parity(gate_variant):
    out_t, regs, out_j, aux_j = run_pt_pair(gate_variant, gate_variant,
                                            flips_value=False)
    check_close(out_j, out_t)


def test_pt_competition_policy_routing_exact():
    """Selected experts of the competition policy: exact index equality
    against competition_policy_mlp_faster."""
    ref = make_pt_ref(pt_args())
    x = np.random.default_rng(13).standard_normal((2, 6, 32)).astype(np.float32)
    w, sel_t, aff_sm, aff, tk = ref.competition_policy_mlp_faster(
        torch.tensor(x))
    from competesmoe_tpu.ops import expert_compute as ec
    aff_j, tk_j, sel_j = ec.competition_all_experts_kv(
        jnp.asarray(x).reshape(-1, 32), jnp.asarray(t2n(ref.keys)),
        jnp.asarray(t2n(ref.values)), jax.nn.relu, 4)
    np.testing.assert_array_equal(
        np.asarray(sel_j).reshape(2, 6, 4), t2n(sel_t))
    check_close(np.asarray(aff_j).reshape(2, 6, 8), t2n(aff))
    check_close(np.asarray(tk_j).reshape(2, 6, 4, -1), t2n(tk))


# ---------------------------------------------------------------------------
# mixtral family: the reference keeps HF Mixtral's own block_sparse_moe and
# rewires only its forward (smoe_mixtral_helper.py:20-77, installed by
# llava_mixtral.py initialize_smoe_modules). Parity runs the reference's
# ACTUAL rewired forward on a real HF MixtralSparseMoeBlock.
# ---------------------------------------------------------------------------

def test_mixtral_moe_block_parity_vs_reference_helper():
    from transformers import MixtralConfig
    from transformers.models.mixtral.modeling_mixtral import (
        MixtralSparseMoeBlock)

    from competesmoe_tpu.moe import get_moe

    torch.manual_seed(3)
    cfg = MixtralConfig(hidden_size=16, intermediate_size=32,
                        num_local_experts=4, num_experts_per_tok=2)
    block = MixtralSparseMoeBlock(cfg).eval()
    helper = rl.mm_lm("smoe_mixtral_helper")
    rewired = helper.MixtralDecoderLayerMOEBlock_forward(block)

    x = np.random.default_rng(7).standard_normal((2, 5, 16)).astype(
        np.float32)
    with torch.no_grad():
        out_t, (bal_t, z_t) = rewired(torch.tensor(x))

    layer = get_moe("mixtral")(in_dim=16, out_dim=16, n_experts=4,
                               n_selected=2, args=MoEArgs(),
                               expert_hidden_dim=32)
    params = {
        "gate_kernel": t2n(block.gate.weight).T,
        "experts_w1": np.stack([t2n(e.w1.weight).T for e in block.experts]),
        "experts_w3": np.stack([t2n(e.w3.weight).T for e in block.experts]),
        "experts_w2": np.stack([t2n(e.w2.weight).T for e in block.experts]),
    }
    init = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out_j, aux = layer.apply(merge_params(init, params), jnp.asarray(x),
                             train=True)
    check_close(np.asarray(out_j), t2n(out_t).reshape(2, 5, 16))
    check_close(float(aux.losses["balance_loss"]), float(bal_t))
    check_close(float(aux.losses["router_z_loss"]), float(z_t))
    # the wrapper scales by the coefficients when summing into the LM loss
    # (llava_mixtral.py:142-147)
    check_close(float(aux.aux_loss),
                0.01 * float(bal_t) + 0.001 * float(z_t), rtol=1e-5)
