"""The "pretrain tree" MoE routing zoo (MoEUT-style stacked keys/values
experts, ReLU activation) — JAX/linen re-design of
`moe_pretrain_model/layers/moe/` (ref file:line cited per class).

The reference runs these on a custom Triton grouped-GEMM (CVMM,
layers/cvmm.py); here expert compute goes through ops.expert_compute
(ragged grouped GEMM / dense all-experts / Pallas), and the RegularizedLayer
`add_reg` side-channel becomes an explicit `(output, MoEAux)` return.

Entropy-balance regularization operates on the batch the layer sees; under
`jit` over a device mesh that is the *global* batch, so the reference's
differentiable distributed log-mean (distributed_ops.py:28-57, enabled by
`moe.sync_distributed`) is subsumed by the compiler.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import expert_compute as ec
from ..ops import losses as L
from ..ops import routing as R
from .config import MoEArgs
from .layers import MoEAux, zero_aux
from .registry import register_pretrain_moe


def _flip_field():
    return dataclasses.field(default=None, compare=False, hash=False)


class MoEUTBase(nn.Module):
    """Base MoE with stacked expert tensors (ref layers/moe/moe.py:35-454).

    keys:   [E, d, expert_size]   init N(0, d^-0.5 * weight_scale)
    values: [E, expert_size, v]   init N(0, (E*expert_size)^-0.5 * weight_scale)
    w_gate: [E, d]                init N(0, d^-0.5 * weight_scale)
    top-k = n_heads ("pkm heads").
    """

    dmodel: int
    n_experts: int
    expert_size: int
    n_heads: int
    args: MoEArgs = MoEArgs()
    v_dim: Optional[int] = None
    weight_scale: float = 1.0
    bias: bool = False
    impl: str = "auto"

    @property
    def out_dim(self) -> int:
        return self.v_dim if self.v_dim is not None else self.dmodel

    @property
    def topk(self) -> int:
        return self.n_heads

    # div=1 for MLP-mode MoE; attention-mode (div=10) is dormant in the
    # reference snapshot (moe.py:111-116, full_moe_relative_attention relies
    # on commented-out att_forward).
    div: float = 1.0

    def _params(self):
        d, e, v = self.dmodel, self.expert_size, self.out_dim
        init = nn.initializers.normal
        w_gate = self.param("w_gate", init(d**-0.5 * self.weight_scale),
                            (self.n_experts, d))
        keys = self.param("keys", init(d**-0.5 * self.weight_scale),
                          (self.n_experts, d, e))
        values = self.param(
            "values", init((self.n_experts * e)**-0.5 * self.weight_scale),
            (self.n_experts, e, v))
        b1 = o_bias = None
        if self.bias:
            b1 = self.param("bias", nn.initializers.zeros, (self.n_experts, e))
            o_bias = self.param("o_bias", nn.initializers.zeros, (v,))
        return w_gate, keys, values, b1, o_bias

    @staticmethod
    def activation(x):
        return jax.nn.relu(x)

    def compute_gate(self, x, w_gate):
        return x @ w_gate.T.astype(x.dtype)

    def route(self, x, logits):
        """Default gating: f32 softmax -> top-k -> normalize
        (moe.py:373-393,418-424)."""
        weights, sel, gate_softmax = R.topk_softmax(logits, self.topk)
        weights = R.normalize_weights(weights, x.dtype)
        return weights, sel, gate_softmax

    def ffn(self, x3d, sel, weights, keys, values, b1=None, o_bias=None):
        b, n, d = x3d.shape
        out = ec.moe_ffn_kv(
            x3d.reshape(b * n, d), sel.reshape(b * n, -1),
            weights.reshape(b * n, -1).astype(x3d.dtype),
            keys, values, activation=self.activation, b1=b1, impl=self.impl)
        out = out.reshape(b, n, self.out_dim)
        if o_bias is not None:
            out = out + o_bias.astype(out.dtype)
        return out

    def ebalance_aux(self, logits, train: bool) -> MoEAux:
        """mlp_ebalance reg: entropy balance * coef / div (moe.py:443-445)."""
        if not train:
            return zero_aux(logits)
        bal = L.entropy_balance_loss(logits) * (
            self.args.balance_loss_coef / self.div)
        return MoEAux(aux_loss=bal,
                      losses={"mlp_ebalance": jax.lax.stop_gradient(bal)})

    @nn.compact
    def __call__(self, x, *, step=None, train: bool = False,
                 return_id_experts: bool = False) -> Tuple[jax.Array, MoEAux]:
        w_gate, keys, values, b1, o_bias = self._params()
        logits = self.compute_gate(x, w_gate)
        weights, sel, gate_softmax = self.route(x, logits)
        out = self.ffn(x, sel, weights, keys, values, b1, o_bias)
        aux = self.ebalance_aux(logits, train)
        if return_id_experts:
            aux = aux.replace(gate_softmax=jax.lax.stop_gradient(gate_softmax),
                              selected_experts=sel)
        return out, aux


@register_pretrain_moe("smoe")
class PretrainSMoE(MoEUTBase):
    """Vanilla softmax top-k on CVMM-style experts (ref smoe.py:38-264)."""


@register_pretrain_moe("smoe_sigmoid")
class PretrainSigmoidNorm(MoEUTBase):
    """MoEUT sigmoid selection: top-k over sigmoid(logits), normalized
    (ref smoeut_norm.py:36-150; reg name 'mlp_balance' there)."""

    def route(self, x, logits):
        weights, sel, _ = R.topk_sigmoid(logits, self.topk)
        weights = R.normalize_weights(weights, x.dtype)
        gate_sigmoid = jax.nn.sigmoid(logits)
        return weights, sel, gate_sigmoid


class _PretrainCosineBase(MoEUTBase):
    """Cosine gate over a reduced projection (ref xmoe.py:37-155)."""

    theta: float = 0.0
    temperature: float = 0.3

    def _cosine_logits(self, x):
        red = self.n_experts // 2
        expert_sel = self.param(
            "expert_sel", nn.initializers.normal(
                self.dmodel**-0.5 * self.weight_scale), (red, self.dmodel))
        if self.theta == 0.0:
            emb = self.param("expert_embeddings",
                             nn.initializers.orthogonal(scale=0.32),
                             (self.n_experts, red))
        else:
            emb = self.param("expert_embeddings",
                             nn.initializers.normal(0.02),
                             (self.n_experts, red))
        reduced = x @ expert_sel.T.astype(x.dtype)
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        emb_n = emb * jax.lax.stop_gradient(1.5 / (norm + self.theta))
        if self.theta > 0.0:
            xf = reduced.astype(jnp.float32)
            xn = xf / (jnp.linalg.norm(xf, axis=-1, keepdims=True) + self.theta)
            logits = (xn @ emb_n.astype(jnp.float32).T).astype(reduced.dtype)
        else:
            logits = R.cosine_logits(reduced, emb_n)
        return R.make_finite(logits)

    def compute_gate(self, x, w_gate):
        del w_gate  # cosine gate replaces the linear gate
        return self._cosine_logits(x)

    def route(self, x, logits):
        gate_softmax = R.softmax_f32(
            logits / self.temperature).astype(x.dtype)
        raw, sel = R.top_k(gate_softmax, self.topk)
        weights = jax.nn.softmax(raw.astype(jnp.float32),
                                 axis=-1).astype(x.dtype)
        return weights, sel, gate_softmax


@register_pretrain_moe("xmoe")
class PretrainXMoE(_PretrainCosineBase):
    """XMoE on CVMM-style experts (ref xmoe.py:37-226)."""


@register_pretrain_moe("smoe_perturbed")
class PretrainPerturbed(_PretrainCosineBase):
    """Perturbed cosine gating, theta=0.1 (ref smoe_perturbed.py:39-226)."""

    theta: float = 0.1


class _SharedExpertBase(MoEUTBase):
    """DeepSeek-style routed + always-on shared expert
    (ref deepseekv2.py:38-181, deepseekv3.py:39-190)."""

    n_shared_experts: int = 1
    routed_scaling_factor: float = 1.0

    def _shared_params(self):
        d, v = self.dmodel, self.out_dim
        es = self.expert_size * self.n_shared_experts
        keys_shared = self.param(
            "keys_shared", nn.initializers.normal(
                d**-0.5 * self.weight_scale), (1, d, es))
        values_shared = self.param(
            "values_shared", nn.initializers.normal(
                es**-0.5 * self.weight_scale), (1, es, v))
        return keys_shared, values_shared

    def _shared_out(self, x, keys_shared, values_shared):
        h = jnp.einsum("bnd,de->bne", x, keys_shared[0].astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        h = self.activation(h)
        out = jnp.einsum("bne,ev->bnv", h, values_shared[0].astype(x.dtype),
                         preferred_element_type=jnp.float32)
        return out.astype(x.dtype)

    @nn.compact
    def __call__(self, x, *, step=None, train: bool = False,
                 return_id_experts: bool = False):
        w_gate, keys, values, b1, o_bias = self._params()
        keys_shared, values_shared = self._shared_params()
        logits = self.compute_gate(x, w_gate)
        weights, sel, gate_softmax = self.route(x, logits)
        out = self.ffn(x, sel, weights, keys, values, b1, None)
        out = out + self._shared_out(x, keys_shared, values_shared)
        if o_bias is not None:
            out = out + o_bias.astype(out.dtype)
        aux = self.ebalance_aux(logits, train)
        if return_id_experts:
            aux = aux.replace(gate_softmax=jax.lax.stop_gradient(gate_softmax),
                              selected_experts=sel)
        return out, aux


@register_pretrain_moe("deepseekv2")
class PretrainDeepSeekV2(_SharedExpertBase):
    """Top-k over raw logits, softmax-over-top-k weights, + shared expert
    (ref deepseekv2.py:147-181)."""

    def route(self, x, logits):
        weights, sel, gate_softmax = R.topk_logits_softmax_weights(
            logits, self.topk)
        return weights.astype(x.dtype), sel, gate_softmax


@register_pretrain_moe("deepseekv3")
class PretrainDeepSeekV3(_SharedExpertBase):
    """Sigmoid scoring, normalize with +1e-20 denominator, scale by
    routed_scaling_factor, + shared expert (ref deepseekv3.py:142-190).

    `e_score_correction_bias` is declared for checkpoint parity with the
    reference (deepseekv3.py:108) but — exactly like the reference forward —
    not applied to the scores.
    """

    def route(self, x, logits):
        # Parity param (unused in the math, as in the reference).
        self.param("e_score_correction_bias", nn.initializers.zeros,
                   (self.n_experts,))
        weights, sel = R.top_k(jax.nn.sigmoid(logits), self.topk)
        denom = jnp.sum(weights, axis=-1, keepdims=True) + 1e-20
        weights = weights / denom * self.routed_scaling_factor
        gate_softmax = R.softmax_f32(logits)
        return weights, sel, gate_softmax


@register_pretrain_moe("competesmoe")
class PretrainCompeteSMoE(MoEUTBase):
    """CompeteSMoE on stacked keys/values experts
    (ref layers/moe/competesmoe.py:37-616).

    Competition steps compute all experts as two batched matmuls
    (competition_policy_mlp_faster, :381-414) under a `lax.cond` guarded by
    the precomputed flip schedule; the output combine reuses the dense
    expert outputs (mathematically identical to the reference's grouped
    recompute, one less pass over HBM).
    """

    flip_schedule: Optional[np.ndarray] = _flip_field()
    step_warm: int = 0

    def compute_gate(self, x, w_gate):
        """Optional cosine / norm-weight gate normalization
        (competesmoe.py:456-464)."""
        self.args.validate()
        if self.args.is_cosine:
            xn = x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
            wn = w_gate / jnp.maximum(
                jnp.linalg.norm(w_gate, axis=-1, keepdims=True), 1e-12)
            return xn @ wn.T.astype(x.dtype)
        if self.args.is_norm_weight:
            wn = w_gate / jnp.maximum(
                jnp.linalg.norm(w_gate, axis=-1, keepdims=True), 1e-12)
            return x @ wn.T.astype(x.dtype)
        return x @ w_gate.T.astype(x.dtype)

    def route(self, x, logits):
        """router_policy (competesmoe.py:465-490)."""
        if self.args.norm_sigmoid:
            gate_softmax = R.softmax_f32(logits)
            raw, sel = R.top_k(logits, self.topk)
            weights = jax.nn.sigmoid(raw / self.args.scale_weight)
        else:
            weights, sel, gate_softmax = R.topk_softmax(logits, self.topk)
        weights = R.normalize_weights(weights, x.dtype)
        return weights, sel, gate_softmax

    @nn.compact
    def __call__(self, x, *, step=None, train: bool = False,
                 return_id_experts: bool = False, flips=None):
        w_gate, keys, values, b1, o_bias = self._params()
        logits = self.compute_gate(x, w_gate)
        gate_weights, gate_sel, gate_softmax = self.route(x, logits)

        def router_branch(x):
            out = self.ffn(x, gate_sel, gate_weights, keys, values, b1, o_bias)
            if train:
                bal = L.entropy_balance_loss(logits) * (
                    self.args.balance_loss_coef / self.div)
            else:
                bal = jnp.zeros((), jnp.float32)
            losses = {
                "mlp_ebalance": jax.lax.stop_gradient(bal),
                "mlp_router_loss": jnp.zeros((), jnp.float32),
                "mlp_comp_diver_loss": jnp.zeros((), jnp.float32),
                "mlp_comp_ebalance": jnp.zeros((), jnp.float32),
                "mlp_router_agreement": jnp.zeros((), jnp.float32),
                "mlp_is_comp": jnp.zeros((), jnp.float32),
            }
            return out, MoEAux(aux_loss=bal, losses=losses,
                               gate_softmax=jax.lax.stop_gradient(gate_softmax),
                               selected_experts=gate_sel)

        def competition_branch(x):
            b, n, d = x.shape
            k = self.topk
            affinity, topk_outputs, sel = ec.competition_all_experts_kv(
                x.reshape(b * n, d), keys, values, self.activation, k,
                b1=b1, impl=self.impl)
            affinity = affinity.reshape(b, n, self.n_experts)
            topk_outputs = topk_outputs.reshape(b, n, k, self.out_dim)
            sel = sel.reshape(b, n, k)
            affinity_softmax = R.softmax_f32(affinity)
            aw = jnp.take_along_axis(affinity, sel, axis=-1)
            aw = R.normalize_weights(aw, x.dtype)
            out = jnp.sum(topk_outputs
                          * aw[..., None].astype(topk_outputs.dtype), axis=-2)
            if o_bias is not None:
                out = out + o_bias.astype(out.dtype)

            div_loss = L.diversity_loss(topk_outputs)
            aff_sg = jax.lax.stop_gradient(affinity_softmax)
            # Router-distillation variants (competesmoe.py:546-593).
            if self.args.in_topk:
                gtk = jnp.take_along_axis(gate_softmax, sel, axis=-1)
                atk = jnp.take_along_axis(aff_sg, sel, axis=-1)
                router_loss = L.router_mse_loss(gtk, atk)
            elif self.args.hybrid or self.args.tribrid:
                gtk = jnp.take_along_axis(gate_softmax, sel, axis=-1)
                atk = jnp.take_along_axis(aff_sg, sel, axis=-1)
                router_loss = (L.router_mse_loss(gate_softmax, aff_sg)
                               + L.router_mse_loss(gtk, atk)
                               * self.args.router_theta)
                if self.args.tribrid:
                    gtg = jnp.take_along_axis(gate_softmax, gate_sel, axis=-1)
                    atg = jnp.take_along_axis(aff_sg, gate_sel, axis=-1)
                    router_loss = router_loss + (
                        L.router_mse_loss(gtg, atg) * self.args.router_theta)
            else:
                router_loss = L.router_mse_loss(gate_softmax, aff_sg)

            total = (router_loss * self.args.router_loss_coef
                     + div_loss * self.args.balance_loss_coef_comp / 2)
            comp_ebal = jnp.zeros((), jnp.float32)
            if self.args.balance_affinity:
                # Reference passes the softmaxed affinity through
                # entropy_balance (which log-softmaxes again) — replicated.
                comp_ebal = L.entropy_balance_loss(affinity_softmax) * (
                    self.args.balance_loss_coef_comp / 2)
                total = total + comp_ebal
            losses = {
                "mlp_ebalance": jnp.zeros((), jnp.float32),
                "mlp_router_loss": jax.lax.stop_gradient(
                    router_loss * self.args.router_loss_coef),
                "mlp_comp_diver_loss": jax.lax.stop_gradient(
                    div_loss * self.args.balance_loss_coef_comp / 2),
                "mlp_comp_ebalance": jax.lax.stop_gradient(comp_ebal),
                # distillation health: does the router's top-k match the
                # competition outcome on this flip step? (summed with
                # mlp_is_comp downstream: agreement_sum / is_comp_sum
                # conditions the mean on layers that actually flipped)
                "mlp_router_agreement": jax.lax.stop_gradient(
                    L.topk_agreement(gate_sel, sel)),
                "mlp_is_comp": jnp.ones((), jnp.float32),
            }
            return out, MoEAux(aux_loss=total, losses=losses,
                               gate_softmax=aff_sg, selected_experts=sel)

        schedule = flips if flips is not None else self.flip_schedule
        use_schedule = train and step is not None and schedule is not None
        if not use_schedule:
            return router_branch(x)

        # schedule may arrive as a tracer (a remat'd block passes
        # flips as a checkpointed arg) — only host arrays go
        # through numpy
        sched = (schedule.astype(bool)
                 if isinstance(schedule, jax.Array)
                 else jnp.asarray(np.asarray(schedule, dtype=bool)))
        step_a = jnp.asarray(step, jnp.int32)
        rel = step_a - self.step_warm
        idx = jnp.clip(rel, 0, sched.shape[0] - 1)
        # No competition during warm-up or past the schedule's end.
        is_comp = (rel >= 0) & (rel < sched.shape[0]) & sched[idx]
        # Rematerialize the competition branch: its all-expert outputs
        # ([T, E, v] per layer) would otherwise be saved as backward
        # residuals and dominate HBM (E/k times the sparse activations).
        comp = jax.checkpoint(competition_branch)
        return jax.lax.cond(is_comp, comp, router_branch, x)
