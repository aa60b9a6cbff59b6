"""The "multimodal tree" MoE routing zoo (2-layer Linear/GELU/Linear experts).

JAX/linen re-design of `moe_model/model/moe/` (ref file:line cited per
class). Experts are *stacked tensors* (`w1[E,d,h]`, …) instead of
nn.ModuleList so expert compute is batched MXU GEMMs; dispatch is either
dense-all-experts + gather (default for E<=2k) or sorted grouped GEMM
(ops.expert_compute). Layers are pure: they return `(output, MoEAux)`
instead of mutating mixin state, and train/eval divergence is an explicit
`train` flag instead of `x.requires_grad` introspection.

The CompeteSMoE competition step is a `lax.cond` on the precomputed flip
schedule, so jitted step time only pays for the branch actually taken.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import expert_compute as ec
from ..ops import losses as L
from ..ops import routing as R
from .config import MoEArgs
from .registry import register_moe


def gelu_exact(x):
    """torch.nn.GELU() default is the exact erf form (not tanh approx)."""
    return jax.nn.gelu(x, approximate=False)


def torch_linear_init(fan_in: int):
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) on weights
    and uniform(+-1/sqrt(fan_in)) on bias — both reduce to U(+-1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


@flax.struct.dataclass
class MoEAux:
    """Auxiliary outputs of a MoE layer.

    aux_loss: coefficient-scaled scalar to be added to the task loss (the
      reference's `auxiliary_loss` return, e.g. smoe.py:52).
    losses: named *detached* scalar components (the reference's `infor_aux`).
    gate_softmax: [.., N, E] routing distribution (f32) for telemetry /
      `return_id_experts` (llava.py:497-537 scrapes this).
    selected_experts: [.., N, k] chosen expert ids.
    """

    aux_loss: jax.Array
    losses: Dict[str, jax.Array]
    gate_softmax: Optional[jax.Array] = None
    selected_experts: Optional[jax.Array] = None


def zero_aux(x: jax.Array) -> MoEAux:
    z = jnp.zeros((), dtype=jnp.float32)
    return MoEAux(aux_loss=z, losses={})


class MoeLayerBase(nn.Module):
    """Shared parameters/helpers for the zoo (ref moe.py:8-245).

    Experts: w1[E, in, out] + b1[E, out] -> GELU -> w2[E, out, out] + b2[E, out]
    Gate: in -> E linear, no bias, init N(0, 0.02) (moe.py:50-70).
    """

    in_dim: int
    out_dim: int
    n_experts: int = 4
    n_selected: int = 2
    args: MoEArgs = MoEArgs()
    impl: str = "auto"
    gate_bias: bool = False
    # Expert MLP shape/activation. Defaults give the reference's built-in
    # expert Sequential(Linear(in,out), GELU, Linear(out,out)) (moe.py:34-38);
    # sparse upcycling passes the dense block's geometry instead (e.g.
    # SiglipMLP: hidden=intermediate_size, act=gelu_pytorch_tanh,
    # siglip_smoe.py:86-97).
    expert_hidden_dim: Optional[int] = None
    expert_act: str = "gelu"

    def _gate_param(self):
        kernel = self.param(
            "gate_kernel", nn.initializers.normal(self.args.gate_init_std),
            (self.in_dim, self.n_experts))
        bias = None
        if self.gate_bias:
            bias = self.param("gate_bias", nn.initializers.zeros,
                              (self.n_experts,))
        return kernel, bias

    @property
    def hidden_dim(self) -> int:
        return self.expert_hidden_dim or self.out_dim

    def _act(self):
        if self.expert_act == "gelu":
            return gelu_exact
        if self.expert_act == "gelu_tanh":
            return lambda x: jax.nn.gelu(x, approximate=True)
        if self.expert_act == "quick_gelu":
            # CLIP tower upcycling: experts must reproduce the dense
            # CLIPMLP activation exactly (x * sigmoid(1.702 x))
            return lambda x: x * jax.nn.sigmoid(1.702 * x)
        raise ValueError(f"unknown expert_act {self.expert_act!r}")

    def _expert_params(self, n_experts: Optional[int] = None):
        e = n_experts if n_experts is not None else self.n_experts
        h = self.hidden_dim
        w1 = self.param("experts_w1", torch_linear_init(self.in_dim),
                        (e, self.in_dim, h))
        b1 = self.param("experts_b1", torch_linear_init(self.in_dim),
                        (e, h))
        w2 = self.param("experts_w2", torch_linear_init(h),
                        (e, h, self.out_dim))
        b2 = self.param("experts_b2", torch_linear_init(h),
                        (e, self.out_dim))
        return w1, b1, w2, b2

    # -- functional pieces shared by subclasses --

    def gate_logits(self, x, kernel, bias=None):
        logits = x @ kernel.astype(x.dtype)
        if bias is not None:
            logits = logits + bias.astype(x.dtype)
        return logits

    def ffn(self, x3d, sel, weights, params):
        """Dispatch+combine over the selected experts. x3d: [B, N, D]."""
        w1, b1, w2, b2 = params
        b, n, d = x3d.shape
        out = ec.moe_ffn_mlp2(
            x3d.reshape(b * n, d), sel.reshape(b * n, -1),
            weights.reshape(b * n, -1).astype(x3d.dtype),
            w1, b1, w2, b2, activation=self._act(), impl=self.impl)
        return out.reshape(b, n, self.out_dim)

    def combine_loss(self, sel, gate_softmax, gate_logits,
                     active_zloss: bool = True):
        """balance*coef (+ z*coef). ref moe.py:214-226"""
        balance = L.switch_balance_loss(gate_softmax, sel, self.n_experts)
        zl = jnp.zeros((), jnp.float32)
        if active_zloss:
            zl = L.z_loss(gate_logits)
        aux = (balance * self.args.balance_loss_coef
               + zl * self.args.router_z_loss_coef)
        return aux, balance, zl


@register_moe("smoe")
class SMoELayer(MoeLayerBase):
    """Vanilla top-k softmax gating (ref smoe.py:11-64)."""

    @nn.compact
    def __call__(self, x, *, step=None, train: bool = False,
                 return_id_experts: bool = False) -> Tuple[jax.Array, MoEAux]:
        kernel, _ = self._gate_param()
        params = self._expert_params()
        logits = self.gate_logits(x, kernel)
        weights, sel, gate_softmax = R.topk_softmax(logits, self.n_selected)
        weights = R.normalize_weights(weights, x.dtype)
        out = self.ffn(x, sel, weights, params)
        aux = zero_aux(x)
        if train or return_id_experts:
            total, balance, zl = self.combine_loss(sel, gate_softmax, logits)
            aux = MoEAux(
                aux_loss=total,
                losses={"balance_loss": jax.lax.stop_gradient(balance),
                        "router_z_loss": jax.lax.stop_gradient(zl)},
                gate_softmax=jax.lax.stop_gradient(gate_softmax),
                selected_experts=sel)
        return out, aux


@register_moe("smoe_sigmoidgating")
class SMoESigmoidGating(MoeLayerBase):
    """Top-k over sigmoid(logits); softmax kept for the aux losses
    (ref smoe_sigmoidgating.py:8-58)."""

    @nn.compact
    def __call__(self, x, *, step=None, train: bool = False,
                 return_id_experts: bool = False):
        kernel, _ = self._gate_param()
        params = self._expert_params()
        logits = self.gate_logits(x, kernel)
        weights, sel, gate_softmax = R.topk_sigmoid(logits, self.n_selected)
        weights = R.normalize_weights(weights, x.dtype)
        out = self.ffn(x, sel, weights, params)
        aux = zero_aux(x)
        if train or return_id_experts:
            total, balance, zl = self.combine_loss(sel, gate_softmax, logits)
            aux = MoEAux(
                aux_loss=total,
                losses={"balance_loss": jax.lax.stop_gradient(balance),
                        "router_z_loss": jax.lax.stop_gradient(zl)},
                gate_softmax=jax.lax.stop_gradient(gate_softmax),
                selected_experts=sel)
        return out, aux


class _CosineGateBase(MoeLayerBase):
    """Shared XMoE-style cosine gate: low-dim input projection + learned
    expert embeddings renormed to 1.5 (ref xmoe.py:11-105)."""

    theta: float = 0.0  # 0 -> xmoe; >0 -> perturbed denominator offset

    def _cosine_gate(self, x):
        red_dim = self.n_experts // 2
        inp_reduction = self.param(
            "inp_reduction", torch_linear_init(self.in_dim),
            (self.in_dim, red_dim))
        emb = self.param("expert_embeddings",
                         nn.initializers.normal(self.args.gate_init_std),
                         (self.n_experts, red_dim))
        reduced = x @ inp_reduction.astype(x.dtype)
        # Functional form of the reference's in-place renorm
        # (`emb.mul_(1.5 / (norm [+ theta]))`, xmoe.py:146-151): scale is a
        # stop-gradient so the forward value and the routing decisions match;
        # after one step the torch param has norm 1.5, making grads match too.
        norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
        emb_n = emb * jax.lax.stop_gradient(1.5 / (norm + self.theta))
        if self.theta > 0.0:
            # Perturbed cosine: the *input* norm is offset by theta instead of
            # clamped by eps (ref smoe_perturbed.py:89-103).
            xf = reduced.astype(jnp.float32)
            xn = xf / (jnp.linalg.norm(xf, axis=-1, keepdims=True) + self.theta)
            logits = (xn @ emb_n.astype(jnp.float32).T).astype(reduced.dtype)
        else:
            logits = R.cosine_logits(reduced, emb_n)
        return R.make_finite(logits)

    def _cosine_route(self, x):
        logits = self._cosine_gate(x)
        t = self.args.xmoe_temperature
        gate_softmax = R.softmax_f32(logits / t).astype(x.dtype)
        raw, sel = R.top_k(gate_softmax, self.n_selected)
        weights = jax.nn.softmax(raw, axis=-1)
        return logits, gate_softmax, weights, sel


@register_moe("xmoe")
class XMoELayer(_CosineGateBase):
    """XMoE: cosine-similarity routing in a reduced space, temperature 0.3,
    softmax-over-top-k weights (ref xmoe.py:11-105)."""

    @nn.compact
    def __call__(self, x, *, step=None, train: bool = False,
                 return_id_experts: bool = False):
        params = self._expert_params()
        logits, gate_softmax, weights, sel = self._cosine_route(x)
        out = self.ffn(x, sel, weights, params)
        aux = zero_aux(x)
        if train or return_id_experts:
            total, balance, zl = self.combine_loss(sel, gate_softmax, logits)
            aux = MoEAux(
                aux_loss=total,
                losses={"balance_loss": jax.lax.stop_gradient(balance),
                        "router_z_loss": jax.lax.stop_gradient(zl)},
                gate_softmax=jax.lax.stop_gradient(
                    gate_softmax.astype(jnp.float32)),
                selected_experts=sel)
        return out, aux


@register_moe("smoe_perturbed")
class PerturbedCosineGating(XMoELayer):
    """Perturbed cosine gating: theta=0.1 offset in both the input-norm and
    embedding-renorm denominators (ref smoe_perturbed.py:10-145)."""

    theta: float = 0.1


@register_moe("smoe_share")
class SharedExpertV2(MoeLayerBase):
    """SharedE-V2 (DeepSeek-inspired): expert E-1 is always-on; route
    top-(k-1) among the first E-1; combine 0.5*shared + 0.5*routed to
    preserve the sparse-upcycling output range (ref shard_smoe.py:12-67)."""

    @nn.compact
    def __call__(self, x, *, step=None, train: bool = False,
                 return_id_experts: bool = False):
        n_routed = self.n_experts - 1
        k_routed = self.n_selected - 1
        kernel = self.param(
            "gate_kernel", nn.initializers.normal(self.args.gate_init_std),
            (self.in_dim, n_routed))
        w1, b1, w2, b2 = self._expert_params()
        logits = self.gate_logits(x, kernel)
        weights, sel, gate_softmax = R.topk_softmax(logits, k_routed)
        weights = R.normalize_weights(weights, x.dtype)
        routed = self.ffn(x, sel, weights, (w1[:n_routed], b1[:n_routed],
                                            w2[:n_routed], b2[:n_routed]))
        b, n, d = x.shape
        shared = ec.dense_all_experts_mlp2(
            x.reshape(b * n, d), w1[n_routed:], b1[n_routed:],
            w2[n_routed:], b2[n_routed:], activation=self._act())
        shared = shared.reshape(b, n, self.out_dim)
        out = self._combine(shared, routed)
        aux = zero_aux(x)
        if train or return_id_experts:
            total, balance, zl = self._shared_loss(sel, gate_softmax, logits,
                                                   n_routed)
            aux = MoEAux(
                aux_loss=total,
                losses={"balance_loss": jax.lax.stop_gradient(balance),
                        "router_z_loss": jax.lax.stop_gradient(zl)},
                gate_softmax=jax.lax.stop_gradient(gate_softmax),
                selected_experts=sel)
        return out, aux

    def _combine(self, shared, routed):
        return 0.5 * shared + 0.5 * routed

    def _shared_loss(self, sel, gate_softmax, logits, n_routed):
        balance = L.switch_balance_loss(gate_softmax, sel, n_routed)
        zl = L.z_loss(logits)
        total = (balance * self.args.balance_loss_coef
                 + zl * self.args.router_z_loss_coef)
        return total, balance, zl


@register_moe("deepseekv3")
class SharedExpertV3(SharedExpertV2):
    """SharedE-V3: additive shared+routed combine, no 0.5 scaling; aux loss
    computed unconditionally in the reference (ref deepseekv3.py:12-56)."""

    def _combine(self, shared, routed):
        return shared + routed


@register_moe("mixtral")
class MixtralMoELayer(MoeLayerBase):
    """HF Mixtral's own sparse MoE block, with the reference's rewired
    forward.

    The reference's mixtral family does NOT replace Mixtral's experts: it
    keeps the checkpoint's gate and SwiGLU experts (w1 gate / w3 up / w2
    down, no biases) and swaps only the block's `forward` to add a router
    z-loss and a Switch-style top-1 density balance loss
    (moe_model/model/language_model/smoe_mixtral_helper.py:20-77,
    installed by llava_mixtral.py's `initialize_smoe_modules`). This
    layer mirrors that exactly: the parameter layout IS
    `block_sparse_moe` (so a real Mixtral checkpoint loads verbatim via
    hf_loader.convert_decoder), routing is top-k of the f32 softmax with
    post-top-k renormalization, and dispatch is the sorted grouped GEMM
    (ops.expert_compute.grouped_ffn_swiglu) instead of the loop +
    index_add.
    """

    @nn.compact
    def __call__(self, x, *, step=None, train: bool = False,
                 return_id_experts: bool = False) -> Tuple[jax.Array, MoEAux]:
        e, d, h = self.n_experts, self.in_dim, self.hidden_dim
        kernel, _ = self._gate_param()
        w1 = self.param("experts_w1", torch_linear_init(d), (e, d, h))
        w3 = self.param("experts_w3", torch_linear_init(d), (e, d, h))
        w2 = self.param("experts_w2", torch_linear_init(h),
                        (e, h, self.out_dim))
        logits = self.gate_logits(x, kernel)
        weights, sel, gate_softmax = R.topk_softmax(logits, self.n_selected)
        weights = R.normalize_weights(weights, x.dtype)
        b, n, _ = x.shape
        out = ec.moe_ffn_swiglu(
            x.reshape(b * n, d), sel.reshape(b * n, -1),
            weights.reshape(b * n, -1).astype(x.dtype), w1, w3, w2,
            impl=self.impl)
        out = out.reshape(b, n, self.out_dim)
        aux = zero_aux(x)
        if train or return_id_experts:
            # the helper flattens [B, N] before the density means
            # (hidden_states.view(-1, d), smoe_mixtral_helper.py:23) —
            # unlike the mm tree, which keeps the batch dim
            balance = L.switch_balance_loss(
                gate_softmax.reshape(b * n, e), sel.reshape(b * n, -1), e)
            zl = L.z_loss(logits)
            aux = MoEAux(
                aux_loss=(balance * self.args.balance_loss_coef
                          + zl * self.args.router_z_loss_coef),
                losses={"balance_loss": jax.lax.stop_gradient(balance),
                        "router_z_loss": jax.lax.stop_gradient(zl)},
                gate_softmax=jax.lax.stop_gradient(gate_softmax),
                selected_experts=sel)
        return out, aux


def _flip_schedule_field():
    return dataclasses.field(default=None, compare=False, hash=False)


@register_moe("competesmoe")
class CompeteSMoELayer(MoeLayerBase):
    """CompeteSMoE: on scheduled "flip" steps run ALL experts, score each by
    its own response affinity mean(softplus(out)), route top-k of the
    affinity, and distill the affinity distribution into the router with an
    MSE loss; otherwise use the learned router.
    ref: moe_model/model/moe/competesmoe.py:8-415.

    `flip_schedule` is this layer's row of the precomputed boolean schedule
    (see moe.schedule.build_flip_schedule); `step_warm` the warm-up prefix.
    The is-competition check mirrors competesmoe.py:347:
      train and step >= step_warm and flips[step - step_warm].
    """

    flip_schedule: Optional[np.ndarray] = _flip_schedule_field()
    step_warm: int = 0

    @nn.compact
    def __call__(self, x, *, step=None, train: bool = False,
                 return_id_experts: bool = False, flips=None):
        kernel, _ = self._gate_param()
        params = self._expert_params()

        # Router policy is always computed (competesmoe.py:341).
        logits = self.gate_logits(x, kernel)
        gate_weights, gate_sel, gate_softmax = R.topk_softmax(
            logits, self.n_selected)
        gate_weights = R.normalize_weights(gate_weights, x.dtype)

        def router_branch(x):
            out = self.ffn(x, gate_sel, gate_weights, params)
            if train or return_id_experts:
                total, balance, zl = self.combine_loss(
                    gate_sel, gate_softmax, logits)
            else:
                total = balance = zl = jnp.zeros((), jnp.float32)
            losses = {
                "balance_loss": jax.lax.stop_gradient(balance),
                "router_z_loss": jax.lax.stop_gradient(zl),
                "routerloss": jnp.zeros((), jnp.float32),
                "diversity_loss": jnp.zeros((), jnp.float32),
                "router_agreement": jnp.zeros((), jnp.float32),
                "is_comp": jnp.zeros((), jnp.float32),
            }
            return out, MoEAux(aux_loss=total, losses=losses,
                               gate_softmax=jax.lax.stop_gradient(gate_softmax),
                               selected_experts=gate_sel)

        def competition_branch(x):
            out, total, comp = self._competition(x, params, gate_softmax,
                                                 gate_sel)
            losses = {
                "balance_loss": comp["balance_loss"],
                "router_z_loss": jnp.zeros((), jnp.float32),
                "routerloss": comp["routerloss"],
                "diversity_loss": comp["diversity_loss"],
                # distillation health: router top-k vs competition top-k
                # on this flip step (condition downstream on is_comp)
                "router_agreement": comp["router_agreement"],
                "is_comp": jnp.ones((), jnp.float32),
            }
            return out, MoEAux(aux_loss=total, losses=losses,
                               gate_softmax=comp["affinity_softmax"],
                               selected_experts=comp["selected_experts"])

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
        step = jnp.asarray(step, jnp.int32)
        rel = step - self.step_warm
        idx = jnp.clip(rel, 0, sched.shape[0] - 1)
        # No competition during warm-up or past the schedule's end.
        is_comp = (rel >= 0) & (rel < sched.shape[0]) & sched[idx]
        # Remat the competition branch: all-expert outputs are recomputed
        # in backward instead of living in HBM as residuals.
        comp = jax.checkpoint(competition_branch)
        return jax.lax.cond(is_comp, comp, router_branch, x)

    def _competition(self, x, params, gate_softmax, gate_sel):
        """All-expert competition policy (competesmoe.py:219-259,337-387).

        Routed through ec.competition_all_experts_mlp2 so an active EP mesh
        runs the all-expert pass sharded (affinity all-gather + psum of the
        selected outputs) instead of replicated."""
        w1, b1, w2, b2 = params
        b, n, d = x.shape
        k = self.n_selected
        affinity, topk_outputs, sel = ec.competition_all_experts_mlp2(
            x.reshape(b * n, d), w1, b1, w2, b2, self._act(), k,
            impl=self.impl)
        # Affinity = mean(softplus(out)) per expert, in x dtype
        # (competesmoe.py:237-242).
        affinity = affinity.reshape(b, n, self.n_experts)
        topk_outputs = topk_outputs.reshape(b, n, k, self.out_dim)
        sel = sel.reshape(b, n, k)
        affinity_softmax = R.softmax_f32(affinity)
        if self.args.norm_sigmoid:
            # sigmoid is monotone, so sel (top-k of raw affinity) is
            # unchanged; only the combine weights pass through it.
            aw = jnp.take_along_axis(jax.nn.sigmoid(affinity), sel, axis=-1)
        else:
            aw = jnp.take_along_axis(affinity, sel, axis=-1)
        aw = R.normalize_weights(aw, x.dtype)
        out = jnp.sum(topk_outputs * aw[..., None].astype(topk_outputs.dtype),
                      axis=-2)

        aff_sg = jax.lax.stop_gradient(affinity_softmax)
        routerloss = L.router_mse_loss(gate_softmax, aff_sg)
        if self.args.hybrid:
            gtk = jnp.take_along_axis(gate_softmax, sel, axis=-1)
            atk = jnp.take_along_axis(aff_sg, sel, axis=-1)
            routerloss = routerloss + (
                L.router_mse_loss(gtk, atk) * self.args.router_theta)
        div = L.diversity_loss(topk_outputs)
        balance = L.switch_balance_loss(affinity_softmax, sel, self.n_experts)
        total = (routerloss * self.args.router_loss_coef
                 + div * self.args.diversity_loss_coef
                 + balance * self.args.bal_comp_loss_coef)
        comp = {
            "balance_loss": jax.lax.stop_gradient(balance),
            "routerloss": jax.lax.stop_gradient(routerloss),
            "diversity_loss": jax.lax.stop_gradient(div),
            "router_agreement": jax.lax.stop_gradient(
                L.topk_agreement(gate_sel, sel)),
            "affinity_softmax": aff_sg,
            "selected_experts": sel,
        }
        return out, total, comp
