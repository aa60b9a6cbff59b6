"""MoA — Mixture-of-Attention (FullMoeRopeAttention), TPU-native.

Re-design of the reference's MoE-ified attention, where each of the q/k/v/o
projections is an *expert bank* routed per token and per head:

- `full_moe_relative_attention.py:183-573` — the attention core: per-name
  param blocks (`create_param_block`, :267-307), selection computation
  (`compute_sel`, :351-379), projection + attend + expert output combine
  (`forward`, :404-464), partial RoPE (`FullMoeRopeAttention.rotate`,
  :550-560).
- `layers/moe/moe.py:456-489` — the (commented-out) `att_forward` /
  `compute_moe` that define the selection semantics: gate logits reshaped
  per head, optional expert-dropout masking, top-k per head, **sigmoid** of
  the gathered logits as combine weights, expert ids shifted by
  `head * n_experts`.
- `layers/moe/moe.py:111-117` — the `is_att` param block: experts
  `[H*E, in, out] ~ N(0, std_expert)`, `w_gate [H*E, d] ~ N(0, std_gate)`
  with row-renormalization, and `div = 10` scaling of the balance loss.
- `layers/moe/moe.py:324-331` — attention-mode entropy balance keeps the
  head dimension (log-mean over tokens at dim -3).

This path is dormant in the reference snapshot (the `att_forward` it needs
is commented out and all shipped sweeps run `no_attmoe`); it is rebuilt
here from the commented-out definition so the MoA capability is live.

TPU-first design: instead of CVMM gather-GEMMs over H*E tiny expert
matrices, tokens are projected through ALL experts with one batched einsum
and weighted-summed with the scattered top-k sigmoid gates (a dense mixture).
At MoA geometry (E=4 experts/head, k=2) the dense path does E/k = 2x the
selected FLOPs but stays entirely on the MXU with zero gathers/scatters —
the same dense-overcompute tradeoff that wins for CompeteSMoE competition
steps. Grad flow is exact: the one-hot mixture is a linear function of the
sigmoid gate values, so d(out)/d(gate) matches the sparse formulation.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..moe.layers import MoEAux
from ..ops import losses as L


def _renormed_rows_init(std: float):
    """N(0, std) then row-renorm keeping the global std
    (moe.py:112 `renorm_rows(w_gate)`; renorm_keep_std semantics at
    full_moe_relative_attention.py:258-262 applied row-wise)."""

    def init(key, shape, dtype=jnp.float32):
        x = std * jax.random.normal(key, shape, jnp.float32)
        std_t = jnp.std(x, axis=-1, keepdims=True)
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        x = x * (std_t / jnp.std(x))
        return x.astype(dtype)

    return init


def att_entropy_balance(logits: jax.Array) -> jax.Array:
    """Entropy balance with the head dim kept (moe.py:324-331, is_att
    branch: log-mean over the token dim -3, entropy per [B, H], mean).

    logits: [B, T, H, E].
    """
    # [B, T, H, E] -> [B, H, T, E] so the shared helper's token axis (-2)
    # lines up with the reference's d=-3.
    return L.entropy_balance_loss(jnp.swapaxes(logits, 1, 2))


class AttentionExpertBank(nn.Module):
    """One projection's expert bank (the reference's `create_param_block`
    is_expert branch, full_moe_relative_attention.py:267-301, backed by a
    `MoE(..., is_att=True)`: moe.py:111-117).

    Parameters:
      w_gate  [H*E, d_sel]  — selection gate, row-renormed N(0, std_gate)
      experts [H, E, in, out] — per-head expert matrices N(0, std_expert)
    """

    n_heads: int
    n_experts: int            # experts PER HEAD (moe.att.n_experts)
    d_sel: int                # selection input width (= input_size)
    in_size: int              # expert input width
    out_size: int             # expert output width
    topk: int = 2             # moe.att.k
    std_gate: float = 0.02
    std_expert: float = 0.02
    expert_dropout: float = 0.0     # moe.att.drop_expert
    selection_dropout: float = 0.0  # moe.att.selection_dropout
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        h, e = self.n_heads, self.n_experts
        self.w_gate = self.param(
            "w_gate", _renormed_rows_init(self.std_gate), (h * e, self.d_sel))
        self.experts = self.param(
            "experts", nn.initializers.normal(self.std_expert),
            (h, e, self.in_size, self.out_size))

    def select(self, x: jax.Array, *, train: bool = False
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """att_forward's selection half (moe.py:456-480).

        x: [B, T, d_sel] -> (idx [B,T,H,k] int32, val [B,T,H,k] sigmoid
        weights, logits [B,T,H,E] f32 for the balance loss).
        """
        if self.selection_dropout > 0.0 and train:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.selection_dropout,
                x.shape)
            x = jnp.where(keep, x / (1.0 - self.selection_dropout), 0.0)
        logits = (x @ self.w_gate.T.astype(x.dtype)).astype(jnp.float32)
        b, t, _ = logits.shape
        logits = logits.reshape(b, t, self.n_heads, self.n_experts)
        sel_logits = logits
        if self.expert_dropout > 0.0 and train:
            drop = jax.random.bernoulli(
                self.make_rng("expert_drop"), self.expert_dropout,
                logits.shape)
            sel_logits = jnp.where(drop, -jnp.inf, logits)
        _, idx = jax.lax.top_k(sel_logits, self.topk)
        # combine weights = sigmoid of the ORIGINAL logits at the selected
        # ids (moe.py:470 gathers from `sel`, not the dropout-masked `sel2`)
        val = jax.nn.sigmoid(
            jnp.take_along_axis(logits, idx, axis=-1)).astype(self.dtype)
        return idx.astype(jnp.int32), val, logits

    def _mix(self, idx: jax.Array, val: jax.Array) -> jax.Array:
        """Scatter top-k sigmoid weights into a dense [B,T,H,E] mixture."""
        one_hot = jax.nn.one_hot(idx, self.n_experts, dtype=val.dtype)
        return jnp.einsum("bthk,bthke->bthe", val, one_hot)

    def project(self, x: jax.Array, idx: jax.Array, val: jax.Array
                ) -> jax.Array:
        """compute_moe for q/k/v (moe.py:488-489 `cvmm(x, sel, experts)`
        combined with the per-head top-k weighting): each head's output is
        the sigmoid-weighted sum of its selected experts' projections.

        x: [B, T, in] -> [B, T, H, out]
        """
        mix = self._mix(idx, val)
        w = self.experts.astype(x.dtype)
        y_all = jnp.einsum("bti,heio->btheo", x, w,
                           preferred_element_type=jnp.float32)
        return jnp.einsum("btheo,bthe->btho", y_all,
                          mix.astype(y_all.dtype)).astype(x.dtype)

    def project_out(self, res: jax.Array, idx: jax.Array, val: jax.Array
                    ) -> jax.Array:
        """The output projection (full_moe_relative_attention.py:446-459):
        the per-head attention results are projected by each head's selected
        o-experts and summed over heads AND top-k (the reference flattens
        `reduction_weight` over (k, heads) before the combining cvmm).

        res: [B, T, H, in] -> [B, T, out]
        """
        mix = self._mix(idx, val)
        w = self.experts.astype(res.dtype)
        y_all = jnp.einsum("bthi,heio->btheo", res, w,
                           preferred_element_type=jnp.float32)
        return jnp.einsum("btheo,bthe->bto", y_all,
                          mix.astype(y_all.dtype)).astype(res.dtype)


class FullMoeRopeAttention(nn.Module):
    """MoA attention block (full_moe_relative_attention.py:523-573 over the
    Core at :183-519): per-name expert banks for q/k/v/o (plain dense
    projections where `moe.att.{name}_expert` is off), partial RoPE, causal
    SDPA, per-bank entropy-balance aux with the is_att `div=10` scaling
    (moe.py:115,443-445).

    Returns (output [B,T,D], MoEAux).
    """

    cfg: "LMConfig"  # noqa: F821 — forward ref to models.lm.LMConfig

    def setup(self):
        cfg = self.cfg
        h, p = cfg.n_heads, cfg.proj_dim
        v_proj = cfg.att_v_size or p
        self.v_proj = v_proj
        std_in = math.sqrt(1.0 / cfg.d_model)
        std_out = math.sqrt(1.0 / (h * v_proj))
        is_expert = {"q": cfg.att_q_expert, "k": cfg.att_k_expert,
                     "v": cfg.att_v_expert, "o": cfg.att_o_expert}
        sizes = {"q": (cfg.d_model, p), "k": (cfg.d_model, p),
                 "v": (cfg.d_model, v_proj), "o": (v_proj, cfg.d_model)}
        for name in ("q", "k", "v", "o"):
            in_size, out_size = sizes[name]
            if is_expert[name]:
                bank = AttentionExpertBank(
                    n_heads=h, n_experts=cfg.att_n_experts,
                    d_sel=cfg.d_model, in_size=in_size, out_size=out_size,
                    topk=cfg.att_k, std_gate=std_in,
                    std_expert=std_out if name == "o" else std_in,
                    expert_dropout=cfg.att_expert_dropout,
                    selection_dropout=cfg.att_selection_dropout,
                    dtype=cfg.dtype, name=f"{name}_bank")
                setattr(self, f"{name}_moe", bank)
            else:
                # non-expert fallback (create_param_block else-branch,
                # :302-307): one fused H-copy linear
                fan_out = cfg.d_model if name == "o" else h * out_size
                dense = nn.Dense(
                    fan_out, use_bias=False,
                    kernel_init=nn.initializers.normal(
                        std_out if name == "o" else std_in),
                    dtype=cfg.dtype, name=f"{name}_dense")
                setattr(self, f"{name}_dense_mod", dense)
        self.is_expert = is_expert

    def _project(self, name: str, src: jax.Array, sels, *, B, T):
        """project() (full_moe_relative_attention.py:381-388): bank path ->
        [B,T,H,out]; dense path -> reshape to torch head order."""
        cfg = self.cfg
        h = cfg.n_heads
        if self.is_expert[name]:
            idx, val, _ = sels[name]
            bank = getattr(self, f"{name}_moe")
            return bank.project(src, idx, val)
        out = getattr(self, f"{name}_dense_mod")(src)
        return out.reshape(B, T, h, -1)

    def __call__(self, x: jax.Array, *,
                 attend_to: Optional[jax.Array] = None,
                 pos_offset: int = 0,
                 mask: Optional[jax.Array] = None,
                 train: bool = False) -> Tuple[jax.Array, MoEAux]:
        from .lm import apply_partial_rope, rope_sin_cos  # avoid cycle

        cfg = self.cfg
        h, p = cfg.n_heads, cfg.proj_dim
        kv_src = attend_to if attend_to is not None else x
        B, T, _ = x.shape
        S = kv_src.shape[1]

        # compute_sel (:351-379): k/v select from the source side
        # (attend_to), q/o from the destination side (curr_state)
        sels = {}
        aux_loss = jnp.zeros((), jnp.float32)
        losses = {}
        for name in ("q", "k", "v", "o"):
            if not self.is_expert[name]:
                continue
            src = kv_src if name in ("k", "v") else x
            bank = getattr(self, f"{name}_moe")
            idx, val, logits = bank.select(src, train=train)
            sels[name] = (idx, val, logits)
            if train and cfg.moe_args.balance_loss_coef:
                # att ebalance: coef / div with div=10 (moe.py:115,443-445)
                bal = att_entropy_balance(logits) * (
                    cfg.moe_args.balance_loss_coef / 10.0)
                aux_loss = aux_loss + bal
                losses[f"att_{name}_ebalance"] = jax.lax.stop_gradient(bal)

        # q,k scaled by sqrt(scale) each, scale = 1/sqrt(p) (:417-422)
        sqrt_scale = jnp.asarray(p, jnp.float32) ** -0.25
        q = self._project("q", x, sels, B=B, T=T) * sqrt_scale.astype(x.dtype)
        k = self._project("k", kv_src, sels, B=B, T=S)
        k = k * sqrt_scale.astype(k.dtype)
        v = self._project("v", kv_src, sels, B=B, T=S)

        n_rotate = int(cfg.rotate_fraction * p)
        n_rotate -= n_rotate % 2
        if n_rotate > 0:
            sin, cos = rope_sin_cos(n_rotate, T, cfg.rope_base,
                                    offset=pos_offset, dtype=q.dtype)
            q = apply_partial_rope(q, sin[None, :, None, :],
                                   cos[None, :, None, :], n_rotate)
            sin0, cos0 = rope_sin_cos(n_rotate, S, cfg.rope_base, offset=0,
                                      dtype=k.dtype)
            k = apply_partial_rope(k, sin0[None, :, None, :],
                                   cos0[None, :, None, :], n_rotate)

        # [B, h, T, p]
        qh = q.transpose(0, 2, 1, 3)
        kh = k.transpose(0, 2, 1, 3)
        vh = v.transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        qpos = jnp.arange(T)[:, None] + (S - T)
        kpos = jnp.arange(S)[None, :]
        causal = kpos <= qpos
        if mask is not None:
            causal = causal & mask
        scores = jnp.where(causal[None, None], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
        res = jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        res = res.transpose(0, 2, 1, 3)  # [B, T, H, v_proj] (:447,461)

        if self.is_expert["o"]:
            idx, val, _ = sels["o"]
            out = self.o_moe.project_out(res, idx, val)
        else:
            out = self.o_dense_mod(res.reshape(B, T, h * self.v_proj))

        return out, MoEAux(aux_loss=aux_loss, losses=losses)
