"""LLaVA-style multimodal meta-model: vision tower + mm projector +
decoder LM, with the image-token splice and KV-cache generation.

Re-design of `moe_model/model/llava_arch.py` + `language_model/llava_phi.py`:

- the variable-length python splice loop (llava_arch.py:287-370) becomes a
  STATIC-SHAPE vectorized splice: with one image per sample and a fixed
  patch count P, output length is always L-1+P and the embed/label/mask
  rebuild is pure gather arithmetic — jit-friendly, no host sync;
- training forward adds `aux_mlp + aux_clip` to the CE loss
  (llava_phi.py:112-143);
- `generate` = spliced prefill into a KV cache + jitted decode steps
  (greedy or temperature sampling), returning routing telemetry when
  `return_id_experts` (llava_phi.py:147-220's returns).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..moe.config import MoEArgs
from .decoder import DecoderConfig, DecoderLM, KVCache
from .projector import ProjectorConfig, VisionProjector
from .vision import SiglipSMoEVisionTower, VisionConfig

IGNORE_INDEX = -100
IMAGE_TOKEN_INDEX = -200


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    vision: VisionConfig = VisionConfig()
    projector: ProjectorConfig = ProjectorConfig()
    decoder: DecoderConfig = DecoderConfig()
    image_token_index: int = IMAGE_TOKEN_INDEX
    tokenizer_model_max_length: Optional[int] = 2048
    # how multi-tile pixel batches [B, M, H, W, C] splice into the text:
    #   'multi'  — each of a row's M image tokens gets one tile's features
    #   'anyres' — all M tiles (an anyres grid, mm_utils.process_anyres_
    #              image) concatenate into ONE block at a single image
    #              token (llava_arch.py:287-330 anyres path)
    # 4-D pixel batches keep the original single-image behavior.
    image_splice: str = "multi"

    @property
    def num_image_tokens(self) -> int:
        return self.vision.num_patches


def splice_image_tokens(input_ids: jax.Array, text_embeds: jax.Array,
                        image_features: jax.Array,
                        labels: Optional[jax.Array] = None,
                        attention_mask: Optional[jax.Array] = None,
                        image_token_index: int = IMAGE_TOKEN_INDEX
                        ) -> Dict[str, jax.Array]:
    """Static-shape MULTI-image splice (llava_arch.py:287-370 semantics).

    input_ids: [B, L] with up to M `image_token_index` occurrences per row.
    text_embeds: [B, L, D] (embed of input_ids with image tokens zeroed).
    image_features: [B, P, D] (single image) or [B, M, P, D]; the m-th
    image token of a row is replaced by image m's P feature rows.
    Returns dict with embeds [B, L - M + M*P, D], labels, attention_mask,
    position_ids — rows with fewer than M images are right-padded
    (llava_arch.py:340-370's pad-to-max behavior as pure gather
    arithmetic; no python loop, no host sync).
    """
    B, L = input_ids.shape
    if image_features.ndim == 3:
        image_features = image_features[:, None]
    M, P = image_features.shape[1], image_features.shape[2]
    Lout = L - M + M * P

    is_img = input_ids == image_token_index
    n_img = jnp.sum(is_img, axis=1)                      # [B]

    if attention_mask is None:
        attention_mask = jnp.ones((B, L), bool)
    else:
        attention_mask = attention_mask.astype(bool)
    if labels is None:
        labels = jnp.full((B, L), IGNORE_INDEX, jnp.int32)

    # positions of each row's image tokens, in order; missing -> sentinel L
    j_in = jnp.arange(L)[None, :]
    keys = jnp.where(is_img, j_in, L + j_in)
    order = jnp.sort(keys, axis=1)[:, :M]                # [B, M]
    p = jnp.where(order < L, order, L)                   # [B, M]

    m_idx = jnp.arange(M)[None, :]                       # [1, M]
    # image m's block starts at its input position shifted by the
    # expansions of the images before it
    starts = jnp.where(p < L, p + m_idx * (P - 1), Lout + P)  # [B, M]

    j = jnp.arange(Lout)[None, :]                        # [1, Lout]
    jm = j[:, :, None]                                   # [B?, Lout, 1]
    sb = starts[:, None, :]                              # [B, 1, M]
    in_block = (jm >= sb) & (jm < sb + P)                # [B, Lout, M]
    in_image = jnp.any(in_block, axis=-1)
    m_sel = jnp.argmax(in_block, axis=-1)                # [B, Lout]
    n_full_before = jnp.sum(jm >= sb + P, axis=-1)       # [B, Lout]
    text_idx = jnp.clip(j - n_full_before * (P - 1), 0, L - 1)

    emb_text = jnp.take_along_axis(text_embeds, text_idx[..., None], axis=1)
    # gather image rows from the flattened [B, M*P, D] feature bank
    img_off = jnp.clip(j - jnp.take_along_axis(starts, m_sel, axis=1),
                       0, P - 1)
    flat_idx = m_sel * P + img_off
    feats = image_features.reshape(B, M * P, -1)
    emb_img = jnp.take_along_axis(feats, flat_idx[..., None], axis=1)
    embeds = jnp.where(in_image[..., None], emb_img, emb_text)

    lab_text = jnp.take_along_axis(labels, text_idx, axis=1)
    new_labels = jnp.where(in_image, IGNORE_INDEX, lab_text)
    mask_text = jnp.take_along_axis(attention_mask, text_idx, axis=1)
    new_mask = jnp.where(in_image, True, mask_text)
    # rows with fewer images have only L - n + n*P real positions
    real_len = (L - n_img + n_img * P)[:, None]
    tail = j >= real_len
    new_mask = jnp.where(tail, False, new_mask)
    new_labels = jnp.where(tail, IGNORE_INDEX, new_labels)
    embeds = jnp.where(tail[..., None], 0.0, embeds)

    position_ids = jnp.cumsum(new_mask.astype(jnp.int32), axis=1) - 1
    position_ids = jnp.maximum(position_ids, 0)
    return {"embeds": embeds, "labels": new_labels,
            "attention_mask": new_mask, "position_ids": position_ids}


@flax.struct.dataclass
class LlavaOutput:
    logits: jax.Array
    loss: Optional[jax.Array]
    aux_mlp: jax.Array
    aux_clip: jax.Array
    labels: Optional[jax.Array] = None
    vision_auxes: Any = None
    projector_aux: Any = None
    cache: Optional[KVCache] = None
    # decoder-block MoE aux (mixtral family): coef-scaled MEAN over
    # layers, the reference's aggregation (llava_mixtral.py:160-167)
    aux_llm: jax.Array = 0.0


class LlavaModel(nn.Module):
    """Vision tower -> projector -> decoder with image splice."""

    cfg: LlavaConfig
    vision_flip_schedule: Any = dataclasses.field(
        default=None, compare=False, hash=False)
    projector_flip_schedule: Any = dataclasses.field(
        default=None, compare=False, hash=False)

    def setup(self):
        if self.cfg.vision.tower_type == "clip":
            from .vision import CLIPSMoEVisionTower
            self.vision_tower = CLIPSMoEVisionTower(
                self.cfg.vision, flip_schedule=self.vision_flip_schedule)
        else:
            self.vision_tower = SiglipSMoEVisionTower(
                self.cfg.vision, flip_schedule=self.vision_flip_schedule)
        self.mm_projector = VisionProjector(
            self.cfg.projector, flip_schedule=self.projector_flip_schedule)
        self.language_model = DecoderLM(self.cfg.decoder)

    def encode_images(self, pixel_values, *, step=None, train=False,
                      return_id_experts=False):
        """pixel_values: [B, H, W, C] (one image per row) or
        [B, M, H, W, C] (M tiles/images per row — multi-image or an
        anyres grid, per cfg.image_splice). Returns features shaped
        [B, P, D] or [B, M(*P?), ...] ready for splice_image_tokens."""
        multi = pixel_values.ndim == 5
        if multi:
            B, M = pixel_values.shape[:2]
            pixel_values = pixel_values.reshape(B * M,
                                                *pixel_values.shape[2:])
        feats, aux_clip, v_auxes = self.vision_tower(
            pixel_values, step=step, train=train,
            return_id_experts=return_id_experts)
        feats = feats.astype(self.cfg.decoder.dtype)
        proj, p_aux = self.mm_projector(
            feats, step=step, train=train,
            return_id_experts=return_id_experts)
        proj = proj.astype(self.cfg.decoder.dtype)
        if multi:
            P = proj.shape[1]
            proj = proj.reshape(B, M, P, -1)
            if self.cfg.image_splice == "anyres":
                # all tiles form one feature block at a single image token
                proj = proj.reshape(B, M * P, -1)
        return proj, aux_clip, v_auxes, p_aux

    def __call__(self, input_ids, pixel_values=None, labels=None,
                 attention_mask=None, *, step=None, train=False,
                 return_id_experts=False, cache=None) -> LlavaOutput:
        lm = self.language_model
        if pixel_values is None:
            logits, new_cache, aux = lm(
                jnp.maximum(input_ids, 0), attention_mask=attention_mask,
                cache=cache, step=step, train=train)
            return LlavaOutput(
                logits=logits, loss=None,
                aux_mlp=jnp.zeros((), jnp.float32),
                aux_clip=jnp.zeros((), jnp.float32), labels=labels,
                cache=new_cache)

        img_feats, aux_clip, v_auxes, p_aux = self.encode_images(
            pixel_values, step=step, train=train,
            return_id_experts=return_id_experts)
        text_embeds = lm.embed(jnp.maximum(input_ids, 0))
        text_embeds = jnp.where(
            (input_ids == self.cfg.image_token_index)[..., None],
            0.0, text_embeds)
        sp = splice_image_tokens(input_ids, text_embeds, img_feats, labels,
                                 attention_mask,
                                 self.cfg.image_token_index)
        maxlen = self.cfg.tokenizer_model_max_length
        embeds, sp_labels = sp["embeds"], sp["labels"]
        sp_mask, sp_pos = sp["attention_mask"], sp["position_ids"]
        if maxlen is not None and embeds.shape[1] > maxlen:
            embeds = embeds[:, :maxlen]
            sp_labels = sp_labels[:, :maxlen]
            sp_mask = sp_mask[:, :maxlen]
            sp_pos = sp_pos[:, :maxlen]

        logits, new_cache, d_aux = lm(
            inputs_embeds=embeds, attention_mask=sp_mask,
            position_ids=sp_pos if cache is None else None,
            cache=cache, step=step, train=train)

        # decoder-block MoE losses (mixtral family): the reference sums
        # coef * MEAN over layers into the LM loss
        # (llava_mixtral.py:160-167); each layer's aux_loss here is
        # already coef-scaled, so mean of them == that expression
        aux_llm = jnp.zeros((), jnp.float32)
        if self.cfg.decoder.moe_name is not None:
            aux_llm = (d_aux["total_aux_loss"]
                       / self.cfg.decoder.num_hidden_layers)

        loss = None
        if labels is not None:
            from .lm import lm_loss_fn
            shift_logits = logits[:, :-1]
            shift_labels = jnp.where(sp_mask[:, 1:], sp_labels[:, 1:],
                                     IGNORE_INDEX)
            ce, _ = lm_loss_fn(shift_logits, shift_labels, IGNORE_INDEX)
            loss = ce + aux_clip + p_aux.aux_loss + aux_llm
        return LlavaOutput(
            logits=logits, loss=loss, aux_mlp=p_aux.aux_loss,
            aux_clip=aux_clip, labels=sp_labels, aux_llm=aux_llm,
            vision_auxes=v_auxes if return_id_experts else None,
            projector_aux=p_aux if return_id_experts else None,
            cache=new_cache)


# ---------------------------------------------------------------------------
# Generation
# ---------------------------------------------------------------------------

def _pad_prompt_bucket(input_ids, attention_mask, enabled: bool,
                       lo: int = 32):
    """Right-pad prompts to a pow-2 length bucket (mask 0 — pads land
    in the cache dump slot, token-exact). Serving prompts vary by a few
    tokens per request; without bucketing every distinct length traces
    and compiles a fresh prefill program (seconds each on TPU), with it
    the program count is O(log lengths)."""
    ids = np.asarray(input_ids)
    B, L = ids.shape
    if attention_mask is None:
        attention_mask = np.ones_like(ids)
    if not enabled:
        return ids, np.asarray(attention_mask), L
    Lb = lo
    while Lb < L:
        Lb *= 2
    if Lb == L:
        return ids, np.asarray(attention_mask), L
    pad = Lb - L
    ids = np.concatenate(
        [ids, np.zeros((B, pad), ids.dtype)], axis=1)
    mask = np.concatenate(
        [np.asarray(attention_mask),
         np.zeros((B, pad), np.asarray(attention_mask).dtype)], axis=1)
    return ids, mask, Lb


_GEN_FN_CACHE: Dict = {}


def make_generate_fns(model: LlavaModel, cfg: LlavaConfig, max_len: int):
    """Build jitted (prefill, decode_step) for incremental generation.

    Cached per (model, max_len): rebuilding the jit wrappers on every
    generate() call would force a full recompile each time (observed 27 s
    per call on the 5.1B model vs <1 s cached)."""
    key = (model, max_len)
    hit = _GEN_FN_CACHE.get(key)
    if hit is not None:
        return hit

    def prefill(params, input_ids, pixel_values, attention_mask):
        B = input_ids.shape[0]
        cache = KVCache.create(cfg.decoder, B, max_len)
        out = model.apply(params, input_ids, pixel_values,
                          attention_mask=attention_mask, cache=cache,
                          return_id_experts=True)
        # last valid position per row
        lengths = out.cache.pos
        last = jnp.take_along_axis(
            out.logits, (lengths - 1)[:, None, None].astype(jnp.int32),
            axis=1)[:, 0]
        return last, out

    def decode_step(params, token, cache):
        out = model.apply(params, token[:, None], None, cache=cache)
        return out.logits[:, 0], out.cache

    fns = (jax.jit(prefill), jax.jit(decode_step))
    _GEN_FN_CACHE[key] = fns
    return fns


_SCAN_FN_CACHE: Dict = {}


def make_scan_decode(model: LlavaModel, n_tokens: int,
                     temperature: float = 0.0, top_p: float = 1.0):
    """Jitted fully-on-device decode: generates n_tokens with lax.scan
    (one device launch for the whole generation — the per-call RPC latency
    of host-loop decode would otherwise dominate on a tunneled TPU).
    Cached per (model, n_tokens, temperature, top_p) so repeated
    generate() calls don't recompile. top_p < 1 samples from the nucleus
    on device (sort+cumsum inside the scan body — the vocab sort is paid
    only when nucleus sampling was actually requested).

    Returns fn(params, first_token [B], cache, rng) -> tokens [B, n].
    """
    key = (model, n_tokens, temperature, top_p)
    hit = _SCAN_FN_CACHE.get(key)
    if hit is not None:
        return hit

    def decode(params, first_token, cache, rng):
        def step(carry, _):
            token, cache, rng = carry
            out = model.apply(params, token[:, None], None, cache=cache)
            logits = out.logits[:, 0]
            rng, sub = jax.random.split(rng)
            nxt = sample_token(logits, sub, temperature, top_p)
            return (nxt, out.cache, rng), nxt

        (_, cache, _), toks = jax.lax.scan(
            step, (first_token, cache, rng), None, length=n_tokens)
        return jnp.swapaxes(toks, 0, 1), cache

    fn = jax.jit(decode)
    _SCAN_FN_CACHE[key] = fn
    return fn


def speculative_accept(logits, drafts, temps, topps, rng, *,
                       nucleus: bool):
    """Shared speculative accept/resample math over a batch of rows.

    logits [S, 1+k, V] from one forward over [cur, k drafts]; returns
    (toks [S, 1+k], n_acc [S]) where toks[s, :n_acc[s]+1] are the
    emitted tokens. Rows with temps<=0 run greedy verification (accept
    the longest draft prefix equal to argmax — bit-exact); rows with
    temps>0 run speculative SAMPLING with the point-mass drafter
    (Leviathan/Chen rejection scheme, q = delta at the draft): accept
    d_j w.p. p_j(d_j), on the first rejection resample from the
    renormalized residual (p_j with d_j removed), bonus draw from p_k
    when all k accept — the emitted-token marginal equals step-by-step
    sampling exactly, nucleus filter applied per position when
    `nucleus`. Used by the engine spec step and the solo verify."""
    S, k = drafts.shape
    greedy = jnp.argmax(logits, -1).astype(jnp.int32)
    match = (drafts == greedy[:, :-1]).astype(jnp.int32)
    n_acc_g = jnp.sum(jnp.cumprod(match, axis=-1), axis=-1)

    scaled = logits / jnp.maximum(temps, 1e-6)[:, None, None]
    if nucleus:
        srt = jnp.sort(scaled, axis=-1)[..., ::-1]
        cum = jnp.cumsum(jax.nn.softmax(srt, -1), axis=-1)
        ci = jnp.sum(cum < topps[:, None, None], axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(srt, ci, axis=-1)
        scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)
    r_acc, r_resid, r_bonus = jax.random.split(rng, 3)
    p = jax.nn.softmax(scaled, axis=-1)
    p_d = jnp.take_along_axis(
        p[:, :-1], drafts[..., None].astype(jnp.int32), axis=-1)[..., 0]
    u = jax.random.uniform(r_acc, (S, k))
    acc = (u < p_d).astype(jnp.int32)
    n_acc_s = jnp.sum(jnp.cumprod(acc, axis=-1), axis=-1)
    V = logits.shape[-1]
    dmask = jax.nn.one_hot(drafts, V, dtype=bool)
    masked = jnp.where(dmask, -jnp.inf, scaled[:, :-1])
    resid = jax.random.categorical(
        r_resid, masked.reshape(S * k, V)).reshape(S, k).astype(jnp.int32)
    bonus = jax.random.categorical(r_bonus,
                                   scaled[:, -1]).astype(jnp.int32)
    idx = jnp.arange(k + 1)[None]
    drafts_pad = jnp.concatenate(
        [drafts, jnp.zeros((S, 1), jnp.int32)], axis=1)
    repl = jnp.concatenate([resid, bonus[:, None]], axis=1)
    out_s = jnp.where(idx < n_acc_s[:, None], drafts_pad, repl)

    is_sampled = temps > 0
    n_acc = jnp.where(is_sampled, n_acc_s, n_acc_g)
    toks = jnp.where(is_sampled[:, None], out_s, greedy)
    return toks, n_acc


_VERIFY_FN_CACHE: Dict = {}


def make_verify_step(model: LlavaModel, k_spec: int):
    """Jitted greedy speculative-verification step (prompt lookup).

    fn(params, tokens [B, 1+k], cache) -> (greedy [B, 1+k], n_acc [B],
    cache').  `tokens` is the already-accepted current token followed by
    k host-drafted tokens (serve/speculative.py:ngram_draft).  One
    forward over all 1+k positions (the cache scatter writes their K/V
    in place, positions pos..pos+k) produces the model's greedy choice
    at every position; `n_acc` counts the longest draft prefix that
    matches, and the returned cache advances pos by 1+n_acc only — the
    rejected tail's K/V slots sit beyond pos, are never attended (the
    decode mask is kpos <= qpos), and are overwritten by the next step's
    scatter.  greedy[:, :1+n_acc] are exactly the tokens sequential
    greedy decode would emit, so speculation is bit-exact.

    On a weight-bandwidth-bound decode step the 1+k-token forward costs
    nearly the same as a 1-token step, so each accepted draft is a free
    extra token.  The reference serves strictly one token per model call
    (moe_model/serve/model_worker.py:125-180).
    """
    key = (model, k_spec)
    hit = _VERIFY_FN_CACHE.get(key)
    if hit is not None:
        return hit

    def verify(params, tokens, cache):
        pos0 = cache.pos
        out = model.apply(params, tokens, None, cache=cache)
        greedy = jnp.argmax(out.logits, axis=-1).astype(jnp.int32)
        match = (tokens[:, 1:] == greedy[:, :-1]).astype(jnp.int32)
        n_acc = jnp.sum(jnp.cumprod(match, axis=-1), axis=-1)
        # the model advanced pos by 1+k (all tokens written); keep only
        # the verified prefix live
        cache2 = out.cache.replace(pos=pos0 + 1 + n_acc)
        return greedy, n_acc, cache2

    fn = jax.jit(verify)
    _VERIFY_FN_CACHE[key] = fn
    return fn


def make_sampled_verify_step(model: LlavaModel, k_spec: int,
                             nucleus: bool):
    """Jitted speculative-SAMPLING verification step (B==1 solo path):
    fn(params, tokens [1, 1+k], cache, rng, temps [B], topps [B])
    -> (toks, n_acc, cache'). temperature/top_p ride as RUNTIME arrays
    (clients vary them per request; baking them into the jit key would
    compile one program per float pair). Same rejection scheme as the
    engine's spec step — see speculative_accept for the math and
    unbiasedness argument; `nucleus` selects the pay-the-vocab-sort
    program variant."""
    key = (model, k_spec, bool(nucleus), "sampled")
    hit = _VERIFY_FN_CACHE.get(key)
    if hit is not None:
        return hit

    def verify(params, tokens, cache, rng, temps, topps):
        pos0 = cache.pos
        out = model.apply(params, tokens, None, cache=cache)
        toks, n_acc = speculative_accept(out.logits, tokens[:, 1:],
                                         temps, topps, rng,
                                         nucleus=nucleus)
        cache2 = out.cache.replace(pos=pos0 + 1 + n_acc)
        return toks, n_acc, cache2

    fn = jax.jit(verify, static_argnames=())
    _VERIFY_FN_CACHE[key] = fn
    return fn


def _spec_chunks(model, params, decode_step, input_ids, cur, cache,
                 max_new: int, spec: int, temperature: float = 0.0,
                 top_p: float = 1.0, rng=None):
    """Speculative decode loop (B==1): yields np [1, n] chunks of new
    tokens after the first. Shared by stream_generate (yields through)
    and generate (collects). Greedy (temperature<=0) is bit-exact vs
    sequential greedy; temperature>0 runs the unbiased point-mass
    rejection scheme (speculative_accept). Prompt-lookup drafts come
    from serve/speculative.py; iterations with no recurring n-gram fall
    back to a plain decode step (same cost on a weight-bandwidth-bound
    chip)."""
    from ..serve.speculative import ngram_draft

    sampled = temperature > 0.0
    if sampled:
        verify = make_sampled_verify_step(model, spec,
                                          nucleus=top_p < 1.0)
        temps1 = jnp.full((1,), temperature, jnp.float32)
        topps1 = jnp.full((1,), top_p, jnp.float32)
        if rng is None:
            rng = jax.random.PRNGKey(0)
    else:
        verify = make_verify_step(model, spec)
    hist = [int(t) for t in input_ids[0].tolist() if int(t) >= 0]
    cur_i = int(np.asarray(cur)[0])
    hist.append(cur_i)
    produced = 1
    while produced < max_new:
        draft = ngram_draft(hist, spec)
        if draft is None:
            logits, cache = decode_step(
                params, jnp.asarray([cur_i], jnp.int32), cache)
            if sampled:
                rng, sub = jax.random.split(rng)
                emit = np.asarray(
                    sample_token(logits, sub, temperature, top_p))
            else:
                emit = np.asarray(
                    jnp.argmax(logits, axis=-1).astype(jnp.int32))
        else:
            toks = np.concatenate([[cur_i], draft]).astype(np.int32)
            if sampled:
                rng, sub = jax.random.split(rng)
                got, n_acc, cache = verify(
                    params, jnp.asarray(toks[None]), cache, sub,
                    temps1, topps1)
            else:
                got, n_acc, cache = verify(
                    params, jnp.asarray(toks[None]), cache)
            emit = np.asarray(got)[0, : int(n_acc[0]) + 1]
        emit = emit[: max_new - produced]
        produced += len(emit)
        cur_i = int(emit[-1])
        hist.extend(int(t) for t in emit)
        yield emit[None].astype(np.int32).copy()


def sample_token(logits: jax.Array, rng: Optional[jax.Array],
                 temperature: float = 0.0, top_p: float = 1.0) -> jax.Array:
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def stream_generate(model: LlavaModel, params, input_ids: np.ndarray,
                    pixel_values: Optional[np.ndarray],
                    attention_mask: Optional[np.ndarray] = None,
                    max_new_tokens: int = 64, temperature: float = 0.0,
                    top_p: float = 1.0, eos_token_id: Optional[int] = None,
                    stop_token_ids: Optional[List[int]] = None,
                    rng: Optional[jax.Array] = None,
                    chunk_max: int = 8,
                    speculative: int = 0,
                    pad_to_bucket: bool = True):
    """Incremental generation: yields np.ndarray token chunks [B, n] as
    they are sampled — the concurrent-streaming role of the reference
    worker's threaded `TextIteratorStreamer`
    (moe_model/serve/model_worker.py:125-180), without the thread: the
    caller consumes tokens between device steps, so the first token
    arrives right after prefill (TTFT = prefill time + one decode step)
    and abandoning the generator cancels the remaining decode steps.

    Chunk sizes follow a 1,1,2,4,...,chunk_max warmup so early tokens
    stream at per-step latency while the steady state amortizes host-loop
    overhead through `make_scan_decode` (one device program per chunk);
    top_p < 1 rides inside the scan (device-side nucleus sampling).
    Stops after every row has produced a stop/eos token; the final chunk
    is truncated at the stop position.

    speculative=K > 0 enables prompt-lookup speculative decoding (B==1
    only; silently ignored otherwise): each device step verifies K
    host-drafted tokens (serve/speculative.py) and emits 1..K+1 tokens.
    Greedy requests are bit-exact vs sequential greedy
    (make_verify_step); temperature>0 requests run the unbiased
    point-mass rejection scheme (speculative_accept).
    """
    cfg = model.cfg
    B, L = input_ids.shape
    spec = int(speculative) if (speculative and B == 1) else 0
    orig_ids = np.asarray(input_ids)   # unpadded: draft history source
    input_ids, attention_mask, L = _pad_prompt_bucket(
        input_ids, attention_mask, pad_to_bucket)
    P = cfg.num_image_tokens if pixel_values is not None else 0
    prompt_len = L - 1 + P if pixel_values is not None else L
    max_len = prompt_len + max_new_tokens + spec
    if pad_to_bucket:
        max_len = -(-max_len // 128) * 128
    prefill, decode_step = make_generate_fns(model, cfg, max_len)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    if pixel_values is not None:
        last_logits, out = prefill(params, jnp.asarray(input_ids),
                                   jnp.asarray(pixel_values),
                                   jnp.asarray(attention_mask))
    else:
        cache = KVCache.create(cfg.decoder, B, max_len)
        res = model.apply(params, jnp.asarray(input_ids), None,
                          attention_mask=jnp.asarray(attention_mask),
                          cache=cache)
        lengths = res.cache.pos
        last_logits = jnp.take_along_axis(
            res.logits, (lengths - 1)[:, None, None].astype(jnp.int32),
            axis=1)[:, 0]
        out = res
    cache = out.cache

    stops = set(stop_token_ids or [])
    if eos_token_id is not None:
        stops.add(int(eos_token_id))
    stop_arr = np.asarray(sorted(stops)) if stops else None

    def cut(chunk: np.ndarray, finished: np.ndarray):
        """Per row: pad tokens after the first stop with the stop id (so
        consumers that split at the stop marker see no garbage) and mark
        the row finished. Rows finished in earlier chunks emit only stop
        ids. Returns (chunk, finished, all_done)."""
        if stop_arr is None:
            return chunk, finished, False
        for b in range(chunk.shape[0]):
            if finished[b]:
                chunk[b, :] = stop_arr[0]
                continue
            hits = np.isin(chunk[b], stop_arr)
            if hits.any():
                fi = int(hits.argmax())
                chunk[b, fi + 1:] = chunk[b, fi]
                finished[b] = True
        return chunk, finished, bool(finished.all())

    rng, sub = jax.random.split(rng)
    cur = sample_token(last_logits, sub, temperature, top_p)
    finished = np.zeros(B, bool)
    produced = 1
    # .copy(): np.asarray of a jax buffer is read-only and cut() writes
    chunk_np = np.asarray(cur)[:, None].copy()
    chunk_np, finished, done = cut(chunk_np, finished)
    yield chunk_np
    if done:
        return

    if spec:
        rng, sub = jax.random.split(rng)
        for emit in _spec_chunks(model, params, decode_step, orig_ids,
                                 cur, cache, max_new_tokens, spec,
                                 temperature=temperature, top_p=top_p,
                                 rng=sub):
            chunk_np, finished, done = cut(emit, finished)
            yield chunk_np
            if done:
                return
        return

    size = 1
    while produced < max_new_tokens:
        n = min(size, max_new_tokens - produced)
        rng, sub = jax.random.split(rng)
        if n > 1:
            decode_n = make_scan_decode(model, n, temperature, top_p)
            toks, cache = decode_n(params, cur, cache, sub)
            chunk_np = np.asarray(toks).copy()
            cur = toks[:, -1]
        else:
            logits, cache = decode_step(params, cur, cache)
            cur = sample_token(logits, sub, temperature, top_p)
            chunk_np = np.asarray(cur)[:, None].copy()
        produced += n
        chunk_np, finished, done = cut(chunk_np, finished)
        yield chunk_np
        if done:
            return
        size = min(size * 2, chunk_max)


def generate(model: LlavaModel, params, input_ids: np.ndarray,
             pixel_values: Optional[np.ndarray],
             attention_mask: Optional[np.ndarray] = None,
             max_new_tokens: int = 64, temperature: float = 0.0,
             top_p: float = 1.0, eos_token_id: Optional[int] = None,
             rng: Optional[jax.Array] = None,
             stop_token_ids: Optional[List[int]] = None,
             scan_decode: bool = True,
             speculative: int = 0,
             pad_to_bucket: bool = True
             ) -> Tuple[np.ndarray, LlavaOutput]:
    """Generation: jitted prefill + decode.

    scan_decode=True (default) generates all tokens in ONE device program
    (lax.scan) and truncates at stop tokens on the host — the TPU-native
    fast path. scan_decode=False is a host loop with early exit per step
    (better when stops hit early).
    Returns (generated ids [B, <=max_new_tokens], prefill output with
    routing telemetry) — the role of `LlavaPhiForCausalLM.generate`
    (llava_phi.py:147-220).

    speculative=K enables prompt-lookup speculative decoding (B==1
    only, silently ignored otherwise): greedy is bit-exact; temp>0
    runs the unbiased point-mass rejection scheme. The default eval
    configuration (eval CLI batch_size=1, temperature 0) rides it
    directly; VQA answers quote the prompt heavily, which is exactly
    the regime where the drafts accept."""
    cfg = model.cfg
    B, L = input_ids.shape
    spec = int(speculative) if (speculative and B == 1
                                and max_new_tokens > 1) else 0
    orig_ids = np.asarray(input_ids)
    input_ids, attention_mask, L = _pad_prompt_bucket(
        input_ids, attention_mask, pad_to_bucket)
    P = cfg.num_image_tokens if pixel_values is not None else 0
    prompt_len = L - 1 + P if pixel_values is not None else L
    max_len = prompt_len + max_new_tokens + spec
    if pad_to_bucket:
        max_len = -(-max_len // 128) * 128
    prefill, decode_step = make_generate_fns(model, cfg, max_len)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    if pixel_values is not None:
        last_logits, out = prefill(params, jnp.asarray(input_ids),
                                   jnp.asarray(pixel_values),
                                   jnp.asarray(attention_mask))
    else:
        cache = KVCache.create(cfg.decoder, B, max_len)
        res = model.apply(params, jnp.asarray(input_ids), None,
                          attention_mask=jnp.asarray(attention_mask),
                          cache=cache)
        lengths = res.cache.pos
        last_logits = jnp.take_along_axis(
            res.logits, (lengths - 1)[:, None, None].astype(jnp.int32),
            axis=1)[:, 0]
        out = res
    cache = out.cache

    stops = set(stop_token_ids or [])
    if eos_token_id is not None:
        stops.add(int(eos_token_id))
    # split BEFORE consuming: categorical(rng) then split(rng) would
    # correlate the first draw with every downstream draw (key reuse)
    rng, r_first = jax.random.split(rng)
    cur = sample_token(last_logits, r_first, temperature, top_p)

    if spec:
        parts = [np.asarray(cur)[:, None].copy()]
        rng, sub = jax.random.split(rng)
        if not (stops and int(parts[0][0, 0]) in stops):
            for emit in _spec_chunks(model, params, decode_step,
                                     orig_ids, cur, cache,
                                     max_new_tokens, spec,
                                     temperature=temperature,
                                     top_p=top_p, rng=sub):
                parts.append(emit)
                if stops and np.isin(emit, list(stops)).any():
                    break
        all_toks = np.concatenate(parts, axis=1)
        if stops:
            stop_mask = np.isin(all_toks, list(stops))
            first_stop = np.where(stop_mask.any(1), stop_mask.argmax(1),
                                  all_toks.shape[1])
            keep = int(first_stop.max()) + 1
            all_toks = all_toks[:, :min(keep, all_toks.shape[1])]
        return all_toks, out

    if scan_decode and max_new_tokens > 1:
        decode_n = make_scan_decode(model, max_new_tokens - 1, temperature,
                                    top_p)
        rng, sub = jax.random.split(rng)
        rest, _ = decode_n(params, cur, cache, sub)
        all_toks = np.concatenate(
            [np.asarray(cur)[:, None], np.asarray(rest)], axis=1)
        if stops:
            # truncate to the shortest row still containing live tokens
            stop_mask = np.isin(all_toks, list(stops))
            first_stop = np.where(stop_mask.any(1), stop_mask.argmax(1),
                                  all_toks.shape[1])
            keep = int(first_stop.max()) + 1
            all_toks = all_toks[:, :min(keep, all_toks.shape[1])]
        return all_toks, out

    tokens = []
    finished = np.zeros(B, bool)
    for t in range(max_new_tokens):
        cur_np = np.asarray(cur)
        tokens.append(cur_np)
        finished |= np.isin(cur_np, list(stops)) if stops else False
        if finished.all():
            break
        rng, sub = jax.random.split(rng)
        logits, cache = decode_step(params, cur, cache)
        cur = sample_token(logits, sub, temperature, top_p)
    return np.stack(tokens, axis=1), out
