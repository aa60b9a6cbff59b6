"""Ring attention (context parallelism) exactness on the virtual mesh.

The reference has no long-context mechanism (SURVEY §5); ring attention
is the beyond-reference capability — these tests pin it to exact full
attention computed on one device.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from competesmoe_tpu.parallel.ring_attention import make_ring_attention

# exactness/fuzz cores are fast-tier; the LM/LLaVA composition
# runs (jit-heavy, ~1 min each) ride the mid tier (unmarked)


def ref_attention(q, k, v, causal):
    B, T, h, p = q.shape
    qt = q.transpose(0, 2, 1, 3).astype(jnp.float32)
    kt = k.transpose(0, 2, 1, 3).astype(jnp.float32)
    vt = v.transpose(0, 2, 1, 3).astype(jnp.float32)
    scores = jnp.einsum("bhqp,bhkp->bhqk", qt, kt) / math.sqrt(p)
    if causal:
        mask = jnp.tril(jnp.ones((T, T), bool))
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkp->bhqp", w, vt)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def seq_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("seq",))


@pytest.mark.fast
@pytest.mark.parametrize("n_seq", [2, 4, 8])
@pytest.mark.parametrize("causal", [True, False])
def test_ring_attention_matches_full(n_seq, causal):
    B, T, h, p = 2, 32, 3, 8
    ks = jax.random.split(jax.random.PRNGKey(n_seq), 3)
    q = jax.random.normal(ks[0], (B, T, h, p), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, h, p), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, h, p), jnp.float32)
    want = ref_attention(q, k, v, causal)

    mesh = seq_mesh(n_seq)
    ring = make_ring_attention(mesh, causal=causal)
    with mesh:
        sh = NamedSharding(mesh, P(None, "seq", None, None))
        got = jax.jit(ring)(jax.device_put(q, sh), jax.device_put(k, sh),
                            jax.device_put(v, sh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_bf16_and_grads():
    """bf16 inputs accumulate in f32; grads flow through the ring (the
    ppermute chain differentiates — training viability, not just
    inference)."""
    B, T, h, p = 1, 16, 2, 8
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (B, T, h, p), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, T, h, p), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, T, h, p), jnp.bfloat16)

    mesh = seq_mesh(4)
    ring = make_ring_attention(mesh)

    def ring_loss(q, k, v):
        return jnp.sum(ring(q, k, v).astype(jnp.float32) ** 2)

    def ref_loss(q, k, v):
        return jnp.sum(ref_attention(q, k, v, True)
                       .astype(jnp.float32) ** 2)

    with mesh:
        sh = NamedSharding(mesh, P(None, "seq", None, None))
        args = [jax.device_put(a, sh) for a in (q, k, v)]
        out = jax.jit(ring)(*args)
        assert out.dtype == jnp.bfloat16
        g_ring = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(*args)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0.1, atol=0.15)  # bf16 grads: loose band


@pytest.mark.fast
def test_ring_attention_hlo_has_collective_permute():
    mesh = seq_mesh(4)
    ring = make_ring_attention(mesh)
    B, T, h, p = 1, 16, 2, 8
    x = jnp.zeros((B, T, h, p), jnp.float32)
    with mesh:
        sh = NamedSharding(mesh, P(None, "seq", None, None))
        xs = jax.device_put(x, sh)
        hlo = jax.jit(ring).lower(xs, xs, xs).compile().as_text()
    assert "collective-permute" in hlo


def test_lm_train_step_with_sequence_parallel_matches_single_device():
    """A CompeteSMoE LM loss/grad on a ('data','seq') mesh with ring
    attention active == the single-device computation: context
    parallelism composes with the MoE stack (XLA partitions everything
    but the explicit ring)."""
    from competesmoe_tpu.models.lm import (LMConfig, MoELanguageModel,
                                           lm_loss_fn)
    from competesmoe_tpu.moe import MoEArgs, build_flip_schedule
    from competesmoe_tpu.parallel.seq_context import use_sequence_parallel

    cfg = LMConfig(vocab_size=128, d_model=32, n_layers=2, n_heads=2,
                   n_experts=4, expert_size=8, moe_topk=2,
                   moe_name="competesmoe", moe_args=MoEArgs(),
                   dtype=jnp.float32)
    sched = build_flip_schedule(2, total_steps=10, warm_up=0.0,
                                rate_flip=1.0, max_compete_in_iter=2,
                                seed=0)
    model = MoELanguageModel(cfg, flip_schedule=sched)
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(1, 120, (4, 33)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens[:, :-1])

    def f(p, toks):
        logits, aux = model.apply(p, toks[:, :-1], train=True,
                                  step=jnp.int32(1))
        loss, _ = lm_loss_fn(logits, toks[:, 1:])
        return loss + aux["total_aux_loss"]

    l_ref, g_ref = jax.value_and_grad(f)(params, tokens)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("data", "seq"))
    with use_sequence_parallel(mesh), mesh:
        tok_sh = jax.device_put(
            tokens, NamedSharding(mesh, P("data", None)))
        l_sp, g_sp = jax.jit(jax.value_and_grad(f))(
            jax.device_put(params), tok_sh)
    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_sp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_lm_task_with_seq_shards_end_to_end(tmp_path):
    """-n_seq_shards through the pretrain CLI: the synthetic task trains
    on a ('data','expert','seq') mesh with ring attention active and a
    finite decreasing-ish loss."""
    from competesmoe_tpu.train.lm_task import _task_args, get_task
    from competesmoe_tpu.utils.argparser import ArgumentParser

    p = ArgumentParser()
    _task_args(p)
    a = p.parse([
        "-task", "synthetic_transformer", "-stop_after", "3",
        "-batch_size", "8", "-lm.unroll", "32", "-state_size", "32",
        "-transformer.encoder_n_layers", "2", "-moe.n_experts", "4",
        "-pkm.n_heads", "2", "-moe_name", "competesmoe",
        "-lm.vocab_size", "64", "-n_seq_shards", "4",
        "-run_dir", str(tmp_path), "-name", "sp_e2e",
        "-save_interval", "1000", "-log_interval", "1",
    ])
    task = get_task("synthetic_transformer")(a)
    assert "seq" in task.mesh.axis_names and task.mesh.shape["seq"] == 4
    task.train()
    import json
    log = (tmp_path / "sp_e2e" / "log_trainer.jsonl").read_text()
    recs = [json.loads(l) for l in log.strip().splitlines()]
    losses = [r["loss/total"] for r in recs if "loss/total" in r]
    assert losses and all(np.isfinite(l) for l in losses)


@pytest.mark.fast
def test_masked_ring_attention_matches_reference():
    """The padded/position-id form: random validity + per-row restarting
    positions must reproduce dense masked attention exactly."""
    from competesmoe_tpu.parallel.ring_attention import (
        make_ring_attention_masked)

    B, T, h, p = 2, 24, 2, 8
    rng = np.random.default_rng(11)
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (B, T, h, p), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, h, p), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, h, p), jnp.float32)
    # right-padded rows (like the image splice) + cumsum position ids
    valid = np.ones((B, T), bool)
    valid[0, 19:] = False
    valid[1, 14:] = False
    pos = np.maximum(np.cumsum(valid, axis=1) - 1, 0).astype(np.int32)

    # dense reference with the decoder's training mask
    qt = q.transpose(0, 2, 1, 3).astype(jnp.float32)
    kt = k.transpose(0, 2, 1, 3).astype(jnp.float32)
    vt = v.transpose(0, 2, 1, 3).astype(jnp.float32)
    scores = jnp.einsum("bhqp,bhkp->bhqk", qt, kt) / math.sqrt(p)
    m = (pos[:, None, :] <= pos[:, :, None]) & valid[:, None, :]
    scores = jnp.where(m[:, None], scores, -jnp.inf)
    want = jnp.einsum("bhqk,bhkp->bhqp", jax.nn.softmax(scores, -1), vt)
    want = want.transpose(0, 2, 1, 3)

    mesh = seq_mesh(4)
    ring = make_ring_attention_masked(mesh)
    with mesh:
        sh4 = NamedSharding(mesh, P(None, "seq", None, None))
        sh2 = NamedSharding(mesh, P(None, "seq"))
        got = jax.jit(ring)(
            jax.device_put(q, sh4), jax.device_put(k, sh4),
            jax.device_put(v, sh4),
            jax.device_put(jnp.asarray(pos), sh2),
            jax.device_put(jnp.asarray(pos), sh2),
            jax.device_put(jnp.asarray(valid), sh2))
    # compare only valid query rows (padded rows are never read)
    gv = np.asarray(got)[np.asarray(valid)]
    wv = np.asarray(want)[np.asarray(valid)]
    np.testing.assert_allclose(gv, wv, rtol=2e-5, atol=2e-5)


def test_llava_mm_loss_with_sequence_parallel_matches_single_device():
    """Multimodal training step (image splice -> padded rows ->
    decoder) on a ('data','seq') mesh == single device: the decoder's
    masked ring path is numerically the dense-mask path."""
    import sys
    sys.path.insert(0, "tests")
    from test_llava import tiny_llava_cfg
    from competesmoe_tpu.models.llava import IMAGE_TOKEN_INDEX, LlavaModel
    from competesmoe_tpu.parallel.seq_context import use_sequence_parallel

    cfg = tiny_llava_cfg(moe=True)
    model = LlavaModel(cfg)
    rng = np.random.default_rng(3)
    # L=13 text tokens, 1 image token -> spliced T = 13 - 1 + 4 = 16,
    # divisible by the 4-way seq axis (ring blocks need T % n_seq == 0)
    ids = rng.integers(2, 60, (4, 13)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    labels, mask = ids.copy(), np.ones_like(ids)
    mask[2, 10:] = 0  # a padded row exercises kvalid on the ring
    px = rng.normal(size=(4, 28, 28, 3)).astype(np.float32)

    def loss(p):
        return model.apply(p, jnp.asarray(ids), jnp.asarray(px),
                           labels=jnp.asarray(labels),
                           attention_mask=jnp.asarray(mask),
                           train=True, step=jnp.int32(1)).loss

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(px), labels=jnp.asarray(labels),
                        attention_mask=jnp.asarray(mask))
    l_ref, g_ref = jax.value_and_grad(loss)(params)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("data", "seq"))
    with use_sequence_parallel(mesh), mesh:
        l_sp, g_sp = jax.jit(jax.value_and_grad(loss))(
            jax.device_put(params))
    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_sp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


@pytest.mark.fast
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_masked_ring_attention_fuzz(seed):
    """Random validity patterns (including an ALL-invalid row: output
    defined as zeros, no NaN) and random non-monotone positions."""
    from competesmoe_tpu.parallel.ring_attention import (
        make_ring_attention_masked)

    B, T, h, p = 2, 16, 2, 4
    rng = np.random.default_rng(seed)
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, T, h, p), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, h, p), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, h, p), jnp.float32)
    valid = rng.random((B, T)) > 0.3
    valid[0, :] = False          # entire row masked
    valid[1, 0] = True           # keep one anchor so softmax is defined
    pos = rng.integers(0, T, (B, T)).astype(np.int32)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqp,bhkp->bhqk", qt, kt) / math.sqrt(p)
    m = (pos[:, None, :] <= pos[:, :, None]) & valid[:, None, :]
    has_any = np.asarray(m).any(-1)  # [B, T] rows with >= 1 valid key
    scores = jnp.where(m[:, None], scores, -jnp.inf)
    want = jnp.einsum("bhqk,bhkp->bhqp",
                      jax.nn.softmax(scores, -1), vt).transpose(0, 2, 1, 3)

    mesh = seq_mesh(4)
    ring = make_ring_attention_masked(mesh)
    with mesh:
        sh4 = NamedSharding(mesh, P(None, "seq", None, None))
        sh2 = NamedSharding(mesh, P(None, "seq"))
        got = jax.jit(ring)(
            jax.device_put(q, sh4), jax.device_put(k, sh4),
            jax.device_put(v, sh4),
            jax.device_put(jnp.asarray(pos), sh2),
            jax.device_put(jnp.asarray(pos), sh2),
            jax.device_put(jnp.asarray(valid), sh2))
    got = np.asarray(got)
    assert np.isfinite(got).all(), "NaN/inf leaked from masked ring"
    np.testing.assert_allclose(got[has_any], np.asarray(want)[has_any],
                               rtol=3e-5, atol=3e-5)
    assert np.abs(got[~has_any]).max() == 0.0, \
        "all-masked rows must output exact zeros"
