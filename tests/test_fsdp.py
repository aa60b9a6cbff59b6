"""FSDP-style dense-param sharding tests (the ZeRO-3 analog) on the
virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from competesmoe_tpu.models.lm import LMConfig, MoELanguageModel, lm_loss_fn
from competesmoe_tpu.moe import MoEArgs
from competesmoe_tpu.parallel import make_mesh, make_param_shardings
from competesmoe_tpu.parallel.mesh import param_spec


class _Leaf:
    def __init__(self, shape):
        self.shape = shape
        self.ndim = len(shape)
        self.size = int(np.prod(shape))


def test_param_spec_fsdp_rules():
    # expert tensors keep the expert axis even under fsdp
    assert param_spec(["moe", "keys"], _Leaf((64, 512, 128)), 4) == \
        P("expert", None, None)
    # large dense 2-D params shard their largest divisible dim on 'data'
    assert param_spec(["output", "kernel"], _Leaf((512, 8000)), 4) == \
        P(None, "data")
    assert param_spec(["attn", "kernel"], _Leaf((1024, 512)), 4) == \
        P("data", None)
    # small params stay replicated
    assert param_spec(["norm", "scale"], _Leaf((512,)), 4) == P()
    # indivisible dims fall back through the size ordering
    assert param_spec(["x", "kernel"], _Leaf((1023, 512)), 4) == \
        P(None, "data")
    # fsdp off -> replicated
    assert param_spec(["output", "kernel"], _Leaf((512, 8000)), 1) == P()


def test_fsdp_training_matches_replicated():
    cfg = LMConfig(vocab_size=256, d_model=64, n_layers=2, n_heads=2,
                   n_experts=8, expert_size=16, moe_topk=2,
                   moe_name="smoe", moe_args=MoEArgs())
    model = MoELanguageModel(cfg)
    mesh = make_mesh(n_expert=2)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (8, 17), 0, 256)

    def loss_fn(p, toks):
        logits, aux = model.apply({"params": p}, toks[:, :-1], train=True)
        ce, _ = lm_loss_fn(logits, toks[:, 1:])
        return ce + aux["total_aux_loss"]

    with mesh:
        params = model.init(jax.random.PRNGKey(1), tokens[:, :-1])["params"]
        p_rep = jax.device_put(params,
                               make_param_shardings(mesh, params))
        p_fsdp = jax.device_put(
            params, make_param_shardings(mesh, params, fsdp=True,
                                         fsdp_min_size=1024))

        # the big dense params are actually sharded over 'data'
        emb = p_fsdp["embedding"]["embedding"]
        assert "data" in jax.tree_util.tree_leaves(
            [emb.sharding.spec])[0:1][0] or \
            any(ax == "data" for ax in emb.sharding.spec)
        # expert tensors still on the expert axis
        keys_spec = p_fsdp["blocks_0"]["moe"]["keys"].sharding.spec
        assert keys_spec[0] == "expert"

        l_rep = float(jax.jit(loss_fn)(p_rep, tokens))
        l_fsdp = float(jax.jit(loss_fn)(p_fsdp, tokens))
        np.testing.assert_allclose(l_rep, l_fsdp, rtol=2e-5)

        g_rep = jax.jit(jax.grad(loss_fn))(p_rep, tokens)
        g_fsdp = jax.jit(jax.grad(loss_fn))(p_fsdp, tokens)
        for a, b in zip(jax.tree_util.tree_leaves(g_rep),
                        jax.tree_util.tree_leaves(g_fsdp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
        # gradients of fsdp params come back sharded over 'data' too
        # (XLA may pick a different but equivalent dim; the train step
        # pins the state's shardings via donation)
        ge = g_fsdp["embedding"]["embedding"]
        assert any(ax == "data" for ax in ge.sharding.spec
                   if ax is not None)


def test_fsdp_cli_end_to_end(tmp_path):
    from competesmoe_tpu.utils.argparser import ArgumentParser
    from competesmoe_tpu.train.lm_task import _task_args, get_task

    p = ArgumentParser()
    _task_args(p)
    a = p.parse([
        "-task", "synthetic_transformer", "-stop_after", "3",
        "-batch_size", "8", "-lm.unroll", "32", "-state_size", "32",
        "-transformer.encoder_n_layers", "2", "-moe.n_experts", "4",
        "-pkm.n_heads", "2", "-moe_name", "smoe", "-lm.vocab_size", "64",
        "-fsdp", "1", "-fsdp.min_size", "256", "-run_dir", str(tmp_path), "-name", "fsdp_e2e",
        "-save_interval", "1000", "-log_interval", "1",
    ])
    task = get_task("synthetic_transformer")(a)
    task.train()
    emb = task.state.params["embedding"]["embedding"]
    assert any(ax == "data" for ax in emb.sharding.spec
               if ax is not None)


def test_put_batch_equals_device_put_single_host():
    """put_batch (multi-host-safe make_array_from_callback) must place
    values and sharding exactly like device_put on one host."""
    from competesmoe_tpu.parallel import batch_sharding, put_batch
    from competesmoe_tpu.parallel.mesh import make_mesh
    import jax
    import jax.numpy as jnp
    import numpy as np

    mesh = make_mesh(n_expert=2)
    x = np.arange(16 * 8, dtype=np.int32).reshape(16, 8)
    a = put_batch(x, mesh)
    b = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
