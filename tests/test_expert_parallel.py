"""Explicit expert-parallel dispatch tests on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from competesmoe_tpu.ops import expert_compute as ec
from competesmoe_tpu.parallel import batch_sharding, make_mesh
from competesmoe_tpu.parallel.expert_parallel import make_ep_ffn_kv
from jax.sharding import NamedSharding, PartitionSpec as P

# fast marks are per-test: heavy wide-matrix cases run mid-tier



@pytest.mark.parametrize("n_ep", [2, 4])
@pytest.mark.fast
def test_ep_matches_single_device(n_ep):
    mesh = make_mesh(n_expert=n_ep)
    T, d, E, es, k = 64, 16, 8, 12, 2
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (T, d), jnp.float32)
    keys_w = jax.random.normal(ks[1], (E, d, es)) * 0.2
    values_w = jax.random.normal(ks[2], (E, es, d)) * 0.2
    sel = jax.random.randint(ks[3], (T, k), 0, E)
    w = jax.nn.softmax(jax.random.normal(ks[4], (T, k)))

    want = ec.grouped_ffn_kv(x, sel, w, keys_w, values_w, jax.nn.relu)

    ep_fn = make_ep_ffn_kv(mesh, jax.nn.relu)
    with mesh:
        xs = jax.device_put(x, batch_sharding(mesh))
        sels = jax.device_put(sel, batch_sharding(mesh))
        ws = jax.device_put(w, batch_sharding(mesh))
        kw = jax.device_put(keys_w, NamedSharding(mesh, P("expert")))
        vw = jax.device_put(values_w, NamedSharding(mesh, P("expert")))
        got = jax.jit(ep_fn)(xs, sels, ws, kw, vw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_ep_capacity_drop():
    """With a tiny capacity, over-capacity slots contribute zero."""
    mesh = make_mesh(n_expert=2)
    T, d, E, es, k = 32, 8, 4, 8, 2
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    x = jax.random.normal(ks[0], (T, d), jnp.float32)
    keys_w = jax.random.normal(ks[1], (E, d, es)) * 0.2
    values_w = jax.random.normal(ks[2], (E, es, d)) * 0.2
    # all tokens pick expert 0 and 1 -> shard 0 oversubscribed
    sel = jnp.zeros((T, k), jnp.int32).at[:, 1].set(1)
    w = jnp.full((T, k), 0.5)

    ep_full = make_ep_ffn_kv(mesh, jax.nn.relu)
    ep_tiny = make_ep_ffn_kv(mesh, jax.nn.relu, capacity=2)
    with mesh:
        args = [jax.device_put(a, batch_sharding(mesh))
                for a in (x, sel, w)]
        kw = jax.device_put(keys_w, NamedSharding(mesh, P("expert")))
        vw = jax.device_put(values_w, NamedSharding(mesh, P("expert")))
        full = np.asarray(jax.jit(ep_full)(*args, kw, vw))
        tiny = np.asarray(jax.jit(ep_tiny)(*args, kw, vw))
    # full capacity == dense oracle
    want = np.asarray(ec.grouped_ffn_kv(x, sel, w, keys_w, values_w,
                                        jax.nn.relu))
    np.testing.assert_allclose(full, want, rtol=1e-4, atol=1e-4)
    # tiny capacity drops most slots: norm strictly smaller, finite
    assert np.isfinite(tiny).all()
    assert np.linalg.norm(tiny) < np.linalg.norm(full)


@pytest.mark.fast
def test_ep_grad_flows():
    mesh = make_mesh(n_expert=2)
    T, d, E, es, k = 16, 8, 4, 8, 2
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    x = jax.random.normal(ks[0], (T, d), jnp.float32)
    keys_w = jax.random.normal(ks[1], (E, d, es)) * 0.2
    values_w = jax.random.normal(ks[2], (E, es, d)) * 0.2
    sel = jax.random.randint(ks[3], (T, k), 0, E)
    w = jax.nn.softmax(jax.random.normal(ks[4], (T, k)))
    ep_fn = make_ep_ffn_kv(mesh, jax.nn.relu)

    def loss_ep(keys_w, values_w):
        return (ep_fn(x, sel, w, keys_w, values_w) ** 2).sum()

    def loss_ref(keys_w, values_w):
        return (ec.grouped_ffn_kv(x, sel, w, keys_w, values_w,
                                  jax.nn.relu) ** 2).sum()

    with mesh:
        g_ep = jax.jit(jax.grad(loss_ep, argnums=(0, 1)))(keys_w, values_w)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(keys_w, values_w)
    for a, b in zip(g_ep, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("n_ep", [2, 4])
@pytest.mark.fast
def test_ep_swiglu_matches_single_device(n_ep):
    """Mixtral SwiGLU experts through the all-to-all EP path == the
    single-device grouped path (MixtralMoELayer under an EP mesh)."""
    from competesmoe_tpu.parallel.expert_parallel import make_ep_ffn_swiglu

    mesh = make_mesh(n_expert=n_ep)
    T, d, E, h, k = 64, 16, 8, 24, 2
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    x = jax.random.normal(ks[0], (T, d), jnp.float32)
    w1 = jax.random.normal(ks[1], (E, d, h)) * 0.2
    w3 = jax.random.normal(ks[2], (E, d, h)) * 0.2
    w2 = jax.random.normal(ks[3], (E, h, d)) * 0.2
    sel = jax.random.randint(ks[4], (T, k), 0, E)
    w = jax.nn.softmax(jax.random.normal(ks[5], (T, k)))

    want = ec.grouped_ffn_swiglu(x, sel, w, w1, w3, w2)

    ep_fn = make_ep_ffn_swiglu(mesh)
    with mesh:
        xs = jax.device_put(x, batch_sharding(mesh))
        sels = jax.device_put(sel, batch_sharding(mesh))
        ws = jax.device_put(w, batch_sharding(mesh))
        a = jax.device_put(w1, NamedSharding(mesh, P("expert")))
        b = jax.device_put(w3, NamedSharding(mesh, P("expert")))
        c = jax.device_put(w2, NamedSharding(mesh, P("expert")))
        got = jax.jit(ep_fn)(xs, sels, ws, a, b, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_mixtral_layer_rides_ep_context():
    """MixtralMoELayer auto-upgrades to the all-to-all path when an EP
    mesh is active, with identical outputs (and the all-to-all in HLO)."""
    from competesmoe_tpu.moe import MoEArgs, get_moe
    from competesmoe_tpu.parallel import batch_sharding
    from competesmoe_tpu.parallel.ep_context import set_ep_mesh

    mesh = make_mesh(n_expert=2)
    layer = get_moe("mixtral")(in_dim=16, out_dim=16, n_experts=4,
                               n_selected=2, args=MoEArgs(),
                               expert_hidden_dim=24)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 16), jnp.float32)
    params = layer.init(jax.random.PRNGKey(4), x)
    want, _ = layer.apply(params, x)

    fn = jax.jit(lambda p, x: layer.apply(p, x)[0])
    try:
        set_ep_mesh(mesh)
        with mesh:
            hlo = fn.lower(params, x).compile().as_text()
            got = fn(params, x)
    finally:
        set_ep_mesh(None)
    assert "all-to-all" in hlo, "EP path not taken"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
