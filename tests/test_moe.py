"""Quantized MoE with expert parallelism (greenfield: the reference is
dense-only).  Differential tests per the repo convention: routed dispatch
vs brute-force expert application."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bitorch_engine_tpu.ops.moe import (
    _expert_mlp,
    _expert_slice,
    expert_shardings,
    init_moe_experts,
    moe_mlp,
)

E, D, I = 4, 64, 128


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    experts = init_moe_experts(key, E, D, I, w_bit=4, group_size=32)
    router = jax.random.normal(jax.random.PRNGKey(1), (D, E), jnp.float32) * 0.5
    x = jax.random.normal(jax.random.PRNGKey(2), (16, D), jnp.float32)
    return experts, router, x


def _brute(experts, router, x, top_k):
    logits = x @ router
    probs = jax.nn.softmax(logits, -1)
    vals, idx = jax.lax.top_k(probs, top_k)
    per_e = jnp.stack([_expert_mlp(_expert_slice(experts, e), x) for e in range(E)])
    y = jnp.zeros_like(x)
    for t in range(x.shape[0]):
        for j in range(top_k):
            y = y.at[t].add(vals[t, j] * per_e[idx[t, j], t])
    return y


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_matches_bruteforce(setup, top_k):
    experts, router, x = setup
    # ample capacity: nothing dropped -> must match the dense evaluation
    y, aux = moe_mlp(x, router, experts, top_k=top_k, capacity_factor=8.0)
    ref = _brute(experts, router, x, top_k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5, rtol=1e-4)
    assert float(aux) >= 1.0 - 1e-6  # uniform router floor


def test_moe_capacity_drops_are_partial(setup):
    experts, router, x = setup
    y_full, _ = moe_mlp(x, router, experts, top_k=2, capacity_factor=8.0)
    y_tight, _ = moe_mlp(x, router, experts, top_k=2, capacity_factor=0.5)
    # tokens past capacity lose that expert's contribution but the output stays
    # finite and some rows still match (early tokens keep their slots)
    assert bool(jnp.isfinite(y_tight).all())
    assert not np.allclose(np.asarray(y_full), np.asarray(y_tight))
    np.testing.assert_allclose(
        np.asarray(y_full[0]), np.asarray(y_tight[0]), atol=1e-5, rtol=1e-4
    )


def test_moe_expert_parallel_sharded(setup):
    experts, router, x = setup
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = Mesh(np.asarray(devs[:4]).reshape(4), axis_names=("ep",))
    experts_sh = jax.device_put(experts, expert_shardings(mesh, experts))
    x_sh = jax.device_put(x, NamedSharding(mesh, P()))
    with mesh:
        y_sh, aux = jax.jit(
            lambda ex, xx: moe_mlp(xx, router, ex, top_k=2, capacity_factor=8.0)
        )(experts_sh, x_sh)
    y_ref, _ = moe_mlp(x, router, experts, top_k=2, capacity_factor=8.0)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), atol=1e-5, rtol=1e-4)


def test_moe_router_grads_flow(setup):
    experts, router, x = setup

    def loss(rw):
        y, aux = moe_mlp(x, rw, experts, top_k=2, capacity_factor=8.0)
        return jnp.mean(y**2) + 0.01 * aux

    g = jax.grad(loss)(router)
    assert float(jnp.abs(g).max()) > 0


def test_moe_llama_model_decodes():
    """Mixtral-style MoE model family: forward + KV decode + relayout."""
    from bitorch_engine_tpu.models.llama import LlamaModel, init_kv_caches, tiny_llama
    from bitorch_engine_tpu.utils.convert import relayout_params_for_tpu

    cfg = tiny_llama(dtype=jnp.float32, moe_num_experts=4, moe_top_k=2,
                     moe_capacity_factor=8.0, kv_cache_dtype="int8")
    model = LlamaModel(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), toks)
    caches = init_kv_caches(cfg, 2, 32)
    logits, caches = model.apply(params, toks, kv_caches=caches,
                                 cache_len=jnp.zeros((2,), jnp.int32))
    assert bool(jnp.isfinite(logits).all())
    tok = logits[:, -1].argmax(-1)[:, None].astype(jnp.int32)
    for i in range(3):
        lg, caches = model.apply(params, tok,
                                 positions=jnp.full((2, 1), 8 + i, jnp.int32),
                                 kv_caches=caches,
                                 cache_len=jnp.asarray(8 + i, jnp.int32))
        assert bool(jnp.isfinite(lg).all())
        tok = lg[:, -1].argmax(-1)[:, None].astype(jnp.int32)

    # relayout (tuple-form experts are plain MPQTensors) preserves numerics
    params_r = relayout_params_for_tpu(params)
    lg_a, _ = model.apply(params, toks)
    lg_b, _ = model.apply(params_r, toks)
    np.testing.assert_allclose(np.asarray(lg_a), np.asarray(lg_b), atol=2e-3, rtol=2e-3)


def test_moe_llama_aux_loss_sown():
    from bitorch_engine_tpu.models.llama import LlamaModel, tiny_llama

    cfg = tiny_llama(dtype=jnp.float32, moe_num_experts=4)
    model = LlamaModel(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), toks)
    (logits, _), state = model.apply(params, toks, mutable=["losses"])
    aux = jax.tree_util.tree_leaves(state["losses"])
    assert len(aux) == cfg.num_layers
    assert all(float(a) >= 0.99 for a in aux)  # uniform-router floor
