"""Quantized MoE with expert parallelism (greenfield: the reference is
dense-only).  Differential tests per the repo convention: routed dispatch
vs brute-force expert application, incl. Mixtral renormalized-gate
semantics and the drop-free serving capacity."""

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


def _brute(experts, router, x, top_k, renormalize):
    """Dense per-token evaluation — the Mixtral forward when renormalize."""
    logits = x @ router
    probs = jax.nn.softmax(logits, -1)
    vals, idx = jax.lax.top_k(probs, top_k)
    if renormalize:
        vals = vals / vals.sum(-1, keepdims=True)
    per_e = jnp.stack([_expert_mlp(_expert_slice(experts, e), x) for e in range(E)])
    y = jnp.zeros_like(x)
    for t in range(x.shape[0]):
        for j in range(top_k):
            y = y.at[t].add(vals[t, j] * per_e[idx[t, j], t])
    return y


@pytest.mark.parametrize("top_k", [1, 2])
@pytest.mark.parametrize("renormalize", [False, True])
def test_moe_matches_bruteforce(setup, top_k, renormalize):
    experts, router, x = setup
    # drop-free capacity -> must match the dense evaluation exactly
    y, aux, dropped = moe_mlp(
        x, router, experts, top_k=top_k, capacity_factor=None, renormalize=renormalize
    )
    ref = _brute(experts, router, x, top_k, renormalize)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5, rtol=1e-4)
    assert float(aux) >= 1.0 - 1e-6  # uniform router floor
    assert float(dropped) == 0.0


def test_moe_renormalized_gates_sum_to_one(setup):
    """Renormalized top-k output is a convex combination of expert outputs:
    scaling the router leaves a single-expert-dominant token's output
    bounded by the max expert output (raw softmax gates would shrink it)."""
    experts, router, x = setup
    y_renorm, _, _ = moe_mlp(x, router, experts, top_k=2,
                             capacity_factor=None, renormalize=True)
    y_raw, _, _ = moe_mlp(x, router, experts, top_k=2,
                          capacity_factor=None, renormalize=False)
    # raw gate weights sum < 1, renormalized == 1: outputs must differ and
    # renormalized output == raw output / sum(top-k probs) per token
    logits = x @ router
    vals, _ = jax.lax.top_k(jax.nn.softmax(logits, -1), 2)
    s = vals.sum(-1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(y_renorm), np.asarray(y_raw / s), atol=1e-5, rtol=1e-4
    )


def test_moe_dropfree_capacity_never_drops():
    """Adversarial routing skew: all tokens route to the same expert; with
    capacity_factor=None nothing is dropped and the output matches dense."""
    key = jax.random.PRNGKey(3)
    experts = init_moe_experts(key, E, D, I, w_bit=4, group_size=32)
    # router that sends every token to experts 0 and 1
    router = jnp.zeros((D, E), jnp.float32).at[:, 0].set(0.2).at[:, 1].set(0.1)
    x = jax.random.normal(jax.random.PRNGKey(4), (32, D), jnp.float32)
    y, _, dropped = moe_mlp(x, router, experts, top_k=2,
                            capacity_factor=None, renormalize=True)
    assert float(dropped) == 0.0
    ref = _brute(experts, router, x, 2, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5, rtol=1e-4)
    # the same skew under a tight Switch capacity IS dropped and reported
    y_t, _, dropped_t = moe_mlp(x, router, experts, top_k=2,
                                capacity_factor=1.0, renormalize=True)
    assert float(dropped_t) > 0.0


def test_moe_capacity_drops_are_partial(setup):
    experts, router, x = setup
    y_full, _, d_full = moe_mlp(x, router, experts, top_k=2, capacity_factor=None)
    y_tight, _, d_tight = moe_mlp(x, router, experts, top_k=2, capacity_factor=0.5)
    # tokens past capacity lose that expert's contribution but the output stays
    # finite and some rows still match (early tokens keep their slots)
    assert bool(jnp.isfinite(y_tight).all())
    assert not np.allclose(np.asarray(y_full), np.asarray(y_tight))
    assert float(d_full) == 0.0 and float(d_tight) > 0.0
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
        y_sh, aux, _ = jax.jit(
            lambda ex, xx: moe_mlp(xx, router, ex, top_k=2, capacity_factor=None)
        )(experts_sh, x_sh)
    y_ref, _, _ = moe_mlp(x, router, experts, top_k=2, capacity_factor=None)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), atol=1e-5, rtol=1e-4)


def test_moe_router_grads_flow(setup):
    experts, router, x = setup

    def loss(rw):
        y, aux, _ = moe_mlp(x, rw, experts, top_k=2, capacity_factor=None)
        return jnp.mean(y**2) + 0.01 * aux

    g = jax.grad(loss)(router)
    assert float(jnp.abs(g).max()) > 0


def test_moe_llama_model_decodes():
    """Mixtral-style MoE model family: forward + KV decode + relayout."""
    from bitorch_engine_tpu.models.llama import LlamaModel, init_kv_caches, tiny_llama
    from bitorch_engine_tpu.utils.convert import relayout_params_for_tpu

    cfg = tiny_llama(dtype=jnp.float32, moe_num_experts=4, moe_top_k=2,
                     kv_cache_dtype="int8")
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
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(state["losses"])[0]
    aux = [v for k, v in leaves_with_paths if "moe_aux" in jax.tree_util.keystr(k)]
    dropped = [v for k, v in leaves_with_paths if "moe_dropped" in jax.tree_util.keystr(k)]
    assert len(aux) == cfg.num_layers
    assert len(dropped) == cfg.num_layers
    assert all(float(a) >= 0.99 for a in aux)  # uniform-router floor
    assert all(float(d) == 0.0 for d in dropped)  # drop-free default
