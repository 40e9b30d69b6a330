"""Tensor-parallel Llama: sharded forward/decode must match single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.models.llama import LlamaModel, tiny_llama
from bitorch_engine_tpu.models.llama_sharding import (
    llama_partition_specs,
    shard_llama_params,
)
from bitorch_engine_tpu.parallel import make_mesh
from jax.sharding import PartitionSpec as P


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_llama(dtype=jnp.float32)
    model = LlamaModel(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), tokens)
    return cfg, model, tokens, params


def test_specs_follow_megatron_layout(setup):
    cfg, model, tokens, params = setup
    specs = llama_partition_specs(params)
    p = specs["params"]["layer_0"]
    assert p["attn"]["q_proj"]["qweight"].packed == P(None, "tp")
    assert p["attn"]["o_proj"]["qweight"].packed == P("tp", None)
    assert p["mlp"]["gate_proj"]["qweight"].packed == P(None, "tp")
    assert p["mlp"]["down_proj"]["qweight"].packed == P("tp", None)


def test_tp_forward_matches_single_device(setup):
    cfg, model, tokens, params = setup
    ref, _ = model.apply(params, tokens)

    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_llama_params(params, mesh)
    with mesh:
        out, _ = jax.jit(model.apply)(sharded, tokens)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-4
    )


def test_tp_decode_with_sharded_caches(setup):
    """Decode with tp-sharded params and dp/tp-sharded KV caches matches the
    single-device decode step."""
    from jax.sharding import NamedSharding
    from bitorch_engine_tpu.models.llama import decode_step, init_kv_caches, prefill
    from bitorch_engine_tpu.models.llama_sharding import kv_cache_shardings

    cfg, model, tokens, params = setup
    caches = init_kv_caches(cfg, batch=2, max_len=16)
    ref_logits, ref_caches = prefill(model, params, tokens[:, :4], caches)
    ref_step, _ = decode_step(
        model, params, tokens[:, 4:5], ref_caches, jnp.asarray(4, jnp.int32)
    )

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    sharded_params = shard_llama_params(params, mesh)
    cache_sh = kv_cache_shardings(mesh, cfg.num_layers)
    sharded_caches = [
        (jax.device_put(k, sk), jax.device_put(v, sv))
        for (k, v), (sk, sv) in zip(init_kv_caches(cfg, 2, 16), cache_sh)
    ]
    with mesh:
        plogits, scaches = prefill(model, sharded_params, tokens[:, :4], sharded_caches)
        step_logits, _ = decode_step(
            model, sharded_params, tokens[:, 4:5], scaches, jnp.asarray(4, jnp.int32)
        )
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(ref_step), rtol=5e-4, atol=5e-4
    )
