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
