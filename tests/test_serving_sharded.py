"""Multi-host-shaped serving: the ContinuousBatcher driving a dp×tp-sharded
decode step (sharded params, sharded dense or paged KV caches) must produce
the same tokens as the unsharded batcher, across mesh shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.models.generate import ContinuousBatcher
from bitorch_engine_tpu.models.llama import LlamaModel, tiny_llama
from bitorch_engine_tpu.models.llama_sharding import shard_llama_params
from bitorch_engine_tpu.parallel import make_mesh


def _mesh(dp, tp):
    return make_mesh(dp=dp, tp=tp, devices=jax.devices()[: dp * tp])


@pytest.fixture(scope="module", params=["bf16", "int8"])
def setup(request):
    cfg = tiny_llama(dtype=jnp.float32, kv_cache_dtype=request.param)
    model = LlamaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    rng = np.random.default_rng(21)
    prompts = [
        rng.integers(0, cfg.vocab_size, size=l).tolist() for l in (4, 6, 3, 5, 7, 4)
    ]
    return cfg, model, params, prompts


def _run(model, params, prompts, **kw):
    b = ContinuousBatcher(model, params, num_slots=4, max_len=32, **kw)
    for p in prompts:
        b.submit(p, max_new_tokens=5)
    return {r.uid: r.generated for r in b.run()}


@pytest.mark.parametrize("mesh_shape", [(2, 2), (4, 2), (2, 1)])
def test_sharded_batcher_matches_unsharded_dense(setup, mesh_shape):
    cfg, model, params, prompts = setup
    ref = _run(model, params, prompts)
    dp, tp = mesh_shape
    mesh = _mesh(dp, tp)
    sharded_params = shard_llama_params(params, mesh)
    out = _run(model, sharded_params, prompts, mesh=mesh)
    assert out == ref


@pytest.mark.parametrize("chunk", [1, 4])
def test_sharded_batcher_matches_unsharded_paged(setup, chunk):
    """Paged pools (tp-sharded heads, dp-grouped page ranges) + dp-sharded
    page table, with and without chunked decode."""
    cfg, model, params, prompts = setup
    ref = _run(model, params, prompts, decode_chunk=chunk)
    mesh = _mesh(2, 2)
    sharded_params = shard_llama_params(params, mesh)
    out = _run(
        model,
        sharded_params,
        prompts,
        mesh=mesh,
        decode_chunk=chunk,
        kv_pages=17,  # 16 usable pages of 8 → 8 per dp group
        kv_page_size=8,
    )
    assert out == ref


def test_sharded_paged_allocation_stays_in_dp_group(setup):
    """Slots 0-1 (dp group 0) must only ever hold pages from group 0's
    range, slots 2-3 from group 1's — the no-cross-dp-traffic invariant."""
    cfg, model, params, prompts = setup
    mesh = _mesh(2, 2)
    sharded_params = shard_llama_params(params, mesh)
    b = ContinuousBatcher(
        model,
        sharded_params,
        num_slots=4,
        max_len=32,
        mesh=mesh,
        kv_pages=17,
        kv_page_size=8,
    )
    for p in prompts:
        b.submit(p, max_new_tokens=5)
    b._admit()
    tbl = b.allocator.table
    g0 = tbl[:2][tbl[:2] > 0]
    g1 = tbl[2:][tbl[2:] > 0]
    assert g0.size and g1.size
    assert g0.max() <= 8 and g1.min() >= 9
    b.run()


def test_sharded_batcher_rejects_bad_slot_split(setup):
    cfg, model, params, prompts = setup
    mesh = _mesh(4, 2)
    with pytest.raises(ValueError, match="divisible by dp"):
        ContinuousBatcher(model, params, num_slots=6, max_len=32, mesh=mesh)
