"""Paged KV cache: bit-exactness vs the dense cache + allocator behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.models.llama import (
    LlamaModel,
    init_kv_caches,
    tiny_llama,
)
from bitorch_engine_tpu.models.paged_kv import (
    PageAllocator,
    init_paged_kv_caches,
)


def _decode_both(kv_cache_dtype, table_fn, page_size=8, num_pages=None):
    """Run prefill + 4 decode steps with dense and paged caches; return
    the two logits sequences."""
    cfg = tiny_llama(dtype=jnp.float32, kv_cache_dtype=kv_cache_dtype)
    model = LlamaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    b, plen, max_len = 3, 4, 32
    P = max_len // page_size
    num_pages = num_pages or (1 + b * P)
    toks = jax.random.randint(jax.random.PRNGKey(1), (b, plen), 0, cfg.vocab_size)

    dense = init_kv_caches(cfg, b, max_len)
    paged = init_paged_kv_caches(cfg, num_pages, page_size, b, P)
    table = jnp.asarray(table_fn(b, P), jnp.int32)
    paged = [c.replace(page_table=table) for c in paged]

    outs = {"dense": [], "paged": []}
    for name, caches in (("dense", dense), ("paged", paged)):
        logits, caches = model.apply(
            params, toks, kv_caches=caches, cache_len=jnp.zeros((b,), jnp.int32)
        )
        outs[name].append(np.asarray(logits[:, -1]))
        cur = jnp.argmax(logits[:, -1], -1)[:, None]
        pos = jnp.full((b,), plen, jnp.int32)
        for _ in range(4):
            logits, caches = model.apply(
                params,
                cur,
                positions=pos[:, None],
                kv_caches=caches,
                cache_len=pos,
            )
            outs[name].append(np.asarray(logits[:, -1]))
            cur = jnp.argmax(logits[:, -1], -1)[:, None]
            pos = pos + 1
    return outs["dense"], outs["paged"]


def _identity_table(b, P):
    return 1 + np.arange(b * P).reshape(b, P)


def _shuffled_table(b, P):
    rng = np.random.default_rng(7)
    pages = rng.permutation(b * P) + 1
    return pages.reshape(b, P)


@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
@pytest.mark.parametrize("table", [_identity_table, _shuffled_table])
def test_paged_matches_dense_bitexact(kv_dtype, table):
    dense, paged = _decode_both(kv_dtype, table)
    for step, (d, p) in enumerate(zip(dense, paged)):
        np.testing.assert_array_equal(d, p, err_msg=f"step {step}")


def test_paged_capacity_below_dense():
    """A pool smaller than slots*max_len still decodes exactly, as long as
    the mapped pages cover the tokens actually written."""
    b, page_size, P = 3, 8, 4  # slots need <=2 pages each (4+1+4 tokens < 16)
    # pool with only 7 usable pages instead of b*P=12
    def tight_table(b_, P_):
        t = np.zeros((b_, P_), np.int32)
        nxt = 1
        for s in range(b_):
            for j in range(2):  # two mapped pages per slot
                t[s, j] = nxt
                nxt += 1
        return t

    dense, paged = _decode_both("int8", tight_table, page_size=page_size, num_pages=8)
    for step, (d, p) in enumerate(zip(dense, paged)):
        np.testing.assert_array_equal(d, p, err_msg=f"step {step}")


def test_page_allocator():
    al = PageAllocator(num_pages=8, page_size=8, slots=3, pages_per_slot=4)
    assert al.alloc(0, tokens=20)  # 3 pages
    assert al.alloc(1, tokens=8)  # 1 page
    assert sorted(al.table[0][al.table[0] > 0].tolist()) == [1, 2, 3]
    assert al.table[1][0] == 4
    assert al.can_alloc(24) and not al.can_alloc(32)  # 3 free pages left
    assert not al.alloc(2, tokens=32)  # exhausted → False, nothing changed
    assert al.table[2].sum() == 0
    al.free_slot(0)
    assert al.alloc(2, tokens=32)  # 4 pages now available
    with pytest.raises(ValueError, match="pages_per_slot"):
        al.alloc(1, tokens=1000)
    # page 0 never allocated
    assert 0 not in np.concatenate([al.table[s] for s in range(3)])[
        np.concatenate([al.table[s] for s in range(3)]) > 0
    ]


def _batcher_outputs(model, params, prompts, n_new, **kw):
    from bitorch_engine_tpu.models.generate import ContinuousBatcher

    b = ContinuousBatcher(model, params, **kw)
    for p in prompts:
        b.submit(p, max_new_tokens=n_new)
    return {r.uid: r.generated for r in b.run()}, b


@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
@pytest.mark.parametrize("chunk", [1, 4])
def test_batcher_paged_matches_dense(kv_dtype, chunk):
    cfg = tiny_llama(dtype=jnp.float32, kv_cache_dtype=kv_dtype)
    model = LlamaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, cfg.vocab_size, size=l).tolist() for l in (4, 6, 3, 5, 7)]

    dense, _ = _batcher_outputs(
        model, params, prompts, 5, num_slots=2, max_len=32, decode_chunk=chunk
    )
    paged, pb = _batcher_outputs(
        model,
        params,
        prompts,
        5,
        num_slots=2,
        max_len=32,
        decode_chunk=chunk,
        kv_pages=9,  # 8 usable pages of 8 = 64 tokens << 2*32 dense... equal here
        kv_page_size=8,
    )
    assert dense == paged
    # all pages returned to the free list after the drain
    assert len(pb.allocator.free) == 8
    assert (pb.allocator.table == 0).all()


def test_batcher_paged_tight_pool_reuses_pages():
    """Usable capacity (3 pages = 24 tokens) < num_slots*max_len (64):
    requests must serialize through the pool and still decode exactly."""
    cfg = tiny_llama(dtype=jnp.float32, kv_cache_dtype="int8")
    model = LlamaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    rng = np.random.default_rng(12)
    prompts = [rng.integers(0, cfg.vocab_size, size=l).tolist() for l in (5, 6, 4, 7)]

    dense, _ = _batcher_outputs(model, params, prompts, 6, num_slots=2, max_len=32)
    paged, pb = _batcher_outputs(
        model, params, prompts, 6, num_slots=2, max_len=32,
        kv_pages=4, kv_page_size=8,  # 3 usable pages: one 13-token request + one more at best
    )
    assert dense == paged
    assert len(pb.allocator.free) == 3


def test_batcher_paged_pool_too_small_raises():
    cfg = tiny_llama(dtype=jnp.float32)
    model = LlamaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    from bitorch_engine_tpu.models.generate import ContinuousBatcher

    b = ContinuousBatcher(
        model, params, num_slots=2, max_len=32, kv_pages=2, kv_page_size=8
    )
    b.submit(list(range(1, 7)), max_new_tokens=20)  # needs 26 tokens > 8 usable
    with pytest.raises(RuntimeError, match="page pool too small"):
        b.run()
