"""In-place paged-attention kernel vs the gather+softmax reference math.

Interpret-mode (CPU) validation per project convention; the same calls run
un-interpreted on hardware.  The kernel consumes head-major pools
``(pages, nkv, ps, hd)`` and the page table directly (scalar prefetch), and
returns streaming-softmax state that must reproduce a plain masked softmax
over the gathered window — including the two-way merge with a "new token"
block (the serving decode decomposition, docs/DESIGN.md regime 2).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.ops.pallas.paged_attention import (
    merge_attention_parts,
    paged_prefix_attention,
)


def _setup(key, b, nkv, rs, hd, pages, ps, P, quant, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (b, nkv, rs, hd), dtype)
    # rank-3 token-major pools (pages, ps, nkv*hd) — models/paged_kv.py
    if quant:
        k_pool = jax.random.randint(ks[1], (pages, ps, nkv * hd), -127, 128).astype(
            jnp.int8
        )
        v_pool = jax.random.randint(ks[2], (pages, ps, nkv * hd), -127, 128).astype(
            jnp.int8
        )
        # dense per-slot scale caches (slots, L ≥ W, nkv) — L > W here to
        # exercise the kernel wrapper's prefix slice
        k_scale = jax.random.uniform(
            ks[3], (b, P * ps + 8, nkv), jnp.float32, 0.01, 0.03
        )
        v_scale = jax.random.uniform(
            ks[4], (b, P * ps + 8, nkv), jnp.float32, 0.01, 0.03
        )
    else:
        k_pool = jax.random.normal(ks[1], (pages, ps, nkv * hd), dtype)
        v_pool = jax.random.normal(ks[2], (pages, ps, nkv * hd), dtype)
        k_scale = v_scale = None
    # distinct random mapped pages per slot (page 0 = null)
    perm = jax.random.permutation(ks[5], pages - 1)[: b * P] + 1
    table = perm.reshape(b, P).astype(jnp.int32)
    return q, k_pool, v_pool, k_scale, v_scale, table


def _reference(q, k_pool, v_pool, k_scale, v_scale, table, cache_len, sm_scale):
    """Masked softmax over the gathered window (the XLA paged path math)."""
    b, nkv, rs, hd = q.shape
    ps = k_pool.shape[1]
    P = table.shape[1]
    W = P * ps

    def gather(pool):  # (pages, ps, nkv·hd) → (b, nkv, W, hd)
        g = jnp.take(pool, table, axis=0)  # (b, P, ps, nkv·hd)
        return g.reshape(b, W, nkv, hd).transpose(0, 2, 1, 3)

    kf = gather(k_pool).astype(jnp.float32)
    vf = gather(v_pool).astype(jnp.float32)
    if k_scale is not None:

        def window_scale(cache):  # dense (slots, L, nkv) → (b, nkv, W)
            return cache[:, :W].transpose(0, 2, 1)

        kf = kf * window_scale(k_scale)[..., None]
        vf = vf * window_scale(v_scale)[..., None]
    s = jnp.einsum("bgrd,bgkd->bgrk", q.astype(jnp.float32), kf) * sm_scale
    pos = jnp.arange(W)[None, None, None, :]
    valid = pos < jnp.broadcast_to(jnp.asarray(cache_len), (b,))[
        :, None, None, None
    ]
    s = jnp.where(valid, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(valid, p, 0.0)  # rows with no valid cols → zeros
    return jnp.einsum("bgrk,bgkd->bgrd", p, vf)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("cache_len", ["full", "partial", "per_slot"])
def test_prefix_state_matches_reference(quant, cache_len):
    b, nkv, rs, hd, pages, ps, P = 2, 4, 8, 128, 9, 8, 4
    q, kp, vp, ks, vs, tbl = _setup(
        jax.random.PRNGKey(0), b, nkv, rs, hd, pages, ps, P, quant
    )
    W = P * ps
    cl = {
        "full": jnp.full((b,), W, jnp.int32),
        "partial": jnp.full((b,), W - 5, jnp.int32),
        "per_slot": jnp.asarray([W, 11], jnp.int32),
    }[cache_len]
    sm = 1.0 / math.sqrt(hd)
    acc, m, l = paged_prefix_attention(
        q, kp, vp, ks, vs, tbl, cl, sm_scale=sm, interpret=True
    )
    ctx = acc / l[..., :1]
    ref = _reference(q, kp, vp, ks, vs, tbl, cl, sm)
    np.testing.assert_allclose(ctx, ref, atol=2e-5, rtol=1e-4)


def test_merge_with_new_tokens_matches_one_softmax():
    """Kernel prefix state merged with a new-token block must equal one
    softmax over [prefix ++ new] — the serving decode decomposition."""
    b, nkv, rs, hd, pages, ps, P, s_new = 2, 2, 4, 128, 9, 8, 4, 4
    q, kp, vp, ks, vs, tbl = _setup(
        jax.random.PRNGKey(1), b, nkv, rs, hd, pages, ps, P, quant=False
    )
    W = P * ps
    cl = jnp.asarray([W - 3, 9], jnp.int32)
    sm = 1.0 / math.sqrt(hd)
    k_new = jax.random.normal(jax.random.PRNGKey(2), (b, nkv, s_new, hd))
    v_new = jax.random.normal(jax.random.PRNGKey(3), (b, nkv, s_new, hd))

    acc, m, l = paged_prefix_attention(
        q, kp, vp, ks, vs, tbl, cl, sm_scale=sm, interpret=True
    )
    # new-token block state (all rs query rows see all s_new cols here)
    s_n = jnp.einsum("bgrd,bgkd->bgrk", q, k_new) * sm
    m_n = jnp.max(s_n, axis=-1, keepdims=True)
    p_n = jnp.exp(s_n - m_n)
    l_n = jnp.sum(p_n, axis=-1, keepdims=True)
    acc_n = jnp.einsum("bgrk,bgkd->bgrd", p_n, v_new)
    ctx = merge_attention_parts(acc, m, l, acc_n, m_n, l_n)

    # one-softmax reference over the concatenation
    def gather(pool):
        g = jnp.take(pool, tbl, axis=0)  # (b, P, ps, nkv·hd)
        return g.reshape(b, W, nkv, hd).transpose(0, 2, 1, 3)

    k_cat = jnp.concatenate([gather(kp), k_new], axis=2)
    v_cat = jnp.concatenate([gather(vp), v_new], axis=2)
    s_all = jnp.einsum("bgrd,bgkd->bgrk", q, k_cat) * sm
    pos = jnp.arange(W + s_new)[None, None, None, :]
    valid = (pos < cl[:, None, None, None]) | (pos >= W)
    s_all = jnp.where(valid, s_all, -jnp.inf)
    ref = jnp.einsum(
        "bgrk,bgkd->bgrd", jax.nn.softmax(s_all, axis=-1), v_cat
    )
    np.testing.assert_allclose(ctx, ref, atol=2e-5, rtol=1e-4)


def test_empty_prefix_merge_is_new_only():
    """cache_len = 0 (fresh slot): merged output equals softmax over the
    new tokens alone — the all-masked prefix contributes exactly zero."""
    b, nkv, rs, hd, pages, ps, P = 1, 2, 2, 128, 5, 8, 2
    q, kp, vp, ks, vs, tbl = _setup(
        jax.random.PRNGKey(4), b, nkv, rs, hd, pages, ps, P, quant=False
    )
    sm = 1.0 / math.sqrt(hd)
    acc, m, l = paged_prefix_attention(
        q, kp, vp, ks, vs, tbl, jnp.zeros((b,), jnp.int32),
        sm_scale=sm, interpret=True,
    )
    k_new = jax.random.normal(jax.random.PRNGKey(5), (b, nkv, 3, hd))
    v_new = jax.random.normal(jax.random.PRNGKey(6), (b, nkv, 3, hd))
    s_n = jnp.einsum("bgrd,bgkd->bgrk", q, k_new) * sm
    m_n = jnp.max(s_n, axis=-1, keepdims=True)
    p_n = jnp.exp(s_n - m_n)
    l_n = jnp.sum(p_n, axis=-1, keepdims=True)
    acc_n = jnp.einsum("bgrk,bgkd->bgrd", p_n, v_new)
    ctx = merge_attention_parts(acc, m, l, acc_n, m_n, l_n)
    ref = jnp.einsum(
        "bgrk,bgkd->bgrd", jax.nn.softmax(s_n, axis=-1), v_new
    )
    np.testing.assert_allclose(ctx, ref, atol=2e-5, rtol=1e-4)


def _llama_paged_decode(monkeypatch, mode):
    """Prefill + 4 windowed decode steps on a paged cache; returns logits
    per step with the paged-attention path selected by ``mode``."""
    from bitorch_engine_tpu.models.llama import LlamaModel, tiny_llama
    from bitorch_engine_tpu.models.paged_kv import init_paged_kv_caches

    monkeypatch.setenv("BITORCH_PAGED_KERNEL", mode)
    cfg = tiny_llama(
        dtype=jnp.float32,
        hidden_size=512,
        num_heads=4,
        num_kv_heads=2,  # head_dim 128: the kernel's lane-tile gate
        kv_cache_dtype="int8",
    )
    model = LlamaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    b, plen, ps, P = 2, 4, 8, 4
    toks = jax.random.randint(jax.random.PRNGKey(1), (b, plen), 0, cfg.vocab_size)
    caches = init_paged_kv_caches(cfg, 1 + b * P, ps, b, P)
    table = jnp.asarray(1 + np.arange(b * P).reshape(b, P), jnp.int32)
    caches = [c.replace(page_table=table) for c in caches]

    outs = []
    logits, caches = model.apply(
        params, toks, kv_caches=caches,
        cache_len=jnp.zeros((b,), jnp.int32), attn_window=0,
    )
    outs.append(np.asarray(logits[:, -1]))
    cur = jnp.argmax(logits[:, -1], -1)[:, None]
    pos = jnp.full((b,), plen, jnp.int32)
    for _ in range(4):
        logits, caches = model.apply(
            params, cur, positions=pos[:, None], kv_caches=caches,
            cache_len=pos, attn_window=16,  # < view_len 32 → two-part regime
        )
        outs.append(np.asarray(logits[:, -1]))
        cur = jnp.argmax(logits[:, -1], -1)[:, None]
        pos = pos + 1
    return outs


def test_llama_kernel_path_matches_gather_path(monkeypatch):
    """Windowed paged decode through the in-place kernel (interpret mode)
    vs the XLA gather path: logits agree to reduction-order ulps and the
    greedy tokens are identical."""
    gather = _llama_paged_decode(monkeypatch, "0")
    kernel = _llama_paged_decode(monkeypatch, "interpret")
    for step, (g, k) in enumerate(zip(gather, kernel)):
        np.testing.assert_allclose(
            g, k, atol=2e-4, rtol=1e-3, err_msg=f"step {step}"
        )
        np.testing.assert_array_equal(
            g.argmax(-1), k.argmax(-1), err_msg=f"tokens step {step}"
        )


def test_writeback_kernel_matches_xla_write():
    """paged_prefix_attention_update == v2 attention + per-slot XLA dus
    writes, bit-exact on pools/scales (interpret mode), int8 and bf16."""
    from bitorch_engine_tpu.ops.pallas.paged_attention import (
        paged_prefix_attention_update,
    )

    b, nkv, rs, hd, pages, ps, P = 2, 4, 8, 128, 9, 8, 4
    for quant in (True, False):
        ks = jax.random.split(jax.random.PRNGKey(7 + quant), 10)
        q = jax.random.normal(ks[0], (b, nkv, rs, hd), jnp.float32)
        if quant:
            kp0 = jax.random.randint(ks[1], (pages, ps, nkv * hd), -127, 128).astype(jnp.int8)
            vp0 = jax.random.randint(ks[2], (pages, ps, nkv * hd), -127, 128).astype(jnp.int8)
            # dense per-slot scale caches (slots, L, nkv)
            ks0 = jax.random.uniform(ks[3], (b, P * ps, nkv), jnp.float32, 0.01, 0.03)
            vs0 = jax.random.uniform(ks[4], (b, P * ps, nkv), jnp.float32, 0.01, 0.03)
            kn = jax.random.randint(ks[6], (b, nkv * hd), -127, 128).astype(jnp.int8)
            vn = jax.random.randint(ks[7], (b, nkv * hd), -127, 128).astype(jnp.int8)
            ksn = jax.random.uniform(ks[8], (b, nkv), jnp.float32, 0.01, 0.03)
            vsn = jax.random.uniform(ks[9], (b, nkv), jnp.float32, 0.01, 0.03)
        else:
            kp0 = jax.random.normal(ks[1], (pages, ps, nkv * hd), jnp.float32)
            vp0 = jax.random.normal(ks[2], (pages, ps, nkv * hd), jnp.float32)
            ks0 = vs0 = ksn = vsn = None
            kn = jax.random.normal(ks[6], (b, nkv * hd), jnp.float32)
            vn = jax.random.normal(ks[7], (b, nkv * hd), jnp.float32)
        perm = jax.random.permutation(ks[5], pages - 1)[: b * P] + 1
        tbl = perm.reshape(b, P).astype(jnp.int32)
        cl = jnp.asarray([13, 27], jnp.int32)
        sm = 1.0 / math.sqrt(hd)

        acc0, m0, l0 = paged_prefix_attention(
            q, kp0, vp0, ks0, vs0, tbl, cl, sm_scale=sm, interpret=True
        )

        def xla_write(pool, upd, cols):
            out = pool
            for i in range(b):
                pg = tbl[i, cl[i] // ps]
                out = jax.lax.dynamic_update_slice(
                    out, upd[i][None, None], (pg, cl[i] % ps, 0)
                )
            return out

        def scale_write(cache, upd):
            # dense positional write (the model's dense-cache dus form)
            out = cache
            for i in range(b):
                out = jax.lax.dynamic_update_slice(
                    out, upd[i][None, None], (i, cl[i], 0)
                )
            return out

        # int8 mode: the caller writes the dense scale caches in XLA first
        # and passes the post-update caches for the window slice (the
        # kernel's pos < cache_len mask excludes the new position)
        ks1 = scale_write(ks0, ksn) if quant else None
        vs1 = scale_write(vs0, vsn) if quant else None
        acc, m, l, kp, vp = paged_prefix_attention_update(
            q, kp0, vp0, ks1, vs1, tbl, cl, kn, vn,
            sm_scale=sm, interpret=True,
        )
        np.testing.assert_allclose(acc, acc0, rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(m), np.asarray(m0))
        np.testing.assert_array_equal(np.asarray(l), np.asarray(l0))
        np.testing.assert_array_equal(np.asarray(kp), np.asarray(xla_write(kp0, kn, None)))
        np.testing.assert_array_equal(np.asarray(vp), np.asarray(xla_write(vp0, vn, None)))
