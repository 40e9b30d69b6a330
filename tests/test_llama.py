"""Llama model tests: forward, quantized-vs-fp parity, KV-cache decode
consistency (decode must reproduce teacher-forced logits)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.models.llama import (
    LlamaModel,
    decode_step,
    init_kv_caches,
    prefill,
    tiny_llama,
)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_llama(dtype=jnp.float32)
    model = LlamaModel(cfg)
    tokens = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    return cfg, model, params


def test_forward_shape(tiny_model):
    cfg, model, params = tiny_model
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)
    logits, _ = model.apply(params, tokens)
    assert logits.shape == (2, 8, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_causality(tiny_model):
    """Changing a future token must not change past logits."""
    cfg, model, params = tiny_model
    t1 = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, cfg.vocab_size)
    t2 = t1.at[0, 7].set((t1[0, 7] + 1) % cfg.vocab_size)
    l1, _ = model.apply(params, t1)
    l2, _ = model.apply(params, t2)
    np.testing.assert_allclose(
        np.asarray(l1[0, :7]), np.asarray(l2[0, :7]), rtol=1e-5, atol=1e-5
    )


def test_decode_matches_teacher_forcing(tiny_model):
    """Prefill+decode logits must match the full-sequence forward pass."""
    cfg, model, params = tiny_model
    seq = 8
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, seq), 0, cfg.vocab_size)
    full_logits, _ = model.apply(params, tokens)

    # prefill on the first 4 tokens, decode the rest one at a time
    caches = init_kv_caches(cfg, batch=1, max_len=16)
    plogits, caches = prefill(model, params, tokens[:, :4], caches)
    np.testing.assert_allclose(
        np.asarray(plogits), np.asarray(full_logits[:, :4]), rtol=2e-4, atol=2e-4
    )
    for i in range(4, seq):
        step_logits, caches = decode_step(
            model, params, tokens[:, i : i + 1], caches, jnp.asarray(i, jnp.int32)
        )
        np.testing.assert_allclose(
            np.asarray(step_logits),
            np.asarray(full_logits[:, i]),
            rtol=2e-4,
            atol=2e-4,
        )


def test_quantized_close_to_fp():
    """4-bit model built from the fp model's weights stays close in logits."""
    cfg_fp = tiny_llama(quantized=False, dtype=jnp.float32)
    model_fp = LlamaModel(cfg_fp)
    tokens = jax.random.randint(jax.random.PRNGKey(4), (1, 8), 0, cfg_fp.vocab_size)
    params_fp = model_fp.init(jax.random.PRNGKey(5), tokens)

    cfg_q = tiny_llama(quantized=True, dtype=jnp.float32, w_bit=4, group_size=64)
    model_q = LlamaModel(cfg_q)
    params_q_init = model_q.init(jax.random.PRNGKey(5), tokens)

    # quantize the fp kernels into the quantized model's structure
    # (flax Dense stores 'kernel' (K, N); MPQLinear stores 'qweight')
    from bitorch_engine_tpu.ops import quant as q

    def convert(tree):
        if isinstance(tree, dict):
            out = {}
            for key, val in tree.items():
                if isinstance(val, dict) and set(val) == {"kernel"}:
                    out[key] = {
                        "qweight": q.quantize_mpq(val["kernel"], w_bit=4, group_size=64)
                    }
                else:
                    out[key] = convert(val)
            return out
        return tree

    converted = convert(jax.tree_util.tree_map(lambda x: x, params_fp))
    # structures should now match the quantized model's params
    chex_msg = (
        jax.tree_util.tree_structure(converted),
        jax.tree_util.tree_structure(params_q_init),
    )
    assert str(chex_msg[0]) == str(chex_msg[1]), chex_msg

    l_fp, _ = model_fp.apply(params_fp, tokens)
    l_q, _ = model_q.apply(converted, tokens)
    p_fp = jax.nn.softmax(l_fp, axis=-1)
    p_q = jax.nn.softmax(l_q, axis=-1)
    tv = 0.5 * float(jnp.abs(p_fp - p_q).sum(-1).mean())
    assert tv < 0.15, tv


def test_mbwq_llama_2bit_greenbit_config():
    """configs[3] structure: Llama with channel-mixed-bit projections."""
    cfg = tiny_llama(
        dtype=jnp.float32,
        mbwq_strategy=((4, 0.25), (2, 0.75)),
        group_size=32,
    )
    model = LlamaModel(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (1, 8), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), tokens)
    logits, _ = model.apply(params, tokens)
    assert logits.shape == (1, 8, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    # average bits ≈ 2.5
    from bitorch_engine_tpu.ops.mbwq_linear import average_bits

    qt = params["params"]["layer_0"]["attn"]["q_proj"]["qweight"]
    assert abs(average_bits(qt) - 2.5) < 0.3


def test_int8_kv_cache_decode_close_to_bf16():
    """int8 KV cache decode tracks the bf16-cache decode closely."""
    cfg = tiny_llama(dtype=jnp.float32)
    cfg8 = tiny_llama(dtype=jnp.float32, kv_cache_dtype="int8")
    model, model8 = LlamaModel(cfg), LlamaModel(cfg8)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (1, 8), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), tokens)

    caches = init_kv_caches(cfg, 1, 16)
    caches8 = init_kv_caches(cfg8, 1, 16)
    l1, caches = prefill(model, params, tokens[:, :4], caches)
    l2, caches8 = prefill(model8, params, tokens[:, :4], caches8)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=0.05, atol=0.05)
    for i in range(4, 8):
        s1, caches = decode_step(
            model, params, tokens[:, i : i + 1], caches, jnp.asarray(i, jnp.int32)
        )
        s2, caches8 = decode_step(
            model8, params, tokens[:, i : i + 1], caches8, jnp.asarray(i, jnp.int32)
        )
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(s2), rtol=0.05, atol=0.08
        )
    # int8 cache really is int8
    assert caches8[0][0].dtype == jnp.int8


def test_quantized_embed_close_to_fp():
    """int8 tied embed/lm_head tracks the fp embedding closely."""
    cfg = tiny_llama(dtype=jnp.float32)
    cfg8 = tiny_llama(dtype=jnp.float32, quantize_embed=True)
    model, model8 = LlamaModel(cfg), LlamaModel(cfg8)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (1, 8), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), tokens)
    # build the int8 model's params from the same fp table
    e = params["params"]["embed"]
    import numpy as _np

    scale = _np.maximum(_np.abs(_np.asarray(e)).max(axis=1), 1e-6) / 127.0
    q = _np.clip(_np.round(_np.asarray(e) / scale[:, None]), -127, 127).astype(
        _np.int8
    )
    params8 = jax.tree_util.tree_map(lambda x: x, params)
    params8["params"]["embed"] = {
        "data": jnp.asarray(q),
        "scale": jnp.asarray(scale.astype(_np.float32)),
    }
    l1, _ = model.apply(params, tokens)
    l2, _ = model8.apply(params8, tokens)
    # logits track within int8 quantization error of the embedding
    p1 = jax.nn.softmax(l1, -1)
    p2 = jax.nn.softmax(l2, -1)
    tv = 0.5 * float(jnp.abs(p1 - p2).sum(-1).mean())
    assert tv < 0.1, tv


def test_relayout_params_preserves_numerics(tiny_model):
    """tpu_tiled relayout of a whole params tree changes nothing numerically."""
    from bitorch_engine_tpu.utils import relayout_params_for_tpu

    cfg, model, params = tiny_model
    tokens = jax.random.randint(jax.random.PRNGKey(9), (1, 8), 0, cfg.vocab_size)
    ref, _ = model.apply(params, tokens)
    rl = relayout_params_for_tpu(params)
    qt = rl["params"]["layer_0"]["attn"]["q_proj"]["qweight"]
    assert qt.layout == "tpu_pair"  # canonical kernel layout for 4-bit
    out, _ = model.apply(rl, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_relayout_params_mbwq():
    from bitorch_engine_tpu.utils import relayout_params_for_tpu

    cfg = tiny_llama(
        dtype=jnp.float32, mbwq_strategy=((4, 0.5), (2, 0.5)), group_size=32
    )
    model = LlamaModel(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (1, 4), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), tokens)
    ref, _ = model.apply(params, tokens)
    rl = relayout_params_for_tpu(params)
    seg = rl["params"]["layer_0"]["attn"]["q_proj"]["qweight"].segments[0]
    assert seg.layout == "tpu_pair"
    out, _ = model.apply(rl, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_w4_lm_head_decode():
    """head_w_bit=4: untied MPQ lm_head — logits match the dequantized head."""
    from bitorch_engine_tpu.ops import quant

    cfg = tiny_llama(dtype=jnp.float32, head_w_bit=4, quantize_embed=True)
    model = LlamaModel(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 4), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), tokens)
    logits, _ = model.apply(params, tokens)
    assert logits.shape == (2, 4, cfg.vocab_size)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))
    # the untied head is a real MPQTensor in the tree (relayout/sharding see it)
    qt = params["params"]["lm_head"]["qweight"]
    assert quant.dequantize_mpq(qt, dtype=jnp.float32).shape == (
        cfg.hidden_size,
        cfg.vocab_size,
    )
    # cached prefill must agree with the cache-free forward
    caches = init_kv_caches(cfg, 2, 16)
    pre_logits, caches = model.apply(
        params, tokens, positions=None, kv_caches=caches, cache_len=jnp.asarray(0, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(pre_logits), np.asarray(logits), rtol=2e-4, atol=2e-4
    )


def test_fused_qkv_gate_up_exact():
    """Fused q|k|v and gate|up projections are the unfused model, exactly.

    concat-then-matmul computes the same per-output-column dot products as
    separate matmuls (reduction order per column depends only on K), and
    quantize-then-concat == concat-then-quantize for group quantization, so
    the fused model must reproduce the unfused logits bit-for-bit.
    """
    from bitorch_engine_tpu.models.llama import fuse_llama_params

    cfg = tiny_llama()
    model = LlamaModel(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(5), (2, 8), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), tokens)
    ref_logits, _ = jax.jit(model.apply)(params, tokens)

    cfg_f = tiny_llama(fuse_qkv=True, fuse_gate_up=True)
    model_f = LlamaModel(cfg_f)
    params_f = fuse_llama_params(params)
    fused_logits, _ = jax.jit(model_f.apply)(params_f, tokens)
    np.testing.assert_array_equal(np.asarray(ref_logits), np.asarray(fused_logits))

    # decode path with int8 KV caches
    cfg8 = tiny_llama(kv_cache_dtype="int8")
    cfg8_f = tiny_llama(kv_cache_dtype="int8", fuse_qkv=True, fuse_gate_up=True)
    m8, m8f = LlamaModel(cfg8), LlamaModel(cfg8_f)
    caches = init_kv_caches(cfg8, batch=2, max_len=16)
    caches_f = init_kv_caches(cfg8_f, batch=2, max_len=16)
    for i in range(4):
        tok = tokens[:, i : i + 1]
        l_ref, caches = decode_step(m8, params, tok, caches, jnp.asarray(i, jnp.int32))
        l_f, caches_f = decode_step(
            m8f, params_f, tok, caches_f, jnp.asarray(i, jnp.int32)
        )
        np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_f))


def test_fused_fp_dense_exact():
    """fuse_llama_params also fuses fp (non-quantized) Dense kernels."""
    from bitorch_engine_tpu.models.llama import fuse_llama_params

    cfg = tiny_llama(quantized=False)
    model = LlamaModel(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(6), (1, 4), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(2), tokens)
    ref_logits, _ = model.apply(params, tokens)

    cfg_f = tiny_llama(quantized=False, fuse_qkv=True, fuse_gate_up=True)
    fused_logits, _ = LlamaModel(cfg_f).apply(fuse_llama_params(params), tokens)
    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(fused_logits), rtol=1e-6, atol=1e-6
    )


def test_head_padding_logits_match():
    """head_pad_to pads the quantized lm_head's N and slices logits back —
    same logits as the unpadded head on the shared columns (padded columns
    quantize to exact zeros and are sliced away)."""
    from bitorch_engine_tpu.models.llama import fuse_llama_params  # noqa: F401
    from bitorch_engine_tpu.ops.quant import quantize_mpq

    cfg = tiny_llama(head_w_bit=4, vocab_size=250)  # 250 not 128-aligned? pad to 256
    cfg_p = tiny_llama(head_w_bit=4, vocab_size=250, head_pad_to=128)
    # build shared fp head + params via init on the unpadded model, then
    # re-quantize the padded head from the same fp matrix
    model, model_p = LlamaModel(cfg), LlamaModel(cfg_p)
    tokens = jnp.zeros((1, 4), jnp.int32)
    rng = np.random.default_rng(0)
    head_fp = rng.standard_normal((cfg.hidden_size, 250)).astype(np.float32) * 0.02

    params = model.init(jax.random.PRNGKey(0), tokens)
    params["params"]["lm_head"]["qweight"] = quantize_mpq(
        jnp.asarray(head_fp), w_bit=4, group_size=128
    )
    params_p = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    head_pad = np.pad(head_fp, ((0, 0), (0, 256 - 250)))
    params_p["params"] = dict(params_p["params"])
    params_p["params"]["lm_head"] = {
        "qweight": quantize_mpq(jnp.asarray(head_pad), w_bit=4, group_size=128)
    }

    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 250)
    ref, _ = model.apply(params, toks)
    out, _ = model_p.apply(params_p, toks)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_qwen_style_bias_and_fusion():
    """Qwen2-style q/k/v biases: present in the tree, honored by decode, and
    carried through fuse_llama_params (biases concatenate with the weights)."""
    from bitorch_engine_tpu.models.llama import fuse_llama_params

    cfg = tiny_llama(attn_qkv_bias=True)
    model = LlamaModel(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(7), (2, 6), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(3), tokens)
    attn = params["params"]["layer_0"]["attn"]
    assert "bias" in attn["q_proj"] and "bias" in attn["k_proj"]
    assert "bias" not in attn["o_proj"]

    # bias actually reaches the math: zeroing it changes the logits
    ref, _ = model.apply(params, tokens)
    params_zb = jax.tree_util.tree_map(lambda x: x, params)

    def zero_bias(tree):
        if isinstance(tree, dict):
            return {
                k: (jnp.zeros_like(v) + 0.37)
                if k == "bias"
                else zero_bias(v)
                for k, v in tree.items()
            }
        return tree

    params_zb = zero_bias(params_zb)
    shifted, _ = model.apply(params_zb, tokens)
    assert not np.allclose(np.asarray(ref), np.asarray(shifted))

    cfg_f = tiny_llama(attn_qkv_bias=True, fuse_qkv=True, fuse_gate_up=True)
    fused_logits, _ = LlamaModel(cfg_f).apply(fuse_llama_params(params), tokens)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fused_logits))


def test_model_family_configs():
    """qwen2_7b / mistral_7b configs describe the real architectures."""
    from bitorch_engine_tpu.models.llama import mistral_7b, qwen2_7b

    q = qwen2_7b()
    assert q.attn_qkv_bias and q.num_kv_heads == 4 and q.vocab_size == 152064
    assert q.hidden_size == 3584 and q.intermediate_size == 18944
    m = mistral_7b()
    assert m.num_kv_heads == 8 and m.intermediate_size == 14336
    # tiny runnable sanity check of the qwen-shaped block stack
    cfg = tiny_llama(attn_qkv_bias=True, num_kv_heads=1, num_heads=4)
    model = LlamaModel(cfg)
    toks = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)
    logits, _ = model.apply(params, toks)
    assert bool(jnp.all(jnp.isfinite(logits)))


@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_attn_window_matches_full_cache(kv_dtype):
    """Bucketed attention windows (static KV-prefix reads) are bit-identical
    to full-cache attention whenever the window covers every valid position."""
    cfg = tiny_llama(dtype=jnp.float32, kv_cache_dtype=kv_dtype, max_seq_len=64)
    model = LlamaModel(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), toks)

    def run(attn_window):
        caches = init_kv_caches(cfg, 2, 64)
        logits, caches = model.apply(
            params, toks, kv_caches=caches,
            cache_len=jnp.zeros((2,), jnp.int32), attn_window=attn_window,
        )
        outs = [logits[:, -1]]
        tok = logits[:, -1].argmax(-1)[:, None].astype(jnp.int32)
        for i in range(4):
            lg, caches = model.apply(
                params, tok,
                positions=jnp.full((2, 1), 8 + i, jnp.int32),
                kv_caches=caches, cache_len=jnp.asarray(8 + i, jnp.int32),
                attn_window=attn_window,
            )
            outs.append(lg[:, -1])
            tok = lg[:, -1].argmax(-1)[:, None].astype(jnp.int32)
        return jnp.stack(outs)

    full = run(None)
    win = run(16)  # covers cache_len+s = 12 < 16 << 64
    # full read (single-pass over the post-update cache) and the windowed
    # two-part decomposition partition the softmax/context reductions
    # differently -> equal up to f32 reduction-order ulps
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(win), atol=1e-5, rtol=1e-5
    )


def test_attn_window_paged_matches_full():
    from bitorch_engine_tpu.models.paged_kv import init_paged_kv_caches

    cfg = tiny_llama(dtype=jnp.float32, kv_cache_dtype="int8", max_seq_len=64)
    model = LlamaModel(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), toks)

    def run(attn_window):
        ps, P = 8, 8  # page_size 8, 8 pages/slot -> view 64
        caches = init_paged_kv_caches(cfg, 1 + 2 * P, ps, 2, P)
        tbl = 1 + np.arange(2 * P).reshape(2, P).astype(np.int32)
        caches = [c.replace(page_table=jnp.asarray(tbl)) for c in caches]
        logits, caches = model.apply(
            params, toks, kv_caches=caches,
            cache_len=jnp.zeros((2,), jnp.int32), attn_window=attn_window,
        )
        outs = [logits[:, -1]]
        tok = logits[:, -1].argmax(-1)[:, None].astype(jnp.int32)
        for i in range(4):
            lg, caches = model.apply(
                params, tok,
                positions=jnp.full((2, 1), 8 + i, jnp.int32),
                kv_caches=caches, cache_len=jnp.asarray(8 + i, jnp.int32),
                attn_window=attn_window,
            )
            outs.append(lg[:, -1])
            tok = lg[:, -1].argmax(-1)[:, None].astype(jnp.int32)
        return jnp.stack(outs)

    full = run(None)
    win = run(16)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(win), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_attn_window_zero_prefill(kv_dtype):
    """attn_window=0 (prefill-from-empty) is bit-identical to a covering
    window over the empty cache, and the produced caches decode the same."""
    cfg = tiny_llama(dtype=jnp.float32, kv_cache_dtype=kv_dtype, max_seq_len=64)
    model = LlamaModel(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), toks)

    def pre(window):
        caches = init_kv_caches(cfg, 2, 64)
        return model.apply(params, toks, kv_caches=caches,
                           cache_len=jnp.zeros((2,), jnp.int32),
                           attn_window=window)

    lg0, c0 = pre(0)
    lg16, c16 = pre(16)
    np.testing.assert_array_equal(np.asarray(lg0), np.asarray(lg16))
    for a, b_ in zip(jax.tree_util.tree_leaves(c0), jax.tree_util.tree_leaves(c16)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    # the caches then decode identically
    tok = lg0[:, -1].argmax(-1)[:, None].astype(jnp.int32)
    lg_a, _ = model.apply(params, tok, positions=jnp.full((2, 1), 8, jnp.int32),
                          kv_caches=c0, cache_len=jnp.asarray(8, jnp.int32),
                          attn_window=16)
    lg_b, _ = model.apply(params, tok, positions=jnp.full((2, 1), 8, jnp.int32),
                          kv_caches=c16, cache_len=jnp.asarray(8, jnp.int32),
                          attn_window=16)
    np.testing.assert_array_equal(np.asarray(lg_a), np.asarray(lg_b))


@pytest.mark.parametrize("window", [4, 0])
def test_attn_window_contract_violation_poisons(window):
    """Out-of-contract windows (attn_window < cache_len) NaN-poison the
    logits instead of silently dropping cached positions (the ContinuousBatcher
    always computes covering windows; this guards direct model.apply callers)."""
    cfg = tiny_llama(dtype=jnp.float32, kv_cache_dtype="bf16", max_seq_len=64)
    model = LlamaModel(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), toks)
    caches = init_kv_caches(cfg, 2, 64)
    _, caches = model.apply(params, toks, kv_caches=caches,
                            cache_len=jnp.zeros((2,), jnp.int32), attn_window=16)
    tok = jnp.ones((2, 1), jnp.int32)
    # decode at cache_len=8 with a window that drops positions [window, 8)
    lg, _ = model.apply(params, tok, positions=jnp.full((2, 1), 8, jnp.int32),
                        kv_caches=caches, cache_len=jnp.asarray(8, jnp.int32),
                        attn_window=window)
    assert not bool(jnp.isfinite(lg).all()), "contract violation must poison"
    # the covering window stays finite
    lg_ok, _ = model.apply(params, tok, positions=jnp.full((2, 1), 8, jnp.int32),
                           kv_caches=caches, cache_len=jnp.asarray(8, jnp.int32),
                           attn_window=8)
    assert bool(jnp.isfinite(lg_ok).all())


def test_remat_training_matches_no_remat():
    """cfg.remat recomputes block activations on backward; loss and grads
    must match the non-remat graph exactly (same primals, same math)."""
    from bitorch_engine_tpu.training import cross_entropy_loss
    from bitorch_engine_tpu.utils import prepare_for_training

    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, 256)

    def build(remat):
        cfg = tiny_llama(dtype=jnp.float32, remat=remat)
        model = LlamaModel(cfg)
        params = prepare_for_training(
            model.init(jax.random.PRNGKey(1), toks)
        )
        def loss_fn(p):
            logits, _ = model.apply(p, toks)
            return cross_entropy_loss(logits[:, :-1], toks[:, 1:])
        return jax.jit(jax.value_and_grad(loss_fn, allow_int=True)), params

    f0, p0 = build(False)
    f1, p1 = build(True)
    l0, g0 = f0(p0)
    l1, g1 = f1(p1)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        if a.dtype.kind in "fc":
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("kind", ["ring", "ulysses"])
def test_sequence_parallel_training_matches_single(kind):
    """cfg.sequence_parallel wires ring/Ulysses attention into cache-less
    (training) forwards; logits must match the single-device model."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = Mesh(np.asarray(devs[:4]).reshape(4), axis_names=("sp",))

    cfg0 = tiny_llama(dtype=jnp.float32, use_flash_attention=False)
    model0 = LlamaModel(cfg0)
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 32), 0, cfg0.vocab_size)
    params = model0.init(jax.random.PRNGKey(1), toks)
    ref, _ = model0.apply(params, toks)

    cfg1 = tiny_llama(dtype=jnp.float32, use_flash_attention=False,
                      sequence_parallel=kind, sp_mesh=mesh)
    model1 = LlamaModel(cfg1)
    toks_sh = jax.device_put(toks, NamedSharding(mesh, P(None, "sp")))
    with mesh:
        got, _ = jax.jit(lambda p, t: model1.apply(p, t))(params, toks_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_sequence_parallel_grads_flow():
    """Gradients flow through the sequence-parallel attention (training)."""
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = Mesh(np.asarray(devs[:4]).reshape(4), axis_names=("sp",))
    cfg = tiny_llama(dtype=jnp.float32, use_flash_attention=False,
                     sequence_parallel="ring", sp_mesh=mesh)
    model = LlamaModel(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 32), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), toks)

    def loss(p):
        logits, _ = model.apply(p, toks)
        return jnp.mean(logits**2)

    with mesh:
        g = jax.jit(jax.grad(loss, allow_int=True))(params)
    leaves = [x for x in jax.tree_util.tree_leaves(g) if x.dtype.kind == "f"]
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)
