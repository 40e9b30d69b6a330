"""HF-layout checkpoint → Llama params loader tests (fp and GPTQ formats)."""

import numpy as np
import jax
import jax.numpy as jnp

from bitorch_engine_tpu.models.llama import LlamaModel, tiny_llama
from bitorch_engine_tpu.models.llama_loader import load_llama_params
from bitorch_engine_tpu.ops import quant


def _hf_fp_tensors(cfg, seed=0):
    rng = np.random.default_rng(seed)
    t = {}
    t["model.embed_tokens.weight"] = (
        rng.standard_normal((cfg.vocab_size, cfg.hidden_size)).astype(np.float32) * 0.02
    )
    t["model.norm.weight"] = np.ones(cfg.hidden_size, np.float32)
    hd = cfg.head_dim
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        shapes = {
            "self_attn.q_proj": (cfg.num_heads * hd, cfg.hidden_size),
            "self_attn.k_proj": (cfg.num_kv_heads * hd, cfg.hidden_size),
            "self_attn.v_proj": (cfg.num_kv_heads * hd, cfg.hidden_size),
            "self_attn.o_proj": (cfg.hidden_size, cfg.num_heads * hd),
            "mlp.gate_proj": (cfg.intermediate_size, cfg.hidden_size),
            "mlp.up_proj": (cfg.intermediate_size, cfg.hidden_size),
            "mlp.down_proj": (cfg.hidden_size, cfg.intermediate_size),
        }
        for name, (o, k) in shapes.items():
            t[p + name + ".weight"] = (
                rng.standard_normal((o, k)).astype(np.float32) * 0.02
            )
    return t


def test_load_fp_checkpoint_and_run():
    cfg = tiny_llama(dtype=jnp.float32)
    tensors = _hf_fp_tensors(cfg)
    params = load_llama_params(tensors, cfg, dtype=jnp.float32)
    model = LlamaModel(cfg)
    # structure must match a self-initialized model
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    assert str(jax.tree_util.tree_structure(params)) == str(
        jax.tree_util.tree_structure(ref)
    )
    logits, _ = model.apply(params, jnp.asarray([[1, 2, 3, 4]], jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_load_gptq_checkpoint_matches_fp_quantization():
    """A GPTQ-format checkpoint must load to the same dequantized weights as
    quantizing the fp original with the same config."""
    cfg = tiny_llama(dtype=jnp.float32, asym=True, group_size=64)
    tensors = _hf_fp_tensors(cfg, seed=1)
    # produce the GPTQ version of one projection
    w = tensors["model.layers.0.self_attn.q_proj.weight"]
    qt = quant.quantize_mpq(
        jnp.asarray(w.T), w_bit=cfg.w_bit, group_size=cfg.group_size, asym=True
    )
    p = "model.layers.0.self_attn.q_proj."
    del tensors[p + "weight"]
    tensors[p + "qweight"] = np.asarray(qt.packed)
    tensors[p + "qzeros"] = np.asarray(qt.zeros)
    tensors[p + "scales"] = np.asarray(qt.scales)

    params = load_llama_params(tensors, cfg, dtype=jnp.float32)
    loaded = params["params"]["layer_0"]["attn"]["q_proj"]["qweight"]
    np.testing.assert_array_equal(
        np.asarray(loaded.packed), np.asarray(qt.packed)
    )
    w_a = quant.dequantize_mpq(loaded, jnp.float32)
    w_b = quant.dequantize_mpq(qt, jnp.float32)
    np.testing.assert_array_equal(np.asarray(w_a), np.asarray(w_b))


def test_load_with_quantized_embed_and_w4_head():
    """Loader emits the int8 embed dict + untied MPQ head matching model.init."""
    cfg = tiny_llama(dtype=jnp.float32, quantize_embed=True, head_w_bit=4)
    tensors = _hf_fp_tensors(cfg)
    # llama3-style untied head
    rng = np.random.default_rng(9)
    tensors["lm_head.weight"] = (
        rng.standard_normal((cfg.vocab_size, cfg.hidden_size)).astype(np.float32) * 0.02
    )
    params = load_llama_params(tensors, cfg, dtype=jnp.float32)
    model = LlamaModel(cfg)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    assert str(jax.tree_util.tree_structure(params)) == str(
        jax.tree_util.tree_structure(ref)
    )
    logits, _ = model.apply(params, jnp.asarray([[1, 2, 3, 4]], jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()
    # head really came from lm_head.weight (w4 dequant tracks the fp weight)
    deq = quant.dequantize_mpq(
        params["params"]["lm_head"]["qweight"], dtype=jnp.float32
    )
    ref_w = tensors["lm_head.weight"].T
    assert float(np.mean(np.abs(np.asarray(deq) - ref_w))) < 0.01 * float(
        np.mean(np.abs(ref_w))
    ) + 0.01


def test_load_tied_head_fallback():
    """No lm_head.weight in the checkpoint → head quantized from embed."""
    cfg = tiny_llama(dtype=jnp.float32, quantize_embed=True, head_w_bit=4)
    tensors = _hf_fp_tensors(cfg)
    params = load_llama_params(tensors, cfg, dtype=jnp.float32)
    deq = quant.dequantize_mpq(
        params["params"]["lm_head"]["qweight"], dtype=jnp.float32
    )
    tied = tensors["model.embed_tokens.weight"].T
    # RTN w4g128 keeps the head within quantization error of the tied table
    err = float(np.mean(np.abs(np.asarray(deq) - tied)))
    assert err < 0.05 * float(np.mean(np.abs(tied))) + 0.05


def test_load_qwen_style_bias_and_fused():
    """q/k/v ``.bias`` tensors ingest into the tree; fused configs get them
    concatenated into qkv_proj."""
    cfg = tiny_llama(attn_qkv_bias=True)
    t = _hf_fp_tensors(cfg)
    rng = np.random.default_rng(7)
    hd = cfg.head_dim
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}.self_attn."
        t[p + "q_proj.bias"] = rng.standard_normal(cfg.num_heads * hd).astype(np.float32)
        t[p + "k_proj.bias"] = rng.standard_normal(cfg.num_kv_heads * hd).astype(np.float32)
        t[p + "v_proj.bias"] = rng.standard_normal(cfg.num_kv_heads * hd).astype(np.float32)

    params = load_llama_params(t, cfg)
    attn = params["params"]["layer_0"]["attn"]
    assert "bias" in attn["q_proj"]
    model = LlamaModel(cfg)
    toks = jnp.zeros((1, 4), jnp.int32)
    logits, _ = model.apply(params, toks)
    assert bool(jnp.all(jnp.isfinite(logits)))

    cfg_f = tiny_llama(attn_qkv_bias=True, fuse_qkv=True)
    params_f = load_llama_params(t, cfg_f)
    qkv = params_f["params"]["layer_0"]["attn"]["qkv_proj"]
    assert "bias" in qkv and qkv["bias"].shape[0] == (cfg.num_heads + 2 * cfg.num_kv_heads) * hd
    logits_f, _ = LlamaModel(cfg_f).apply(params_f, toks)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits_f))


def test_load_head_padded():
    """head_pad_to pads the quantized lm_head at load; logits match unpadded."""
    cfg = tiny_llama(head_w_bit=4)
    t = _hf_fp_tensors(cfg)
    params = load_llama_params(t, cfg)
    cfg_p = tiny_llama(head_w_bit=4, head_pad_to=512)
    params_p = load_llama_params(t, cfg_p)
    n_pad = params_p["params"]["lm_head"]["qweight"].out_features
    assert n_pad == 512 and n_pad > cfg.vocab_size
    toks = jnp.zeros((1, 4), jnp.int32)
    ref, _ = LlamaModel(cfg).apply(params, toks)
    out, _ = LlamaModel(cfg_p).apply(params_p, toks)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-6)
