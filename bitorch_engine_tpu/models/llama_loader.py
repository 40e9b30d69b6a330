"""Llama checkpoint → engine params tree (HF-layout safetensors).

Completes the green-bit-llm-style flow (reference README.md:18-19): map
HuggingFace Llama tensor names to this engine's flax param paths, quantizing
fp weights on the fly (RTN) or ingesting pre-quantized GPTQ tensors.

Name mapping (HF → engine):
    model.embed_tokens.weight                    → params/embed
    model.layers.{i}.self_attn.{q,k,v,o}_proj    → params/layer_{i}/attn/{q,k,v,o}_proj/qweight
    model.layers.{i}.mlp.{gate,up,down}_proj     → params/layer_{i}/mlp/{...}_proj/qweight
    model.layers.{i}.input_layernorm.weight      → params/layer_{i}/input_norm/weight
    model.layers.{i}.post_attention_layernorm    → params/layer_{i}/post_attn_norm/weight
    model.norm.weight                            → params/final_norm/weight
    lm_head.weight (if cfg.head_w_bit)           → params/lm_head/qweight (MPQ)
Otherwise lm_head ties to the embed table (int8 per-row when
``cfg.quantize_embed``).
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.quant import quantize_mpq
from ..qtensor import MPQTensor
from ..utils import ingest
from .llama import LlamaConfig

_PROJ = {"q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"}


def _block_of(proj: str) -> str:
    return "attn" if proj in ("q_proj", "k_proj", "v_proj", "o_proj") else "mlp"


def load_llama_params(
    tensors: Dict[str, np.ndarray],
    cfg: LlamaConfig,
    dtype=jnp.bfloat16,
) -> Dict:
    """Build the engine params tree from an HF-layout tensor dict.

    Detects per-layer quantization format:
    * ``...{proj}.weight`` fp  → RTN-quantized to (cfg.w_bit, cfg.group_size)
    * ``...{proj}.qweight`` (+``qzeros``/``scales``[/``g_idx``]) → GPTQ ingest
    """
    layers: Dict[str, Dict] = {}
    out: Dict[str, object] = {}

    def qspec(prefix: str) -> Optional[MPQTensor]:
        if prefix + ".qweight" in tensors:
            return ingest.mpq_from_gptq(
                tensors[prefix + ".qweight"],
                tensors[prefix + ".qzeros"],
                tensors[prefix + ".scales"],
                tensors.get(prefix + ".g_idx"),
            )
        if prefix + ".weight" in tensors:
            w = np.asarray(tensors[prefix + ".weight"], np.float32).T  # (K, N)
            return quantize_mpq(
                jnp.asarray(w), w_bit=cfg.w_bit, group_size=cfg.group_size,
                asym=cfg.asym,
            )
        return None

    for name in tensors:
        m = re.match(r"model\.layers\.(\d+)\.(self_attn|mlp)\.(\w+_proj)\.", name)
        if not m:
            continue
        i, _, proj = int(m.group(1)), m.group(2), m.group(3)
        key = f"layer_{i}"
        block = _block_of(proj)
        layers.setdefault(key, {}).setdefault(block, {})
        if "qweight" in layers[key][block].get(proj, {}):
            continue
        prefix = name[: name.rindex(".")]
        qt = qspec(prefix)
        if qt is not None and proj not in layers[key][block]:
            entry = {"qweight": qt}
            bias = tensors.get(prefix + ".bias")
            if bias is not None:
                # Qwen2-style q/k/v projection bias
                entry["bias"] = jnp.asarray(np.asarray(bias, np.float32), dtype)
            layers[key][block][proj] = entry

    for i in range(cfg.num_layers):
        key = f"layer_{i}"
        if key not in layers:
            raise ValueError(f"missing layer {i} in checkpoint")
        ln1 = tensors.get(f"model.layers.{i}.input_layernorm.weight")
        ln2 = tensors.get(f"model.layers.{i}.post_attention_layernorm.weight")
        layers[key]["input_norm"] = {
            "weight": jnp.asarray(np.asarray(ln1, np.float32))
            if ln1 is not None
            else jnp.ones((cfg.hidden_size,), jnp.float32)
        }
        layers[key]["post_attn_norm"] = {
            "weight": jnp.asarray(np.asarray(ln2, np.float32))
            if ln2 is not None
            else jnp.ones((cfg.hidden_size,), jnp.float32)
        }
        out[key] = layers[key]

    embed = tensors.get("model.embed_tokens.weight")
    if embed is None:
        raise ValueError("missing model.embed_tokens.weight")
    embed = np.asarray(embed, np.float32)
    if cfg.quantize_embed:
        # per-row int8 table matching LlamaModel's quantize_embed params
        scale = np.maximum(np.max(np.abs(embed), axis=1), 1e-6) / 127.0
        q = np.clip(np.round(embed / scale[:, None]), -127, 127).astype(np.int8)
        out["embed"] = {
            "data": jnp.asarray(q),
            "scale": jnp.asarray(scale, jnp.float32),
        }
    else:
        out["embed"] = jnp.asarray(embed, dtype)
    if cfg.head_w_bit is not None:
        # untied head: HF ``lm_head.weight`` (vocab, hidden); llama3 unties it,
        # tied checkpoints fall back to the embedding table
        head = tensors.get("lm_head.weight")
        head = embed if head is None else np.asarray(head, np.float32)
        head = head.T  # (hidden, vocab)
        if cfg.head_pad_to:
            pad = cfg.head_pad_to
            n_head = (head.shape[1] + pad - 1) // pad * pad
            head = np.pad(head, ((0, 0), (0, n_head - head.shape[1])))
        out["lm_head"] = {
            "qweight": quantize_mpq(
                jnp.asarray(head), w_bit=cfg.head_w_bit, group_size=128,
                asym=False,
            )
        }
    norm = tensors.get("model.norm.weight")
    out["final_norm"] = {
        "weight": jnp.asarray(np.asarray(norm, np.float32))
        if norm is not None
        else jnp.ones((cfg.hidden_size,), jnp.float32)
    }
    params = {"params": out}
    if cfg.fuse_qkv or cfg.fuse_gate_up:
        from .llama import fuse_llama_params

        params = fuse_llama_params(params, cfg.fuse_qkv, cfg.fuse_gate_up)
    return params


def load_llama_from_safetensors(path: str, cfg: LlamaConfig, dtype=jnp.bfloat16):
    return load_llama_params(ingest.load_safetensors(path), cfg, dtype)


def quantize_llama_params(params_fp, cfg_q: LlamaConfig):
    """Convert an fp ``LlamaModel(quantized=False)`` param tree into the
    structure of ``LlamaModel(cfg_q)``, quantizing each projection kernel.

    The functional analogue of the reference's ``replace_layers`` +
    ``quantize_linear_with_*`` model surgery (``utils/convert.py:7-196``):
    the *same trained weights* flow into the quantized structure, which is
    what the perplexity gate (BASELINE accuracy line) compares against fp.
    Embedding / norms / tied head pass through untouched.
    """
    from ..ops.mbwq_linear import quantize_mbwq, strategy_dict

    if cfg_q.mbwq_strategy is not None:
        strategy = strategy_dict(
            cfg_q.mbwq_strategy, cfg_q.group_size, cfg_q.mbwq_container_bits,
            mid_sym=cfg_q.quant_mid_sym,
        )

        def qz(kernel):
            return quantize_mbwq(kernel, strategy)

    else:

        def qz(kernel):
            return quantize_mpq(
                kernel,
                w_bit=cfg_q.w_bit,
                group_size=cfg_q.group_size,
                asym=cfg_q.asym,
                mid_sym=cfg_q.quant_mid_sym,
            )

    def convert(tree):
        if isinstance(tree, dict):
            out = {}
            for key, val in tree.items():
                if isinstance(val, dict) and set(val) == {"kernel"}:
                    out[key] = {"qweight": qz(val["kernel"])}
                elif isinstance(val, dict) and set(val) == {"kernel", "bias"}:
                    out[key] = {"qweight": qz(val["kernel"]), "bias": val["bias"]}
                else:
                    out[key] = convert(val)
            return out
        return tree

    params = convert(params_fp)
    if cfg_q.fuse_qkv or cfg_q.fuse_gate_up:
        from .llama import fuse_llama_params

        params = fuse_llama_params(params, cfg_q.fuse_qkv, cfg_q.fuse_gate_up)
    return params
