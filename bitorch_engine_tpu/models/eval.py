"""Evaluation harness: perplexity + quantization-quality gates.

BASELINE.md's accuracy gate is "4-bit/2-bit Llama perplexity matches FP16
within the reference's no-significant-loss Δ".  This module computes
perplexity over token streams with the standard sliding-window protocol and
the fp-vs-quantized Δ directly (same params, one quantized via
``utils.convert.quantize_params``), so the gate runs on any checkpoint —
including random-weight CI models where only the Δ is meaningful.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def sequence_nll(model, params, tokens: Array, chunk: int = 1024) -> float:
    """Mean negative log-likelihood (nats/token) of ``tokens`` (b, T)."""

    @jax.jit
    def nll_chunk(params, chunk_tokens):
        logits, _ = model.apply(params, chunk_tokens)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = chunk_tokens[:, 1:]
        picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return -jnp.sum(picked), tgt.size

    b, t = tokens.shape
    total, count = 0.0, 0
    for s in range(0, t - 1, chunk):
        piece = tokens[:, s : s + chunk + 1]
        if piece.shape[1] < 2:
            break
        nll, n = nll_chunk(params, piece)
        total += float(nll)
        count += int(n)
    return total / max(count, 1)


def perplexity(model, params, tokens: Array, chunk: int = 1024) -> float:
    return float(np.exp(sequence_nll(model, params, tokens, chunk)))


def perplexity_delta(model_fp, params_fp, model_q, params_q, tokens: Array) -> dict:
    """PPL gate: fp vs quantized on identical data; returns both + Δ."""
    ppl_fp = perplexity(model_fp, params_fp, tokens)
    ppl_q = perplexity(model_q, params_q, tokens)
    return {
        "ppl_fp": ppl_fp,
        "ppl_quant": ppl_q,
        "delta": ppl_q - ppl_fp,
        "rel_delta": (ppl_q - ppl_fp) / ppl_fp,
    }
