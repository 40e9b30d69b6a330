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


# ---------------------------------------------------------------------------
# Perplexity gate on a trained model (BASELINE accuracy line)
# ---------------------------------------------------------------------------
#
# The reference defers its accuracy claim to external eval harnesses
# (README.md:19 "without any significant loss in accuracy"); this engine
# carries the gate in-repo: a deterministic byte-level corpus
# (data/tiny_corpus.txt, original text), a small Llama *trained* on it so
# the weights are structured rather than random, and the fp-vs-quantized
# perplexity Δ measured on a held-out split.


def _seed_text() -> str:
    import pathlib

    path = pathlib.Path(__file__).parent.parent / "data" / "tiny_corpus.txt"
    return path.read_text()


def expand_corpus(n_bytes: int, seed: int = 0) -> np.ndarray:
    """Deterministic corpus of ``n_bytes``: a word-bigram Markov sampler
    fitted on the in-repo seed text (data/tiny_corpus.txt, original prose).

    The seed text alone (~6 KB) lets any model memorize it — fp-vs-quant
    deltas on an overfit model point the wrong way.  Sampling fresh text
    from the seed's bigram statistics gives an unbounded train stream and a
    held-out stream from the *same distribution*, so the perplexity gap —
    and the quantization Δ — measure generalization, like a real corpus.
    """
    words = _seed_text().split()
    nxt: dict = {}
    for a, b in zip(words, words[1:]):
        nxt.setdefault(a, []).append(b)
    rng = np.random.default_rng(seed)
    out: list = []
    w = words[0]
    size = 0
    while size < n_bytes:
        out.append(w)
        size += len(w) + 1
        cands = nxt.get(w)
        if not cands:
            w = words[int(rng.integers(0, len(words)))]
        else:
            w = cands[int(rng.integers(0, len(cands)))]
    text = " ".join(out)[:n_bytes]
    return np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int32)


def byte_corpus(split: str = "train", train_bytes: int = 200_000, eval_bytes: int = 20_000) -> np.ndarray:
    """Markov-expanded byte stream; train and eval use disjoint sampler seeds
    (same distribution, no shared text)."""
    if split == "train":
        return expand_corpus(train_bytes, seed=1)
    return expand_corpus(eval_bytes, seed=2)


def train_byte_lm(
    cfg,
    steps: int = 300,
    batch: int = 16,
    seq_len: int = 128,
    lr: float = 3e-3,
    seed: int = 0,
):
    """Train an fp byte-level LlamaModel on the in-repo corpus (AdamW).

    Plain fp pretraining (the quantization happens *after*, via
    ``quantize_llama_params``) — this stands in for the real checkpoints
    the sandbox cannot download.  Returns (model, params, final_loss).
    """
    import optax
    from .llama import LlamaModel

    model = LlamaModel(cfg)
    data = byte_corpus("train")
    rng = np.random.default_rng(seed)

    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, seq_len), jnp.int32)
    )
    tx = optax.adamw(lr, weight_decay=0.01)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, tokens):
        def loss_fn(p):
            logits, _ = model.apply(p, tokens[:, :-1])
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tgt = tokens[:, 1:]
            picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            return -jnp.mean(picked)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for _ in range(steps):
        offs = rng.integers(0, len(data) - seq_len - 1, size=batch)
        toks = jnp.asarray(
            np.stack([data[o : o + seq_len + 1] for o in offs]), jnp.int32
        )
        params, opt_state, loss = step_fn(params, opt_state, toks)
    return model, params, float(loss)


def run_ppl_gate(
    hidden: int = 256,
    layers: int = 4,
    steps: int = 300,
    seq_len: int = 128,
    seed: int = 0,
) -> dict:
    """Train the byte LM, then measure held-out perplexity fp vs quantized.

    Configs: w4g64 MPQ, w2g32 MPQ, and the GreenBit-style 2.5-bit MBWQ
    (4/2 mix at 25/75).  Returns a dict of ppl + relative deltas.
    """
    from .llama import LlamaConfig, LlamaModel
    from .llama_loader import quantize_llama_params

    base = dict(
        vocab_size=256,
        hidden_size=hidden,
        intermediate_size=2 * hidden,
        num_layers=layers,
        num_heads=4,
        num_kv_heads=2,
        max_seq_len=seq_len,
        rope_theta=10000.0,
        dtype=jnp.float32,
        use_flash_attention=False,
    )
    cfg_fp = LlamaConfig(quantized=False, **base)
    model_fp, params_fp, final_loss = train_byte_lm(
        cfg_fp, steps=steps, seq_len=seq_len, seed=seed
    )

    held = byte_corpus("eval")
    held = held[: (len(held) // seq_len) * seq_len].reshape(1, -1)
    tokens = jnp.asarray(held)

    out = {"train_loss": final_loss, "ppl_fp": perplexity(model_fp, params_fp, tokens)}
    quant_cfgs = {
        "w4g64": LlamaConfig(quantized=True, w_bit=4, group_size=64, **base),
        "w2g32": LlamaConfig(quantized=True, w_bit=2, group_size=32, **base),
        # uniform 2-bit at g64/g128 — w2_decode bench arm candidates (the
        # "fewer bits ⇒ proportionally faster" demonstration).  Measured
        # damage (h512/L4/800st proxy): g32 +1.72%, g64 +2.6%, g128 +4.3%
        # — uniform w2 lacks MBWQ's w4 protection of the sensitive rows,
        # so coarser groups bite hard; the bench arm's config must carry
        # its measured delta wherever cited
        "w2g64": LlamaConfig(quantized=True, w_bit=2, group_size=64, **base),
        "w2g128": LlamaConfig(quantized=True, w_bit=2, group_size=128, **base),
        # symmetric-midpoint variants (zeros ≡ mid·scales): the quad
        # kernel's signed-code regime with zero correction removed — its
        # quality cost vs the affine min-max form must be bounded before
        # the serving arms switch (round-5 trace: ~185 µs/step saved)
        "w2g128_midsym": LlamaConfig(
            quantized=True, w_bit=2, group_size=128, quant_mid_sym=True, **base
        ),
        "mbwq_2p5_midsym": LlamaConfig(
            quantized=True,
            group_size=64,
            mbwq_strategy=((4, 0.25), (2, 0.75, 128)),
            quant_mid_sym=True,
            **base,
        ),
        "mbwq_2p5": LlamaConfig(
            quantized=True,
            group_size=32,
            mbwq_strategy=((4, 0.25), (2, 0.75)),
            **base,
        ),
        # the serving-perf operating point (half the group metadata, double
        # the dot-K — BENCH_NOTES round 4); its quality cost vs g32 must be
        # bounded for the bench config to be honest
        "mbwq_2p5g64": LlamaConfig(
            quantized=True,
            group_size=64,
            mbwq_strategy=((4, 0.25), (2, 0.75)),
            **base,
        ),
        # w2 segments at g128 (per-bit group-size override): halves the w2
        # metadata bytes again and brings the per-group dot K to the MXU's
        # native 128 — a serving-perf candidate whose quality cost must be
        # bounded before it can be a bench default
        "mbwq_2p5_w2g128": LlamaConfig(
            quantized=True,
            group_size=64,
            mbwq_strategy=((4, 0.25), (2, 0.75, 128)),
            **base,
        ),
    }
    for name, cfg_q in quant_cfgs.items():
        params_q = quantize_llama_params(params_fp, cfg_q)
        ppl = perplexity(LlamaModel(cfg_q), params_q, tokens)
        out[f"ppl_{name}"] = ppl
        out[f"rel_delta_{name}"] = (ppl - out["ppl_fp"]) / out["ppl_fp"]

    # bf16-stored group metadata (the serving relayout): its rounding must be
    # noise next to the code-quantization damage itself
    from ..utils.convert import relayout_params_for_tpu

    cfg_q = quant_cfgs["w4g64"]
    params_q = relayout_params_for_tpu(
        quantize_llama_params(params_fp, cfg_q), meta_dtype=jnp.bfloat16
    )
    ppl = perplexity(LlamaModel(cfg_q), params_q, tokens)
    out["ppl_w4g64_bf16meta"] = ppl
    out["rel_delta_w4g64_bf16meta"] = (ppl - out["ppl_fp"]) / out["ppl_fp"]

    # A8W2 (int8-MXU) regime: per-token int8 activations on the w2 segments
    # (act_bits_map={2: 8}).  The XLA fallback simulates the quad kernel's
    # quantization exactly (ops/mpq_linear.py), so this delta is the real
    # serving-quality cost of the A8 lever — gated against the A16 variant.
    for name in (
        "mbwq_2p5", "mbwq_2p5g64", "mbwq_2p5_w2g128", "w2g32", "w2g64", "w2g128",
        "w2g128_midsym", "mbwq_2p5_midsym",
    ):
        cfg_q = quant_cfgs[name]
        params_q = relayout_params_for_tpu(
            quantize_llama_params(params_fp, cfg_q),
            meta_dtype=jnp.bfloat16,
            act_bits_map={2: 8},
        )
        ppl = perplexity(LlamaModel(cfg_q), params_q, tokens)
        out[f"ppl_{name}_a8"] = ppl
        out[f"rel_delta_{name}_a8"] = (ppl - out["ppl_fp"]) / out["ppl_fp"]
    return out
