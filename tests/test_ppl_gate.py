"""Perplexity gate (BASELINE accuracy line) on a *trained* model.

Trains the byte-level LM on the Markov-expanded in-repo corpus, then
checks the fp-vs-quantized held-out perplexity deltas.  Reduced sizes for
CI speed; tools/ppl_gate.py runs the full configuration (recorded in
BENCH_NOTES.md: fp 55.47, w4g64 +2.1%, w2g32 +2.1%, mbwq2.5 +0.7%).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.models.eval import byte_corpus, expand_corpus, run_ppl_gate


def test_corpus_deterministic_and_disjoint():
    a = expand_corpus(5000, seed=1)
    b = expand_corpus(5000, seed=1)
    c = expand_corpus(5000, seed=2)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.min() >= 0 and a.max() < 256
    tr, ev = byte_corpus("train", train_bytes=10_000), byte_corpus("eval")
    assert len(tr) == 10_000 and len(ev) == 20_000


def test_ppl_gate_trained_model():
    """The gate proper: quantization must not significantly hurt a trained
    model, and damage must order by bit budget.  Bounds set from the
    recorded run (fp 16.90, w4 +8.2%, mbwq2.5 +48%, w2 +65%) with margin."""
    out = run_ppl_gate(hidden=128, layers=2, steps=250)
    # training happened: far below the ~160 ppl of an early-training model
    assert out["ppl_fp"] < 30, out
    # w4 is the production config: the "no significant loss" bar
    assert out["rel_delta_w4g64"] < 0.15, out
    # low-bit configs degrade more but stay usable
    assert out["rel_delta_w2g32"] < 1.0, out
    assert out["rel_delta_mbwq_2p5"] < 0.8, out
    # the load-bearing signal: damage orders by bits — w4 < mbwq(2.5) < w2,
    # and every config degrades (guards the overfit-regularization artifact
    # where quantization *improves* a memorized model)
    assert (
        0.0
        < out["rel_delta_w4g64"]
        < out["rel_delta_mbwq_2p5"]
        < out["rel_delta_w2g32"]
    ), out
    # bf16-stored metadata (serving relayout) adds at most noise on top of
    # the w4 code quantization itself
    assert abs(out["rel_delta_w4g64_bf16meta"] - out["rel_delta_w4g64"]) < 0.02, out
