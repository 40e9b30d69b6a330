#!/usr/bin/env python
"""On-chip numerics gate for the in-place paged-attention kernel.

Greedy tokens are allowed to diverge between the paged kernel and the
dense path (reduction-order ulps amplified by argmax on random weights —
BENCH_NOTES round 3), but the LOGITS must not drift.  This gate feeds
both paths the SAME forced token stream for ``steps`` decode steps and
asserts the per-step max relative logit error stays under ``tol`` —
without it, a real kernel-numerics regression would be indistinguishable
from the known benign token divergence (VERDICT round-3 weak point 7).

Run standalone on the chip (``python tools/paged_gate.py``) or from
``bench.py`` (the result is recorded in the bench JSON's extra dict).
The model is a structurally-8B-like GQA config (head_dim 128, rep 4,
int8 KV) small enough to gate every bench run cheaply; the kernel under
test is the same code path the serving config runs.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def run_paged_logits_gate(steps: int = 64, batch: int = 8, tol: float = 2.5e-2):
    """Returns ``{"max_rel": float, "steps": int, "tol": float, "ok": bool}``."""
    from bitorch_engine_tpu.models.llama import (
        LlamaConfig,
        LlamaModel,
        init_kv_caches,
    )
    from bitorch_engine_tpu.models.paged_kv import (
        PageAllocator,
        init_paged_kv_caches,
    )
    from bitorch_engine_tpu.utils.convert import relayout_params_for_tpu

    # window < allocation so the paged path takes the kernel (a window
    # covering the whole allocation takes the full-read gather instead)
    cache_len = 512
    page_size = 64
    window = 256
    cfg = LlamaConfig(
        vocab_size=1024,
        hidden_size=2048,
        intermediate_size=4096,
        num_layers=4,
        num_heads=16,
        num_kv_heads=4,  # rep 4 + head_dim 128, like the 8B serving config
        max_seq_len=cache_len,
        quantized=True,
        w_bit=4,
        group_size=128,
        kv_cache_dtype="int8",
        dtype=jnp.bfloat16,
    )
    model = LlamaModel(cfg)
    tok0 = jnp.zeros((batch, 1), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tok0)
    params = relayout_params_for_tpu(params, meta_dtype=jnp.bfloat16)

    dense = init_kv_caches(cfg, batch, cache_len)
    pps = cache_len // page_size
    alloc = PageAllocator(batch * pps + 1, page_size, batch, pps)
    for slot in range(batch):
        assert alloc.alloc(slot, cache_len)
    paged = init_paged_kv_caches(cfg, batch * pps + 1, page_size, batch, pps)
    tbl = jnp.asarray(alloc.table)
    paged = [c.replace(page_table=tbl + 0) for c in paged]

    @functools.partial(jax.jit, static_argnames=("win",))
    def step(params, tok, caches, pos, win):
        positions = jnp.broadcast_to(pos, (batch, 1)).astype(jnp.int32)
        logits, caches = model.apply(
            params, tok, positions=positions, kv_caches=caches,
            cache_len=pos, attn_window=win,
        )
        return logits[:, -1].astype(jnp.float32), caches

    # forced shared token stream: logits comparison is never contaminated
    # by trajectory divergence
    toks = jax.random.randint(
        jax.random.PRNGKey(1), (steps + 1, batch, 1), 0, cfg.vocab_size
    ).astype(jnp.int32)

    max_rel = 0.0
    ld = lp = None
    for i in range(steps):
        tok = toks[i]
        ld, dense = step(params, tok, dense, jnp.asarray(i, jnp.int32), window)
        lp, paged = step(params, tok, paged, jnp.asarray(i, jnp.int32), window)
        num = float(jnp.max(jnp.abs(ld - lp)))
        den = float(jnp.max(jnp.abs(ld))) + 1e-9
        max_rel = max(max_rel, num / den)
    return {"max_rel": max_rel, "steps": steps, "tol": tol, "ok": max_rel < tol}


if __name__ == "__main__":
    import json

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    out = run_paged_logits_gate()
    print(json.dumps(out))
    assert out["ok"], f"paged logits drift {out['max_rel']:.4f} >= tol {out['tol']}"
    print(f"PAGED LOGITS GATE PASSED: max rel {out['max_rel']:.2e} over {out['steps']} steps")
