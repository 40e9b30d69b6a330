#!/usr/bin/env python
"""On-chip numerics gate for the A8 tpu_quad fused-dequant kernel.

The A8 perplexity gate (tools/ppl_gate.py) runs on the XLA fallback,
which *simulates* the quad kernel's per-token int8 quantization exactly —
so it bounds the quantization damage but cannot catch a hardware
kernel-numerics regression (interpret mode hid exactly such a bug in the
zeros-correction dot once: precision=HIGHEST incident, BENCH_NOTES r2;
ADVICE r4 asked for hardware coverage of the quad path).

This gate feeds the SAME forced token stream through two separately-jitted
decode steps of a uniform-w2g128 A8 model — one dispatching the Pallas
quad kernel, one traced under BITORCH_NO_PALLAS=1 (the XLA simulation) —
and asserts the per-step max relative logit error stays under ``tol``.

NO FEEDBACK COMPOUNDING: the kernel path owns the trajectory; every step
the XLA instance consumes the kernel path's *pre-step caches* and its
cache outputs are discarded, so the comparison is pure per-step kernel
numerics.  (The first gate design let each path evolve its own KV caches;
on a random-weight model that chaos-amplifies ~1e-5 per-call differences
to percent-level logit divergence within 32 steps — measured 4.8e-2 even
with both sides at f32 HIGHEST precision — which says nothing about the
kernel.  The paged gate keeps the two-trajectory form because its two
KERNEL paths share reduction-order-level math; here the reference side is
a different algorithm entirely.)

Run standalone on the chip (``python tools/quad_gate.py``) or from
``bench.py``'s w2 arm (result recorded in the bench JSON).
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def run_quad_logits_gate(steps: int = 32, batch: int = 8, tol: float = 5e-3):
    """Returns ``{"max_rel": float, "steps": int, "tol": float, "ok": bool}``."""
    from bitorch_engine_tpu.models.llama import (
        LlamaConfig,
        LlamaModel,
        init_kv_caches,
    )
    from bitorch_engine_tpu.utils.convert import relayout_params_for_tpu

    cache_len = 256
    window = 256
    cfg = LlamaConfig(
        vocab_size=1024,
        hidden_size=2048,
        intermediate_size=4096,
        num_layers=4,
        num_heads=16,
        num_kv_heads=4,
        max_seq_len=cache_len,
        quantized=True,
        w_bit=2,
        group_size=128,
        kv_cache_dtype="int8",
        dtype=jnp.bfloat16,
    )
    model = LlamaModel(cfg)
    tok0 = jnp.zeros((batch, 1), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tok0)
    params = relayout_params_for_tpu(
        params, meta_dtype=jnp.bfloat16, act_bits_map={2: 8}
    )

    def make_step():
        # no donation: the xla instance reads the kernel path's caches
        # without consuming them, and the kernel path's caches survive to
        # be passed to both instances each step
        @functools.partial(jax.jit, static_argnames=("win",))
        def step(params, tok, caches, pos, win):
            positions = jnp.broadcast_to(pos, (batch, 1)).astype(jnp.int32)
            logits, caches = model.apply(
                params, tok, positions=positions, kv_caches=caches,
                cache_len=pos, attn_window=win,
            )
            return logits[:, -1].astype(jnp.float32), caches

        return step

    step_kernel = make_step()
    step_xla = make_step()

    kern = init_kv_caches(cfg, batch, cache_len)

    # BITORCH_NO_PALLAS is read at TRACE time: compile each instance under
    # its own setting before the compared loop
    toks = jax.random.randint(
        jax.random.PRNGKey(1), (steps + 1, batch, 1), 0, cfg.vocab_size
    ).astype(jnp.int32)
    assert os.environ.get("BITORCH_NO_PALLAS", "0") != "1"

    def rel(a, b):
        num = float(jnp.max(jnp.abs(a - b)))
        den = float(jnp.max(jnp.abs(a))) + 1e-9
        return num / den

    max_rel = 0.0
    for i in range(steps):
        tok = toks[i]
        if i == 0:
            os.environ["BITORCH_NO_PALLAS"] = "1"
            try:
                # trace the xla instance first (env read at trace time)
                lx, _ = step_xla(params, tok, kern, jnp.asarray(i, jnp.int32), window)
            finally:
                del os.environ["BITORCH_NO_PALLAS"]
        else:
            lx, _ = step_xla(params, tok, kern, jnp.asarray(i, jnp.int32), window)
        lk, kern = step_kernel(params, tok, kern, jnp.asarray(i, jnp.int32), window)
        max_rel = max(max_rel, rel(lx, lk))
    return {"max_rel": max_rel, "steps": steps, "tol": tol, "ok": max_rel < tol}


if __name__ == "__main__":
    import json

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    out = run_quad_logits_gate()
    print(json.dumps(out))
    assert out["ok"], f"quad kernel drift {out['max_rel']:.4f} >= tol {out['tol']}"
    print(
        f"QUAD LOGITS GATE PASSED: max rel {out['max_rel']:.2e} over "
        f"{out['steps']} steps"
    )
