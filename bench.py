"""Benchmark: Llama-3-8B 4-bit decode throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: true end-to-end decode tokens/s/chip of the full quantized model
(random-initialized weights — the compute/memory path is identical to a real
checkpoint).  ``vs_baseline`` is the speedup vs a bf16-weight decode step,
estimated by swapping the measured per-projection fused-kernel times for
measured bf16-matmul times (a full bf16 Llama-3-8B does not fit in one v5e
HBM — which is itself the point of the engine).  The reference publishes no
absolute numbers (BASELINE.md), so the bf16 path on the same chip is the
baseline.

Env: BENCH_E2E=0 to skip the full-model run (projection-level only).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("BENCH_CPU", "0") == "1":
    # local smoke-testing guard: force CPU BEFORE any jax op — plain
    # JAX_PLATFORMS is overridden by this sandbox's sitecustomize, and an
    # accidental tunnel claim wedges whatever TPU job is actually running
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bitorch_engine_tpu.ops import quant  # noqa: E402
from bitorch_engine_tpu.utils.benchmark import time_op  # noqa: E402

HIDDEN, INTER, KV = 4096, 14336, 1024
VOCAB = 128256
LAYERS = 32
PROJS = [
    ("q", HIDDEN, HIDDEN),
    ("k", HIDDEN, KV),
    ("v", HIDDEN, KV),
    ("o", HIDDEN, HIDDEN),
    ("gate", HIDDEN, INTER),
    ("up", HIDDEN, INTER),
    ("down", INTER, HIDDEN),
]
W_BIT = 4
GROUP = 128
BATCH = 8
CACHE_LEN = 1024
HBM_BW = 819e9  # v5e


def projection_sweep(on_tpu):
    """Per-projection fused vs bf16 times; returns (fused_sum, bf16_sum) secs."""
    total_q = 0.0
    total_b = 0.0
    print(f"# backend={jax.default_backend()} devices={jax.devices()}", file=sys.stderr, flush=True)
    for i, (name, k, n) in enumerate(PROJS):
        print(f"# [{time.strftime('%H:%M:%S')}] projection {name} ...", file=sys.stderr, flush=True)
        w = jax.random.normal(jax.random.PRNGKey(i), (k, n), jnp.float32) * 0.02
        qt = quant.quantize_mpq(w, w_bit=W_BIT, group_size=GROUP)
        x = jax.random.normal(jax.random.PRNGKey(100 + i), (BATCH, k), jnp.bfloat16)
        if on_tpu:
            from bitorch_engine_tpu.ops.pallas.dequant_matmul import (
                mpq_matmul_pallas,
                relayout_tpu,
            )

            qt = relayout_tpu(qt)
            f_q = lambda x, qt: mpq_matmul_pallas(x, qt)
        else:
            f_q = lambda x, qt: x @ quant.dequantize_mpq(qt, jnp.bfloat16)
        wb = quant.dequantize_mpq(qt, jnp.bfloat16)
        f_b = lambda x, wb: jnp.dot(x, wb, preferred_element_type=jnp.float32).astype(
            jnp.bfloat16
        )
        iters = 2000 if on_tpu else 20
        tq = time_op(f_q, x, qt, iters=iters, reps=3)
        tb = time_op(f_b, x, wb, iters=iters, reps=3)
        total_q += tq
        total_b += tb
        print(
            f"# {name} ({k}x{n}): fused {tq*1e6:.1f}us ({k*n*W_BIT/8/tq/1e9:.0f} GB/s)"
            f"  bf16 {tb*1e6:.1f}us  speedup {tb/tq:.2f}x",
            file=sys.stderr,
        )
    return total_q, total_b


def e2e_decode(
    kv_cache_dtype="int8",
    head_bits=None,
    w_bit=W_BIT,
    group_size=GROUP,
    act8=False,
    measure_full=True,
    mid_sym=False,
):
    """Full Llama-3-8B quantized decode step; returns seconds/step.

    ``head_bits``: None → tied int8 lm_head (with quantize_embed); 4 → untied
    MPQ w4g128 lm_head through the fused kernel (measured +2.9%/step:
    9.008 vs 9.273 ms same-process A/B).
    ``w_bit``/``group_size``: projection quantization (the w2 arm passes
    2/128 — identical model/batch/cache/window to the w4 headline, so the
    byte-proportional comparison is controlled).  ``act8``: route the
    projections through the A8 int8-MXU quad layout (the w2 serving
    regime; quality bounded by tools/ppl_gate.py ``rel_delta_w2g128_a8``).
    """
    from bitorch_engine_tpu.models.llama import LlamaModel, llama3_8b, init_kv_caches
    from bitorch_engine_tpu.utils.convert import relayout_params_for_tpu

    fuse = os.environ.get("BENCH_FUSE", "1") != "0"
    head_pad = int(os.environ.get("BENCH_HEAD_PAD", "2048"))
    cfg = llama3_8b(
        dtype=jnp.bfloat16,
        w_bit=w_bit,
        group_size=group_size,
        max_seq_len=CACHE_LEN,
        kv_cache_dtype=kv_cache_dtype,
        quantize_embed=kv_cache_dtype == "int8",
        head_w_bit=head_bits,
        # fused q|k|v and gate|up: one launch each, large-N streaming
        # (k/v at N=1024 run ~336 GB/s vs ~615 at N>=4096)
        fuse_qkv=fuse,
        fuse_gate_up=fuse,
        # pad head N so the kernel gets 2048-wide N blocks (v5e sweep:
        # 605us @ bn=256 unpadded -> 380us padded)
        head_pad_to=head_pad if head_bits else 0,
        # signed-code quad regime (zeros correction eliminated; the w2 arm
        # enables it — ppl-gated via rel_delta_w2g128_midsym)
        quant_mid_sym=mid_sym,
    )
    model = LlamaModel(cfg)
    tokens = jnp.zeros((BATCH, 1), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens)
    # bf16-stored group metadata (exl2/GPTQ storage width) halves the
    # 12.5% metadata share of the weight stream; BENCH_META=fp32 restores
    meta = (
        None if os.environ.get("BENCH_META", "bf16") == "fp32" else jnp.bfloat16
    )
    params = relayout_params_for_tpu(
        params, meta_dtype=meta, act_bits_map={w_bit: 8} if act8 else None
    )
    caches = init_kv_caches(cfg, BATCH, CACHE_LEN)

    import functools

    # donate caches: undonated, XLA copies every KV pool per step to build
    # the output caches (~0.7 ms/step on this config; device trace in
    # BENCH_NOTES round 2).  Caches thread forward through the run.
    @functools.partial(
        jax.jit, donate_argnums=(2,), static_argnames=("window",)
    )
    def decode_step(params, tok, caches, pos, window):
        positions = jnp.broadcast_to(pos, (BATCH, 1)).astype(jnp.int32)
        logits, caches = model.apply(
            params,
            tok,
            positions=positions,
            kv_caches=caches,
            cache_len=pos,
            attn_window=window,
        )
        return jnp.argmax(logits[:, -1], -1)[:, None], caches

    # bucketed attention window: decode at position p reads the cache
    # prefix of the smallest power-of-2 bucket >= p+1 instead of the whole
    # CACHE_LEN (bit-identical; tests/test_llama.py window tests).
    # BENCH_WINDOW=0 disables (full-cache reads every step).  Bucket floor
    # 256: on the 8-kv-head GQA config w=256 beats w=128 by ~5% (v5e A/B,
    # BENCH_NOTES round 2); MHA models prefer 128.
    windowed = os.environ.get("BENCH_WINDOW", "1") != "0"

    def bucket(n):
        w = 256
        while w < n:
            w *= 2
        return min(w, CACHE_LEN)

    win = lambda pos: bucket(pos + 1) if windowed else None

    tok = jnp.ones((BATCH, 1), jnp.int32)
    # warmup + lazy-relayout flush (fetch forces completion)
    tok, caches = decode_step(params, tok, caches, jnp.asarray(0, jnp.int32), win(0))
    int(tok[0, 0])

    state = {"tok": tok, "caches": caches, "pos": 1}

    def timed(steps):
        t = state["tok"]
        c = state["caches"]
        n0 = state["pos"]
        # pre-compile the buckets this chunk crosses (outside the timed
        # loop); threads t/c forward — caches are donated, so the originals
        # must not be reused
        for w in sorted({win(i) for i in range(n0, n0 + steps)}, key=str):
            t, c = decode_step(params, t, c, jnp.asarray(n0, jnp.int32), w)
        t0 = time.time()
        for i in range(n0, n0 + steps):
            t, c = decode_step(params, t, c, jnp.asarray(i, jnp.int32), win(i))
        int(t[0, 0])  # fetch forces completion of the chained steps
        dt = (time.time() - t0) / steps
        state.update(tok=t, caches=c, pos=n0 + steps)
        return dt

    timed(10)  # settle
    # repeat-and-spread: median of 3 same-compile chunks (the headline
    # moved 1176-1203 across round-5 captures on min-of-2; median over 3
    # is the sturdier statistic).  Windowed positions 11..160 all stay in
    # the first 256 bucket.
    import statistics

    dt = statistics.median(timed(50) for _ in range(3))
    # secondary: the same step reading the FULL cache allocation (long-
    # context operating point; its roofline includes all CACHE_LEN KV bytes)
    full = None
    if windowed and measure_full:
        windowed = False
        full = statistics.median(timed(50) for _ in range(3))
    return dt, (256 if windowed or full is not None else CACHE_LEN), full


def e2e_decode_paged():
    """Paged-KV decode arm (the serving allocator's memory layout) on the
    same llama3-8B w4 serving config: in-place Pallas paged-attention
    kernel + rank-3 token-major page pools.  Returns seconds/step; the
    headline metric divides by the dense step for the paged overhead
    ratio (round-3 target <= 1.05x; BENCH_PAGED=0 skips)."""
    import functools

    from bitorch_engine_tpu.models.llama import LlamaModel, llama3_8b
    from bitorch_engine_tpu.models.paged_kv import (
        PageAllocator,
        init_paged_kv_caches,
    )
    from bitorch_engine_tpu.utils.convert import relayout_params_for_tpu

    page_size = 64
    cfg = llama3_8b(
        dtype=jnp.bfloat16, w_bit=W_BIT, group_size=GROUP,
        max_seq_len=CACHE_LEN, kv_cache_dtype="int8", quantize_embed=True,
        head_w_bit=4, head_pad_to=2048, fuse_qkv=True, fuse_gate_up=True,
    )
    model = LlamaModel(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((BATCH, 1), jnp.int32))
    params = relayout_params_for_tpu(params, meta_dtype=jnp.bfloat16)
    pps = CACHE_LEN // page_size
    alloc = PageAllocator(BATCH * pps + 1, page_size, BATCH, pps)
    for slot in range(BATCH):
        assert alloc.alloc(slot, CACHE_LEN)
    caches = init_paged_kv_caches(cfg, BATCH * pps + 1, page_size, BATCH, pps)
    tbl = jnp.asarray(alloc.table)
    caches = [c.replace(page_table=tbl + 0) for c in caches]

    @functools.partial(jax.jit, donate_argnums=(2,))
    def step(params, tok, caches, pos):
        positions = jnp.broadcast_to(pos, (BATCH, 1)).astype(jnp.int32)
        logits, caches = model.apply(
            params, tok, positions=positions, kv_caches=caches,
            cache_len=pos, attn_window=256,
        )
        return jnp.argmax(logits[:, -1], -1)[:, None], caches

    tok = jnp.ones((BATCH, 1), jnp.int32)
    tok, caches = step(params, tok, caches, jnp.asarray(0, jnp.int32))
    int(tok[0, 0])
    pos = 1

    def timed(steps):
        nonlocal tok, caches, pos
        t0 = time.time()
        for i in range(pos, pos + steps):
            tok, caches = step(params, tok, caches, jnp.asarray(i, jnp.int32))
        int(tok[0, 0])
        pos += steps
        return (time.time() - t0) / steps

    timed(10)
    return min(timed(50), timed(50))


def b64_paged_vs_dense():
    """Batch-64 decode, dense vs paged (the round-3 b64 cliff: 1.55× dense
    with per-slot grid steps; the slot-batched kernel is the fix — VERDICT
    item 3 target ≤1.25).  Returns (dense_s, paged_s) seconds/step at a
    fixed 256 window."""
    import functools
    import gc

    from bitorch_engine_tpu.models.llama import (
        LlamaModel,
        init_kv_caches,
        llama3_8b,
    )
    from bitorch_engine_tpu.models.paged_kv import (
        PageAllocator,
        init_paged_kv_caches,
    )
    from bitorch_engine_tpu.utils.convert import relayout_params_for_tpu

    batch = 64
    page_size = 64
    cfg = llama3_8b(
        dtype=jnp.bfloat16, w_bit=W_BIT, group_size=GROUP,
        max_seq_len=CACHE_LEN, kv_cache_dtype="int8", quantize_embed=True,
        head_w_bit=4, head_pad_to=2048, fuse_qkv=True, fuse_gate_up=True,
    )
    model = LlamaModel(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((batch, 1), jnp.int32))
    params = relayout_params_for_tpu(params, meta_dtype=jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def step(params, tok, caches, pos):
        positions = jnp.broadcast_to(pos, (batch, 1)).astype(jnp.int32)
        logits, caches = model.apply(
            params, tok, positions=positions, kv_caches=caches,
            cache_len=pos, attn_window=256,
        )
        return jnp.argmax(logits[:, -1], -1)[:, None], caches

    def run(caches):
        tok = jnp.ones((batch, 1), jnp.int32)
        tok, caches = step(params, tok, caches, jnp.asarray(0, jnp.int32))
        int(tok[0, 0])
        pos = 1

        def timed(steps):
            nonlocal tok, caches, pos
            t0 = time.time()
            for i in range(pos, pos + steps):
                tok, caches = step(params, tok, caches, jnp.asarray(i, jnp.int32))
            int(tok[0, 0])
            pos += steps
            return (time.time() - t0) / steps

        timed(10)
        dt = min(timed(40), timed(40))
        del caches
        return dt

    dense_s = run(init_kv_caches(cfg, batch, CACHE_LEN))
    gc.collect()
    pps = CACHE_LEN // page_size
    alloc = PageAllocator(batch * pps + 1, page_size, batch, pps)
    for slot in range(batch):
        assert alloc.alloc(slot, CACHE_LEN)
    caches = init_paged_kv_caches(cfg, batch * pps + 1, page_size, batch, pps)
    tbl = jnp.asarray(alloc.table)
    caches = [c.replace(page_table=tbl + 0) for c in caches]
    paged_s = run(caches)
    return dense_s, paged_s


def moe_decode():
    """MoE model-family decode arm (regression surface for the Mixtral path).

    8-expert top-2 quantized MoE, h2048/i5632/L16 (~2.4B total params), w4 +
    int8 KV + w4 head, batch 8, window 256 — the configuration recorded at
    1324.8 tok/s/chip in BENCH_NOTES round 2 (now with Mixtral renormalized
    gates and drop-free serving capacity, the correctness-first defaults).
    Returns seconds/step.
    """
    import functools

    from bitorch_engine_tpu.models.llama import (
        LlamaModel,
        init_kv_caches,
        mixtral_8x7b,
    )
    from bitorch_engine_tpu.utils.convert import relayout_params_for_tpu

    cfg = mixtral_8x7b(
        hidden_size=2048,
        intermediate_size=5632,
        num_layers=16,
        num_heads=16,
        num_kv_heads=16,
        dtype=jnp.bfloat16,
        w_bit=W_BIT,
        group_size=GROUP,
        max_seq_len=CACHE_LEN,
        kv_cache_dtype="int8",
        quantize_embed=True,
        head_w_bit=4,
        head_pad_to=2048,
        fuse_qkv=True,
        fuse_gate_up=True,
    )
    model = LlamaModel(cfg)
    tokens = jnp.zeros((BATCH, 1), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens)
    params = relayout_params_for_tpu(params, meta_dtype=jnp.bfloat16)
    caches = init_kv_caches(cfg, BATCH, CACHE_LEN)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode_step(params, tok, caches, pos):
        positions = jnp.broadcast_to(pos, (BATCH, 1)).astype(jnp.int32)
        logits, caches = model.apply(
            params, tok, positions=positions, kv_caches=caches,
            cache_len=pos, attn_window=256,
        )
        return jnp.argmax(logits[:, -1], -1)[:, None], caches

    tok = jnp.ones((BATCH, 1), jnp.int32)
    tok, caches = decode_step(params, tok, caches, jnp.asarray(0, jnp.int32))
    int(tok[0, 0])
    pos = 1

    def timed(steps, tok, caches, pos):
        t0 = time.time()
        for i in range(pos, pos + steps):
            tok, caches = decode_step(params, tok, caches, jnp.asarray(i, jnp.int32))
        int(tok[0, 0])
        return (time.time() - t0) / steps, tok, caches, pos + steps

    _, tok, caches, pos = timed(10, tok, caches, pos)  # settle
    d1, tok, caches, pos = timed(50, tok, caches, pos)
    d2, tok, caches, pos = timed(50, tok, caches, pos)
    return min(d1, d2)


def _arm(name, fn, *a, **kw):
    """Fault isolation: a failing secondary arm must never destroy the
    headline JSON (round-3 lesson: the paged arm crashed the whole bench
    and the driver recorded rc=1/parsed=null)."""
    try:
        return fn(*a, **kw), None
    except Exception as e:  # noqa: BLE001 — any arm failure is recorded
        import traceback

        traceback.print_exc(file=sys.stderr)
        msg = f"{type(e).__name__}: {e}"
        print(f"# ARM FAILED {name}: {msg[:200]}", file=sys.stderr, flush=True)
        return None, msg[:300]


def mbwq_decode():
    """7B MBWQ 2.5-bit decode arm — the reference's headline capability
    (fewer bits ⇒ more tokens/s in the memory-bound regime; exl2 mixed-bit
    GEMV ``q_gemm_kernel.cuh:36`` + 2-bit dequant ``qdq_2.cuh:26-51``).
    llama2-7B, strategy 25% w4 / 75% w2 (avg 2.5 bits), g64, int8 KV, w4
    head.  BENCH_MBWQ_A8=1 (default) routes w2 segments through the A8
    int8-MXU quad layout (the round-3 VPU-extract-bound fix); =0 keeps
    bf16 activations (reference-parity A16W2).  Returns seconds/step.
    """
    import functools

    from bitorch_engine_tpu.models.llama import (
        LlamaModel,
        init_kv_caches,
        llama2_7b,
    )
    from bitorch_engine_tpu.utils.convert import relayout_params_for_tpu

    # group_size 64: half the group-metadata stream and double the dot-K of
    # g32 (measured 7.65 vs 9.63 ms/step, round-4 probe-5 A/B); quality is
    # bounded by the ppl gate's rel_delta_mbwq_2p5g64_a8 band (+1.22%, on
    # par with g32's +1.26%).  BENCH_MBWQ_GS=32 reverts.
    # per-bit override for the w2 segments (BENCH_MBWQ_W2GS): g128 runs the
    # w2 dots at the MXU's native K and quarters group bookkeeping (the
    # round-5 uniform-w2 lever).  Default 128: measured 1295 vs 1188 tok/s
    # at g64 (same-process A/B, round 5); quality bounded by the ppl
    # gate's rel_delta_mbwq_2p5_w2g128 (+1.30%, vs +1.21% at g64).
    # BENCH_MBWQ_W2GS=0 reverts to the uniform-gs strategy.
    w2gs = int(os.environ.get("BENCH_MBWQ_W2GS", "128"))
    cfg = llama2_7b(
        dtype=jnp.bfloat16,
        mbwq_strategy=((4, 0.25), (2, 0.75, w2gs) if w2gs else (2, 0.75)),
        quant_mid_sym=os.environ.get("BENCH_MBWQ_MIDSYM", "0") == "1",
        group_size=int(os.environ.get("BENCH_MBWQ_GS", "64")),
        max_seq_len=CACHE_LEN,
        kv_cache_dtype="int8",
        quantize_embed=True,
        head_w_bit=4,
        head_pad_to=2048,
        fuse_qkv=True,
        fuse_gate_up=True,
        # gate|up N=22016 = 512·43 only admits 512-wide kernel N-blocks
        # (~240 GB/s); padding to 22528 unlocks 2048-wide (~420) for 2.3%
        # extra bytes (BENCH_MBWQ_PAD=0 disables)
        proj_pad_to=0 if os.environ.get("BENCH_MBWQ_PAD", "1") == "0" else 2048,
    )
    model = LlamaModel(cfg)
    tokens = jnp.zeros((BATCH, 1), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens)
    a8 = os.environ.get("BENCH_MBWQ_A8", "1") != "0"
    params = relayout_params_for_tpu(
        params, meta_dtype=jnp.bfloat16, act_bits_map={2: 8} if a8 else None
    )
    caches = init_kv_caches(cfg, BATCH, CACHE_LEN)

    # MHA window bucket floor 128 (not the GQA arms' 256): llama2-7B streams
    # 4× the KV bytes per cached position of the 8-kv-head models, so the
    # smaller early-sequence bucket matters — the round-4 trace put the
    # window-256 attention einsums at 1.14 ms/step, ~15% of the whole step.
    # All timed positions stay < 127, honoring the window >= cache_len+1
    # contract (BENCH_MBWQ_WIN overrides).
    window = int(os.environ.get("BENCH_MBWQ_WIN", "128"))

    @functools.partial(jax.jit, donate_argnums=(2,), static_argnames=("win",))
    def decode_step(params, tok, caches, pos, win=window):
        positions = jnp.broadcast_to(pos, (BATCH, 1)).astype(jnp.int32)
        logits, caches = model.apply(
            params, tok, positions=positions, kv_caches=caches,
            cache_len=pos, attn_window=win,
        )
        return jnp.argmax(logits[:, -1], -1)[:, None], caches

    tok = jnp.ones((BATCH, 1), jnp.int32)
    tok, caches = decode_step(params, tok, caches, jnp.asarray(0, jnp.int32))
    int(tok[0, 0])
    pos = 1

    def timed(steps, tok, caches, pos):
        t0 = time.time()
        for i in range(pos, pos + steps):
            tok, caches = decode_step(params, tok, caches, jnp.asarray(i, jnp.int32))
        int(tok[0, 0])
        return (time.time() - t0) / steps, tok, caches, pos + steps

    # repeat-and-spread protocol (VERDICT r4 next-step 4): ≥3 timed chunks
    # in one process (same compile), median+spread recorded so driver/
    # builder disagreements are attributable to variance, not config.
    # Chunk length keeps every timed position < window (the >= cache_len+1
    # contract at win=128): 1 + 10 + 3·35 = 116.
    _, tok, caches, pos = timed(10, tok, caches, pos)
    ds = []
    for _ in range(3):
        d, tok, caches, pos = timed(35, tok, caches, pos)
        ds.append(d)
    return ds


def serving_step_bytes(w_bit, group_size, kv_window, head_bits, head_pad, meta_b):
    """HBM bytes one decode step must stream on the serving config: packed
    projection codes + group metadata + quantized lm_head + KV window."""
    packed_bytes = sum(
        k * n * w_bit // 8 + 2 * (k // group_size) * n * meta_b
        for _, k, n in PROJS
    )
    kv_heads, head_dim = 8, 128
    kv_bytes = 2 * BATCH * kv_window * kv_heads * head_dim * 1 * LAYERS
    if head_bits in (2, 4):
        n_head = (VOCAB + head_pad - 1) // head_pad * head_pad if head_pad else VOCAB
        lm_bytes = (
            n_head * HIDDEN * head_bits // 8 + 2 * (HIDDEN // GROUP) * n_head * meta_b
        )
    else:
        lm_bytes = VOCAB * HIDDEN * 1
    return packed_bytes * LAYERS + lm_bytes + kv_bytes


def prefill_arm(seq=512):
    """Chunkless prefill of batch-8 × ``seq``-token prompts on the w4
    serving config (flash attention + streaming-dequant + MXU matmul —
    the reference's reconstruct+GEMM regime, ``mpq_layer.py:59-65``).
    Returns seconds per prefill; compute-bound, so the record metric is
    %-of-MXU-roofline (BENCH_NOTES round 2: 8987 tok/s/chip).
    Driver-visible per VERDICT r4 missing #3."""
    import functools

    from bitorch_engine_tpu.models.llama import LlamaModel, init_kv_caches, llama3_8b
    from bitorch_engine_tpu.utils.convert import relayout_params_for_tpu

    cfg = llama3_8b(
        dtype=jnp.bfloat16, w_bit=W_BIT, group_size=GROUP,
        max_seq_len=CACHE_LEN, kv_cache_dtype="int8", quantize_embed=True,
        head_w_bit=4, head_pad_to=2048, fuse_qkv=True, fuse_gate_up=True,
    )
    model = LlamaModel(cfg)
    toks = jnp.ones((BATCH, seq), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((BATCH, 1), jnp.int32))
    params = relayout_params_for_tpu(params, meta_dtype=jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def prefill(params, toks, caches):
        positions = jnp.broadcast_to(jnp.arange(seq, dtype=jnp.int32), (BATCH, seq))
        # attn_window=0: prefill-from-empty — pure causal (flash) attention,
        # no cache read, KV written into the donated caches.  The scalar
        # logits reduction keeps the per-call fetch tiny; fetching it
        # forces the whole computation (the head matmul feeds it).
        logits, caches = model.apply(
            params, toks, positions=positions, kv_caches=caches,
            cache_len=jnp.asarray(0, jnp.int32), attn_window=0,
        )
        return jnp.sum(logits[:, -1].astype(jnp.float32)), caches

    def run(n):
        # n chained prefills, ONE host sync at the end: per-dispatch RPC
        # latency (hundreds of ms through this sandbox's TPU tunnel —
        # round-5 trace: 714 ms wall vs ~450 ms device busy) amortizes,
        # like the decode arms' 50-steps-per-sync loops
        caches = init_kv_caches(cfg, BATCH, CACHE_LEN)
        sums = []
        t0 = time.time()
        for _ in range(n):
            s, caches = prefill(params, toks, caches)
            sums.append(s)
        for s in sums:  # fetch all: earlier heads must not be DCE-able
            float(s)
        return (time.time() - t0) / n

    run(1)  # compile + settle
    run(2)
    return min(run(3), run(3))


def train_step_arm(seq=2048):
    """One fine-tune step (flash fwd+bwd + remat + DiodeMix MPQ update) on
    the ~370M-param MHA config recorded in BENCH_NOTES round 3 (744.6
    ms/step, 22.0k tok/s, 1.63× vs einsum+remat).  Returns seconds/step.
    The reference's QAT identity (README.md:18) — driver-visible per
    VERDICT r4 missing #3."""
    from bitorch_engine_tpu.models.llama import LlamaConfig, LlamaModel
    from bitorch_engine_tpu.optim import DiodeHyperParams
    from bitorch_engine_tpu.training import create_train_state, make_train_step
    from bitorch_engine_tpu.utils import prepare_for_training

    batch = 8
    cfg = LlamaConfig(
        vocab_size=32000,
        hidden_size=1024,
        intermediate_size=2816,
        num_layers=24,
        num_heads=16,
        num_kv_heads=16,
        max_seq_len=seq,
        quantized=True,
        w_bit=W_BIT,
        group_size=GROUP,
        use_flash_attention=True,
        remat=True,
        dtype=jnp.bfloat16,
    )
    model = LlamaModel(cfg)
    toks = jax.random.randint(
        jax.random.PRNGKey(1), (batch, seq + 1), 0, cfg.vocab_size
    ).astype(jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), toks[:, :8])
    params = prepare_for_training(params)
    hp = DiodeHyperParams(lr=1e-4)

    def loss_fn(params, batch_toks):
        logits, _ = model.apply(params, batch_toks[:, :-1])
        labels = batch_toks[:, 1:]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], -1))

    step = make_train_step(loss_fn, hp)
    state = create_train_state(params, hp)
    state, metrics = step(state, toks)
    float(metrics["loss"])  # compile + settle
    times = []
    for _ in range(5):
        t0 = time.time()
        state, metrics = step(state, toks)
        float(metrics["loss"])
        times.append(time.time() - t0)
    return min(times)


def main():
    on_tpu = jax.default_backend() == "tpu"
    total_q, total_b = projection_sweep(on_tpu)

    run_e2e = on_tpu and os.environ.get("BENCH_E2E", "1") != "0"
    e2e_err = None
    if run_e2e:
        # headline config: 4-bit weights + int8 KV cache + int8 embedding +
        # w4g128 lm_head via the fused kernel (exl2-style head quantization;
        # BENCH_HEAD_BITS=8 falls back to the tied int8 head)
        head_bits = int(os.environ.get("BENCH_HEAD_BITS", "4"))
        res, e2e_err = _arm(
            "e2e_decode",
            e2e_decode,
            "int8",
            head_bits if head_bits in (2, 4) else None,
        )
        if res is None:
            run_e2e = False  # fall through to the projected metric
        else:
            step, kv_window, step_full = res
    if run_e2e:
        toks = BATCH / step
        # bf16 baseline: same step with weight-matmul time swapped for bf16
        overhead = max(step - total_q * LAYERS, 0.0)
        bf16_step = total_b * LAYERS + overhead
        toks_b = BATCH / bf16_step
        label = "llama3_8b_w4_serving_decode_tokens_per_sec_per_chip"
        head_desc = f"w{head_bits} lm_head" if head_bits in (2, 4) else "int8 lm_head"
        unit = (
            f"tokens/s/chip (end-to-end decode, batch={BATCH}, cache={CACHE_LEN},"
            f" attention window {kv_window}, int8 KV + {head_desc})"
        )
    else:
        kv_window, step_full = CACHE_LEN, None
        # projection-level projection (CPU or E2E disabled)
        lm_time = VOCAB * HIDDEN * 2 / HBM_BW
        step = total_q * LAYERS + lm_time
        bf16_step = total_b * LAYERS + lm_time
        toks = BATCH / step
        toks_b = BATCH / bf16_step
        label = "llama3_8b_w4g128_decode_tokens_per_sec_per_chip_projected"
        unit = f"tokens/s/chip (projected from projection kernels, batch={BATCH})"

    # roofline for the serving config: packed weights + group metadata
    # (bf16 by default) + quantized lm_head + int8 KV cache, read once/step.
    # KV bytes count the attention window actually read during the timed
    # steps (the bucketed window makes early-sequence decode read a prefix,
    # not the whole allocation).
    meta_b = 4 if os.environ.get("BENCH_META", "bf16") == "fp32" else 2
    head_bits_rl = int(os.environ.get("BENCH_HEAD_BITS", "4"))
    if not (run_e2e and head_bits_rl in (2, 4)):
        head_bits_rl = None
    head_pad_rl = int(os.environ.get("BENCH_HEAD_PAD", "2048"))
    step_bytes = serving_step_bytes(
        W_BIT, GROUP, kv_window, head_bits_rl, head_pad_rl, meta_b
    )
    roofline_toks = BATCH / (step_bytes / HBM_BW)

    # paged-KV decode arm (serving memory layout; in-place paged kernel)
    paged_extra = {}
    if run_e2e and os.environ.get("BENCH_PAGED", "1") != "0":
        print(f"# [{time.strftime('%H:%M:%S')}] paged decode arm ...", file=sys.stderr, flush=True)
        paged_step, err = _arm("e2e_decode_paged", e2e_decode_paged)
        # on-chip numerics gate: paged-kernel logits vs dense over 64 forced
        # steps (tokens may diverge, logits must not drift — VERDICT r3 wp7)
        def _gate():
            from tools.paged_gate import run_paged_logits_gate

            return run_paged_logits_gate(steps=64)

        gate, gerr = _arm("paged_logits_gate", _gate)
        gate_extra = (
            {"paged_gate_error": gerr}
            if gate is None
            else {
                "paged_gate_max_rel": round(gate["max_rel"], 5),
                "paged_gate_ok": gate["ok"],
            }
        )
        if gate is not None:
            print(
                f"# paged logits gate: max rel {gate['max_rel']:.2e} over "
                f"{gate['steps']} steps (tol {gate['tol']}) -> "
                f"{'OK' if gate['ok'] else 'DRIFT'}",
                file=sys.stderr,
            )
        if paged_step is None:
            paged_extra = {"paged_error": err, **gate_extra}
        else:
            paged_extra = {
                "paged_decode_toks_per_s": round(BATCH / paged_step, 2),
                "paged_vs_dense_ratio": round(paged_step / step, 3),
                **gate_extra,
            }
            print(
                f"# paged decode: {BATCH/paged_step:.1f} tok/s/chip "
                f"({paged_step/step:.3f}x dense)",
                file=sys.stderr,
            )

    # batch-64 paged-vs-dense arm (round-3 cliff regression surface)
    b64_extra = {}
    if run_e2e and os.environ.get("BENCH_PAGED_B64", "1") != "0":
        print(f"# [{time.strftime('%H:%M:%S')}] b64 paged/dense arm ...", file=sys.stderr, flush=True)
        res, err = _arm("b64_paged_vs_dense", b64_paged_vs_dense)
        if res is None:
            b64_extra = {"b64_error": err}
        else:
            d64, p64 = res
            b64_extra = {
                "b64_dense_toks_per_s": round(64 / d64, 2),
                "b64_paged_toks_per_s": round(64 / p64, 2),
                "b64_paged_vs_dense_ratio": round(p64 / d64, 3),
            }
            print(
                f"# b64: dense {64/d64:.0f} tok/s, paged {64/p64:.0f} "
                f"({p64/d64:.3f}x dense)",
                file=sys.stderr,
            )

    # MoE decode arm (driver-tracked regression surface for the MoE family)
    moe_extra = {}
    if run_e2e and os.environ.get("BENCH_MOE", "1") != "0":
        print(f"# [{time.strftime('%H:%M:%S')}] MoE decode arm ...", file=sys.stderr, flush=True)
        moe_step, err = _arm("moe_decode", moe_decode)
        if moe_step is None:
            moe_extra = {"moe_error": err}
        else:
            moe_extra = {
                "moe_decode_toks_per_s": round(BATCH / moe_step, 2),
                "moe_decode_ms_per_step": round(moe_step * 1e3, 2),
            }
            print(
                f"# moe decode: {BATCH/moe_step:.1f} tok/s/chip ({moe_step*1e3:.2f} ms/step)",
                file=sys.stderr,
            )

    # MBWQ 2.5-bit decode arm (the reference's mixed-bit headline; now
    # driver-recorded — round-3 numbers were builder-measured only)
    mbwq_extra = {}
    if run_e2e and os.environ.get("BENCH_MBWQ", "1") != "0":
        print(f"# [{time.strftime('%H:%M:%S')}] MBWQ decode arm ...", file=sys.stderr, flush=True)
        mbwq_steps, err = _arm("mbwq_decode", mbwq_decode)
        if mbwq_steps is None:
            mbwq_extra = {"mbwq_error": err}
        else:
            import statistics

            mbwq_step = statistics.median(mbwq_steps)
            mbwq_extra = {
                "mbwq_2p5_decode_toks_per_s": round(BATCH / mbwq_step, 2),
                "mbwq_2p5_ms_per_step": round(mbwq_step * 1e3, 2),
                # per-chunk spread: median is the reported number; a
                # driver/builder disagreement inside [min, max] is process
                # variance, not a config difference (VERDICT r4 ns-4)
                "mbwq_2p5_toks_spread": [
                    round(BATCH / d, 1) for d in sorted(mbwq_steps, reverse=True)
                ],
                "mbwq_act_bits": 8 if os.environ.get("BENCH_MBWQ_A8", "1") != "0" else 16,
            }
            print(
                f"# mbwq 2.5-bit decode: {BATCH/mbwq_step:.1f} tok/s/chip "
                f"({mbwq_step*1e3:.2f} ms/step; spread "
                f"{mbwq_extra['mbwq_2p5_toks_spread']})",
                file=sys.stderr,
            )

    # uniform-w2 llama3-8B arm: the controlled "fewer bits ⇒ faster"
    # comparison (identical model/batch/cache/window/head to the w4
    # headline; only projection bits differ: w2g128 A8-quad vs w4g128 A16
    # — the reference's byte-proportional claim, README.md:19, measured
    # same-model for the first time; VERDICT r4 next-step 1a).  Quality
    # config gated by tools/ppl_gate.py rel_delta_w2g128_a8; kernel
    # numerics gated on-chip by tools/quad_gate.py.
    w2_extra = {}
    if run_e2e and os.environ.get("BENCH_W2", "1") != "0":
        print(f"# [{time.strftime('%H:%M:%S')}] uniform-w2 decode arm ...", file=sys.stderr, flush=True)
        res, err = _arm(
            "w2_decode",
            e2e_decode,
            "int8",
            head_bits if head_bits in (2, 4) else None,
            w_bit=2,
            group_size=128,
            act8=True,
            measure_full=False,
        )

        def _qgate():
            from tools.quad_gate import run_quad_logits_gate

            return run_quad_logits_gate()

        qgate, qerr = _arm("quad_logits_gate", _qgate)
        qgate_extra = (
            {"quad_gate_error": qerr}
            if qgate is None
            else {
                "quad_gate_max_rel": round(qgate["max_rel"], 5),
                "quad_gate_ok": qgate["ok"],
            }
        )
        if qgate is not None:
            print(
                f"# quad kernel gate (f32, pre-cast): max rel "
                f"{qgate['max_rel']:.2e} over {qgate['shapes']} shapes "
                f"(tol {qgate['tol']}) -> "
                f"{'OK' if qgate['ok'] else 'DRIFT'}",
                file=sys.stderr,
            )
        if res is None:
            w2_extra = {"w2_error": err, **qgate_extra}
        else:
            w2_step, w2_window, _ = res
            w2_bytes = serving_step_bytes(
                2, 128, w2_window, head_bits_rl, head_pad_rl, meta_b
            )
            w2_roofline = BATCH / (w2_bytes / HBM_BW)
            w2_toks = BATCH / w2_step
            w2_extra = {
                "w2_decode_toks_per_s": round(w2_toks, 2),
                "w2_ms_per_step": round(w2_step * 1e3, 2),
                "w2_vs_w4_speedup": round(step / w2_step, 3),
                "w2_pct_of_roofline": round(100 * w2_toks / w2_roofline, 1),
                **qgate_extra,
            }
            print(
                f"# w2 decode: {w2_toks:.1f} tok/s/chip ({w2_step*1e3:.2f} ms/step, "
                f"{100*w2_toks/w2_roofline:.1f}% of w2 roofline) — "
                f"{step/w2_step:.3f}x the w4 arm",
                file=sys.stderr,
            )

    # prefill arm (compute-bound regime; VERDICT r4 missing #3)
    prefill_extra = {}
    if run_e2e and os.environ.get("BENCH_PREFILL", "1") != "0":
        print(f"# [{time.strftime('%H:%M:%S')}] prefill arm ...", file=sys.stderr, flush=True)
        pf, err = _arm("prefill", prefill_arm)
        if pf is None:
            prefill_extra = {"prefill_error": err}
        else:
            pf_seq = 512
            pf_toks = BATCH * pf_seq / pf
            # MXU roofline: 2 FLOPs per weight per token on the projection
            # + lm_head matmuls (attention flops are O(seq²·h) ≈ 4% here)
            proj_params = sum(k * n for _, k, n in PROJS) * LAYERS
            flops = 2 * (proj_params + VOCAB * HIDDEN) * BATCH * pf_seq
            mxu_peak = 197e12  # v5e bf16
            prefill_extra = {
                "prefill_toks_per_s": round(pf_toks, 1),
                "prefill_ms": round(pf * 1e3, 1),
                "prefill_pct_of_mxu_roofline": round(
                    100 * (flops / pf) / mxu_peak, 1
                ),
            }
            print(
                f"# prefill b{BATCH}xs{pf_seq}: {pf_toks:.0f} tok/s/chip "
                f"({pf*1e3:.0f} ms, {prefill_extra['prefill_pct_of_mxu_roofline']:.0f}% MXU)",
                file=sys.stderr,
            )

    # fine-tune-step arm (the reference's QAT identity; VERDICT r4 missing #3)
    train_extra = {}
    if run_e2e and os.environ.get("BENCH_TRAIN", "1") != "0":
        print(f"# [{time.strftime('%H:%M:%S')}] train-step arm ...", file=sys.stderr, flush=True)
        ts, err = _arm("train_step", train_step_arm)
        if ts is None:
            train_extra = {"train_error": err}
        else:
            train_extra = {
                "train_step_ms": round(ts * 1e3, 1),
                "train_toks_per_s": round(8 * 2048 / ts, 1),
            }
            print(
                f"# train step (370M b8xs2048 flash+remat+DiodeMix): "
                f"{ts*1e3:.1f} ms/step ({8*2048/ts:.0f} tok/s)",
                file=sys.stderr,
            )

    # full-cache secondary metric (long-context operating point)
    full_extra = {}
    if run_e2e and step_full is not None:
        full_bytes = serving_step_bytes(
            W_BIT, GROUP, CACHE_LEN, head_bits_rl, head_pad_rl, meta_b
        )
        rl_full = BATCH / (full_bytes / HBM_BW)
        toks_full = BATCH / step_full
        full_extra = {
            "full_cache_toks_per_s": round(toks_full, 2),
            "full_cache_pct_of_roofline": round(100 * toks_full / rl_full, 1),
            "full_cache_ms_per_step": round(step_full * 1e3, 2),
        }

    print(
        f"# decode: {toks:.1f} tok/s/chip | bf16-equivalent {toks_b:.1f} | "
        f"roofline {roofline_toks:.1f} ({100*toks/roofline_toks:.0f}%)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": label,
                "value": round(toks, 2),
                "unit": unit,
                "vs_baseline": round(toks / toks_b, 3),
                "extra": {
                    "bf16_baseline_toks_per_s": round(toks_b, 2),
                    "hbm_roofline_toks_per_s": round(roofline_toks, 2),
                    "pct_of_roofline": round(100 * toks / roofline_toks, 1),
                    "ms_per_step": round(1e3 * BATCH / toks, 2),
                    "backend": jax.default_backend(),
                    **({"e2e_error": e2e_err} if e2e_err else {}),
                    **paged_extra,
                    **b64_extra,
                    **moe_extra,
                    **mbwq_extra,
                    **w2_extra,
                    **prefill_extra,
                    **train_extra,
                    **full_extra,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
