"""Benchmark: 4-bit Llama-3-8B decode throughput per chip (projected from the
per-projection fused dequant-matmul kernels).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is the speedup vs the bf16-weight decode path (the
"reference equivalent" on this hardware: dequantized 16-bit weights +
MXU matmul — what you'd get without the low-bit engine).  The reference
repo publishes no absolute numbers (BASELINE.md), so the baseline is the
measured bf16 path on the same chip.

Method: time the seven projection GEMMs of a Llama-3-8B block at decode
batch size, multiply by 32 layers + lm_head, derive tokens/s/chip; also
report % of the HBM-bandwidth roofline (v5e: ~819 GB/s).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compile cache — TPU compiles through this sandbox's tunnel cost
# 10-150s each; cached reruns are instant
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bitorch_engine_tpu.ops import quant  # noqa: E402
from bitorch_engine_tpu.ops.pallas.dequant_matmul import mpq_matmul_pallas  # noqa: E402

# Llama-3-8B per-block projections (K, N) and lm_head
HIDDEN, INTER, KV = 4096, 14336, 1024
VOCAB = 128256
LAYERS = 32
PROJS = [
    ("qkv_q", HIDDEN, HIDDEN),
    ("qkv_k", HIDDEN, KV),
    ("qkv_v", HIDDEN, KV),
    ("o", HIDDEN, HIDDEN),
    ("gate", HIDDEN, INTER),
    ("up", HIDDEN, INTER),
    ("down", INTER, HIDDEN),
]
W_BIT = 4
GROUP = 128
BATCH = 8  # decode batch per chip
HBM_BW = 819e9  # v5e


from bitorch_engine_tpu.utils.benchmark import time_op  # noqa: E402


def main():
    on_tpu = jax.default_backend() in ("tpu",)
    total_q = 0.0
    total_bf16 = 0.0
    weight_bytes = 0

    for i, (name, k, n) in enumerate(PROJS):
        # generate on-device: host→device transfers through the sandbox
        # tunnel are slow and would dominate the bench wall clock
        w = jax.random.normal(jax.random.PRNGKey(i), (k, n), jnp.float32) * 0.02
        qt = quant.quantize_mpq(w, w_bit=W_BIT, group_size=GROUP)
        x = jax.random.normal(jax.random.PRNGKey(100 + i), (BATCH, k), jnp.bfloat16)
        if on_tpu:
            from bitorch_engine_tpu.ops.pallas.dequant_matmul import relayout_tpu

            qt = relayout_tpu(qt)
            f_q = lambda x, qt: mpq_matmul_pallas(x, qt)
        else:
            f_q = lambda x, qt: x @ quant.dequantize_mpq(qt, jnp.bfloat16)
        wb = quant.dequantize_mpq(qt, jnp.bfloat16)
        f_b = lambda x, wb: jnp.dot(
            x, wb, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        iters = 1500 if on_tpu else 20
        tq = time_op(f_q, x, qt, iters=iters, reps=5)
        tb = time_op(f_b, x, wb, iters=iters, reps=5)
        total_q += tq
        total_bf16 += tb
        weight_bytes += k * n * W_BIT // 8 + 2 * (k // GROUP) * n * 4
        print(
            f"# {name} ({k}x{n}): fused {tq*1e6:.0f}us  bf16 {tb*1e6:.0f}us  "
            f"speedup {tb/tq:.2f}x",
            file=sys.stderr,
        )

    # lm_head at bf16 (not weight-quantized in the reference flow)
    lm_bytes = VOCAB * HIDDEN * 2
    lm_time = lm_bytes / HBM_BW  # ideal; it's a plain bf16 matmul
    step_q = total_q * LAYERS + lm_time
    step_b = total_bf16 * LAYERS + lm_time
    toks_q = BATCH / step_q
    toks_b = BATCH / step_b

    per_step_bytes = weight_bytes * LAYERS + lm_bytes
    roofline_step = per_step_bytes / HBM_BW
    roofline_toks = BATCH / roofline_step

    print(
        f"# projected decode: fused {toks_q:.1f} tok/s/chip (batch {BATCH}), "
        f"bf16 {toks_b:.1f}, roofline {roofline_toks:.1f} "
        f"({100*toks_q/roofline_toks:.0f}% of roofline)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "llama3_8b_w4g128_decode_tokens_per_sec_per_chip_projected",
                "value": round(toks_q, 2),
                "unit": "tokens/s/chip (batch=8, projected from per-projection kernel times x32 layers)",
                "vs_baseline": round(toks_q / toks_b, 3),
                "extra": {
                    "bf16_baseline_toks": round(toks_b, 2),
                    "hbm_roofline_toks": round(roofline_toks, 2),
                    "pct_of_roofline": round(100 * toks_q / roofline_toks, 1),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
