#!/usr/bin/env python
"""On-chip numerics gate for the A8 tpu_quad fused-dequant kernel.

The A8 perplexity gate (tools/ppl_gate.py) runs on the XLA fallback,
which *simulates* the quad kernel's per-token int8 quantization exactly —
so it bounds the quantization damage but cannot catch a hardware
kernel-numerics regression (interpret mode hid exactly such a bug once:
the precision=HIGHEST zeros-dot incident, BENCH_NOTES r2; ADVICE r4
asked for hardware coverage of the quad path).

Gate design (round-5 lesson): model-level logit comparisons are useless
below a few percent — every projection output is bf16-cast, a ~1e-7 f32
difference straddling a rounding boundary becomes a full bf16 ulp
(2^-9), and four layers of RMSNorm/matmul cascade those to 4-5% logit
drift even between two bit-faithful implementations (measured: kernel vs
f32-HIGHEST simulation, per-step shared-cache design, 4.6e-2).  So this
gate compares per projection, in f32, BEFORE the output cast and before
the per-token activation scale is re-applied: the kernel's integer-code
dot + group-scale accumulation + zeros correction against the
XLA-HIGHEST reference on the same int8 activations.  At that point the
two computations differ only by f32 association order — tolerance 1e-4
(one bf16 ulp is 20x that), so a real kernel regression (the r2 incident
was 10-73%) cannot hide.

Run standalone on the chip (``python tools/quad_gate.py``) or from
``bench.py``'s w2 arm (result recorded in the bench JSON).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# the uniform-w2g128 llama3-8B serving shapes (the w2 bench arm's kernel
# calls) + a non-8B shape class as a canary
SHAPES = [
    (4096, 4096),
    (4096, 6144),
    (4096, 28672),
    (14336, 4096),
    (2048, 512),
]


def run_quad_logits_gate(
    shapes=None, m: int = 8, tol: float = 1e-4, w_bit: int = 2, gs: int = 128
):
    """Returns ``{"max_rel": float, "shapes": int, "tol": float, "ok": bool}``."""
    from bitorch_engine_tpu.ops import quant
    from bitorch_engine_tpu.ops.pallas.dequant_matmul import (
        _mpq_matmul_call,
        relayout_tpu,
    )

    shapes = shapes or SHAPES
    max_rel = 0.0
    # each shape is checked in the unsigned (affine-zeros) regime; the
    # last one ALSO exercises the signed-code mid_sym regime (zeros_mid)
    for i, (k, n) in enumerate(shapes):
        key = jax.random.PRNGKey(i)
        w = jax.random.normal(key, (k, n), jnp.float32) * 0.02
        qt = quant.quantize_mpq(
            w, w_bit=w_bit, group_size=gs, asym=False,
            mid_sym=(i == len(shapes) - 1),
        )
        qt8 = relayout_tpu(qt, meta_dtype=jnp.bfloat16, act_bits=8)
        if qt8.layout != "tpu_quad":
            raise RuntimeError(f"{k}x{n}: expected tpu_quad, got {qt8.layout}")
        x = jax.random.normal(jax.random.PRNGKey(100 + i), (m, k), jnp.bfloat16)
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
        qx = jnp.round(xf / sx)
        # kernel, f32 output, pre-cast / pre-sx (exactly what the model
        # path computes before its output rounding)
        out = _mpq_matmul_call(
            qx.astype(jnp.int8),
            qt8.packed,
            qt8.scales,
            qt8.zeros,
            w_bit=qt8.w_bit,
            group_size=qt8.group_size,
            layout=qt8.layout,
            out_dtype=jnp.float32,
            mid_codes=(
                2 ** ((qt8.code_bits or qt8.w_bit) - 1) if qt8.zeros_mid else 0
            ),
        )
        # XLA reference on the SAME integer activations, f32 HIGHEST
        wq = quant.dequantize_mpq(qt8, dtype=jnp.float32)
        ref = jnp.dot(
            qx, wq, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        num = float(jnp.max(jnp.abs(out - ref)))
        den = float(jnp.max(jnp.abs(ref))) + 1e-9
        rel = num / den
        print(f"# quad gate {k}x{n}: rel {rel:.2e}", file=sys.stderr, flush=True)
        max_rel = max(max_rel, rel)
    return {"max_rel": max_rel, "shapes": len(shapes), "tol": tol, "ok": max_rel < tol}


if __name__ == "__main__":
    import json

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    out = run_quad_logits_gate()
    print(json.dumps(out))
    assert out["ok"], f"quad kernel drift {out['max_rel']:.2e} >= tol {out['tol']}"
    print(
        f"QUAD KERNEL GATE PASSED: max rel {out['max_rel']:.2e} over "
        f"{out['shapes']} shapes"
    )
