"""MPQ (mixed-precision-quantized, weight-only) linear op.

TPU-native re-design of the reference's MPQ stack
(``nbit/cuda/mpq_layer.py:14-120`` autograd Function +
``mpq_linear_cuda_kernel.cu`` fused dequant GEMV):

* Forward: ``out = x @ dequant(qweight)`` with 16-bit activations and
  1/2/4/8-bit group-quantized weights.  Two regimes, mirroring the
  reference's batch≤32 fused-GEMV vs batch>32 dequant+cuBLAS split
  (``mpq_layer.py:59-65``, ``exl2/config.h:4``):

  - **decode** (small M): the fused Pallas kernel
    (:mod:`bitorch_engine_tpu.ops.pallas.dequant_matmul`) streams packed
    int32 words HBM→VMEM, unpacks to bf16 in-register and feeds the MXU —
    HBM traffic is ``bits/16`` of the bf16 weight, which is the whole
    performance story for memory-bound decode.
  - **prefill/training** (large M): dequantize-to-bf16 (cheap, XLA-fused)
    + plain MXU matmul, compute-bound so the extra bandwidth is hidden.

* Backward (parity ``mpq_layer.py:79-120``):
  ``grad_input = g @ dequant(W)^T`` and the full-rank fp weight cotangent
  ``x^T @ g`` delivered via ``MPQTensor.grad_shadow`` (the reference's
  ``privileged_grad``).  No gradient flows to scales/zeros — the optimizer
  updates zeros out-of-band every 5 steps (``model_helper.py:521-522``).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..qtensor import MPQTensor, qtensor_cotangent
from .quant import dequantize_mpq

Array = jax.Array

# Two-regime dispatch, mirroring the reference's decode/prefill split
# (MAX_Q_GEMM_ROWS=32, exl2/config.h:4) with a TPU-tuned crossover: the
# fused kernel wins while the matmul is HBM-bound (m=8: 2.9-3.5x vs bf16 on
# v5e), but once compute-bound the raw MXU matmul on dequantized bf16 is
# faster (m=2048: fused 157 vs bf16 186 TFLOPs) because the in-kernel
# unpack shares the critical path.  Threshold measured on v5e.
MAX_FUSED_ROWS = 512


def _use_pallas() -> bool:
    """Kernel dispatch gate.  BITORCH_NO_PALLAS=1 forces the XLA fallback —
    read at TRACE time, so A/B gates (tools/quad_gate.py) must build
    separate jit instances per setting."""
    import os

    if os.environ.get("BITORCH_NO_PALLAS", "0") == "1":
        return False
    return jax.default_backend() == "tpu"


def mpq_linear(x: Array, qt: MPQTensor) -> Array:
    """Quantized linear: ``x @ dequant(qt)``, differentiable via custom_vjp.

    ``x``: fp ``(..., K)``; returns ``(..., N)``.
    """
    return _mpq_linear(x, qt)


@jax.custom_vjp
def _mpq_linear(x: Array, qt: MPQTensor) -> Array:
    return _mpq_forward(x, qt)


def _mpq_forward(x: Array, qt: MPQTensor) -> Array:
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2d = x.reshape(-1, k)
    m = x2d.shape[0]

    if _use_pallas() and qt.g_idx is None and m <= MAX_FUSED_ROWS:
        from .pallas.dequant_matmul import mpq_matmul_pallas

        try:
            out = mpq_matmul_pallas(x2d, qt)
            return out.reshape(*lead, -1)
        except NotImplementedError:
            pass

    if qt.act_bits == 8 and m <= MAX_FUSED_ROWS:
        # A8 decode regime on the XLA path: simulate the quad kernel's
        # per-token int8 activation quantization exactly (the integer dot
        # against dequantized weights is algebraically identical to the
        # kernel's code dot + zeros correction), so CPU tests and the
        # perplexity gate measure the same numbers the TPU kernel produces.
        # precision=HIGHEST: the kernel accumulates integer codes EXACTLY
        # (int8 MXU, int32 accumulate); at default precision this f32 dot
        # would bf16-truncate the dequantized weights on TPU and the
        # "simulation" would be the noisier side of the comparison
        # (tools/quad_gate.py measured 7.7% model-level drift from it).
        xf = x2d.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
        qx = jnp.round(xf / sx)
        w = reconstruct_weight(qt, dtype=jnp.float32)
        out = (
            jnp.dot(
                qx,
                w,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            * sx
        ).astype(x.dtype)
        return out.reshape(*lead, -1)

    w = reconstruct_weight(qt, dtype=x.dtype)  # (K, N)
    out = jnp.dot(x2d, w, preferred_element_type=jnp.float32).astype(x.dtype)
    return out.reshape(*lead, -1)


def reconstruct_weight(qt: MPQTensor, dtype) -> Array:
    """Logical fp weight ``(K, N)`` — the reconstruct half of the
    m>MAX_FUSED_ROWS reconstruct-then-MXU regime (the reference's
    reconstruct+cuBLAS path).  On TPU this runs the streaming dequant
    kernel (bit-exact with :func:`dequantize_mpq`; XLA's generic unpack
    materializes a u32 per code — measured 34% of the 8B prefill step,
    BENCH_NOTES round 2), falling back to XLA where the kernel doesn't
    apply."""
    if _use_pallas() and qt.g_idx is None:
        from .pallas.dequant_matmul import dequant_mpq_pallas

        try:
            w = dequant_mpq_pallas(
                qt.replace(q_perm=None) if qt.q_perm is not None else qt,
                dtype=dtype,
            )
            if qt.q_perm is not None:
                # rows stored permuted; same scatter as dequantize_mpq
                w = jnp.zeros_like(w).at[qt.q_perm].set(w)
            return w
        except NotImplementedError:
            pass
    return dequantize_mpq(qt, dtype=dtype)


def _mpq_fwd(x, qt):
    return _mpq_forward(x, qt), (x, qt)


def _mpq_bwd(res, g):
    x, qt = res
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = g.shape[-1]
    g2d = g.reshape(-1, n).astype(x.dtype)
    x2d = x.reshape(-1, k)

    w = reconstruct_weight(qt, dtype=x.dtype)  # (K, N)
    grad_input = jnp.dot(g2d, w.T, preferred_element_type=jnp.float32).astype(x.dtype)

    gw = None
    if qt.grad_shadow is not None:
        # privileged grad: full-rank fp cotangent x^T g (mpq_layer.py:116)
        gw = jnp.dot(x2d.T, g2d, preferred_element_type=jnp.float32)
    grad_qt = qtensor_cotangent(qt, gw)
    return grad_input.reshape(*lead, k), grad_qt


_mpq_linear.defvjp(_mpq_fwd, _mpq_bwd)
