"""Q4/Q8 QAT linear ops (int activations × int weights) with LSQ-style STE.

TPU-native re-design of the reference CUTLASS QAT layers
(``nbit/cutlass/q4_layer.py:16-97`` / ``q8_layer.py:16-99``):

* Forward: activations are quantized to n-bit with a learnable per-layer
  ``scale_a`` (+ learnable input shift ``bias_a`` handled by the layer
  module), weights live as int8 (IntQTensor) with per-tensor ``scale_w``,
  and the GEMM runs on integer values.  On TPU, int8×int8 → int32
  ``lax.dot_general`` hits the MXU natively — the direct analogue of the
  CUTLASS int4/int8 tensor-core GEMM.  For w_bit=4 the values are still
  carried in int8 containers (TPU has no int4 MXU mode; the memory win for
  *weight-only* 4-bit is covered by the MPQ path instead).
* Backward (parity with ``q4_layer.py:76-97`` / ``q8_layer.py:64-99``):
  - ``grad_input = (g @ (q_w * scale_w)) * mask(|x/scale_a| in range)``
    (NOTE: the reference's Q8 path additionally multiplies by ``scale_a``;
    Q4 does not — we follow each respectively).
  - ``grad_weight = g^T @ (q_a * scale_a)`` delivered via grad_shadow.
  - ``grad_scale_a`` is the LSQ gradient: ``(q_low·1[x<ql] + q_high·1[x>qh]
    + (round(x/s) - x/s)·1[in]) * grad_input / sqrt(numel * q_high)``.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..qtensor import IntQTensor, qtensor_cotangent

Array = jax.Array


def _qrange(w_bit: int) -> Tuple[float, float]:
    return (-(2.0 ** (w_bit - 1)), 2.0 ** (w_bit - 1) - 1.0)


def _int_mm(q_a: Array, q_w: Array) -> Array:
    """int8 GEMM on the MXU: (M, K) x (N, K) -> int32 (M, N)."""
    return jax.lax.dot_general(
        q_a,
        q_w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def qat_linear(x: Array, qt: IntQTensor, scale_a: Array) -> Array:
    """n-bit QAT linear: quantize activations, int GEMM, rescale.

    ``x``: fp ``(..., K)``; ``qt.data``: int8 ``(N, K)``; returns ``(..., N)``.
    """
    return _qat_linear(x, qt, scale_a)


@jax.custom_vjp
def _qat_linear(x, qt, scale_a):
    out, _ = _qat_fwd_math(x, qt, scale_a)
    return out


def _qat_fwd_math(x, qt: IntQTensor, scale_a):
    qlow, qhigh = _qrange(8 if qt.w_bit == 8 else qt.w_bit)
    # activation bits mirror the reference: Q4 layer uses 4-bit acts, Q8 8-bit
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2d = x.reshape(-1, k).astype(jnp.float32)
    scale = jnp.maximum(scale_a.astype(jnp.float32), 1e-5)
    q_a = jnp.clip(jnp.round(x2d / scale), qlow, qhigh)
    acc = _int_mm(q_a.astype(jnp.int8), qt.data)
    out = acc.astype(jnp.float32) * scale * qt.scale_w.astype(jnp.float32)
    return out.reshape(*lead, -1).astype(x.dtype), q_a


def _qat_fwd(x, qt, scale_a):
    out, q_a = _qat_fwd_math(x, qt, scale_a)
    return out, (x, q_a, qt, scale_a)


def _qat_bwd(res, g):
    x, q_a, qt, scale_a = res
    qlow, qhigh = _qrange(8 if qt.w_bit == 8 else qt.w_bit)
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = g.shape[-1]
    g2d = g.reshape(-1, n).astype(jnp.float32)
    x2d = x.reshape(-1, k).astype(jnp.float32)
    scale = jnp.maximum(scale_a.astype(jnp.float32), 1e-5)

    w_fp = qt.data.astype(jnp.float32) * qt.scale_w.astype(jnp.float32)  # (N, K)
    grad_input = jnp.dot(g2d, w_fp, preferred_element_type=jnp.float32)

    q_x = x2d / scale
    small = (q_x < qlow).astype(jnp.float32)
    large = (q_x > qhigh).astype(jnp.float32)
    middle = 1.0 - small - large
    grad_input = grad_input * middle

    # LSQ scale gradient (q4_layer.py:91-97)
    grad_scale_a = jnp.sum(
        (small * qlow + large * qhigh + middle * (jnp.round(q_x) - q_x))
        * grad_input
    ) / math.sqrt(x2d.size * qhigh)

    grad_weight = jnp.dot(
        g2d.T, q_a * scale, preferred_element_type=jnp.float32
    )  # (N, K)

    grad_qt = qtensor_cotangent(qt, grad_weight if qt.grad_shadow is not None else None)

    return (
        grad_input.reshape(*lead, k).astype(x.dtype),
        grad_qt,
        grad_scale_a.astype(scale_a.dtype),
    )


_qat_linear.defvjp(_qat_fwd, _qat_bwd)
