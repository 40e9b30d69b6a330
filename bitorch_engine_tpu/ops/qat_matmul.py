"""Q4MatMul — 4-bit quantized batched matmul with learnable clip scales.

TPU-native re-design of the reference's quantized attention matmul
(``nbit/cutlass/q4_layer.py:215-383`` ``Q4MatMulFunction`` / ``Q4MatMul``,
CUTLASS entry points ``q_linear_cutlass.cpp:310-331`` ``q4_matmul`` /
``q4_matmul_backward``): both operands are dynamically quantized to int4
with per-tensor learnable clip scales, multiplied as integers, and the
result rescaled by ``x_clip * y_clip``.

TPU mapping: int4 values are carried in int8 lanes and contracted with
``lax.dot_general(..., preferred_element_type=int32)`` — the MXU's native
8-bit integer mode, the analogue of CUTLASS's int4 tensor-core GEMM (the
MXU has no int4 mode; throughput is identical since the MXU multiplier is
shared, and the memory win of true 4-bit storage is irrelevant for
transient attention operands).

Deviations from the reference, both deliberate:

* The reference's python-side clip masks use the int8 bounds [-128, 127]
  even though the kernel quantizes to int4 (a copy from the Q8 path,
  ``q4_layer.py:289-307``); we use the int4 bounds [-8, 7] consistently so
  the STE mask matches what the forward actually clipped.
* The reference quantizes the incoming gradient to int8 (``scale_grad``)
  so its backward GEMMs run on integer tensor cores; on TPU the backward
  runs in fp32/bf16 on the same MXU with no speed penalty, so we skip the
  gradient-quantization noise.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_Q4_LOW, _Q4_HIGH = -8.0, 7.0

# dynamic scale init: alpha = 2 * E|x| / sqrt(Qp) with Qp = 127
# (reference ``set_activation_scale``, q4_layer.py:355-369; the 11.269
# constant is sqrt(127))
_LSQ_DIV = 11.269


def init_clip_scale(x: Array) -> Array:
    """Data-dependent LSQ clip-scale init (``q4_layer.py:362-368``)."""
    return (2.0 * jnp.mean(jnp.abs(x.astype(jnp.float32))) / _LSQ_DIV).reshape(())


def _quantize(x: Array, clip: Array) -> Tuple[Array, Array]:
    scale = jnp.maximum(clip.astype(jnp.float32), 1e-5)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), _Q4_LOW, _Q4_HIGH)
    return q, scale


def _batched_int_mm(q_x: Array, q_y: Array) -> Array:
    """int8 batched GEMM on the MXU: (..., M, K) x (..., N, K) -> int32 (..., M, N)."""
    nb = q_x.ndim - 2
    batch = tuple(range(nb))
    return jax.lax.dot_general(
        q_x,
        q_y,
        dimension_numbers=(((q_x.ndim - 1,), (q_y.ndim - 1,)), (batch, batch)),
        preferred_element_type=jnp.int32,
    )


def q4_matmul(x: Array, y: Array, x_clip: Array, y_clip: Array) -> Array:
    """``quant4(x) @ quant4(y)^T`` rescaled — ``out ≈ x @ y^T``.

    ``x``: ``(..., M, K)``, ``y``: ``(..., N, K)`` (contraction on the last
    axis of both, matching the reference's ``(bs, m, k) x (bs, n, k)``
    convention); leading batch dims must agree.  ``x_clip``/``y_clip`` are
    scalar learnable clip scales (see :func:`init_clip_scale`).
    """
    if x.ndim < 3 or y.ndim < 3:
        raise ValueError(
            f"q4_matmul expects batched operands (ndim > 2), got {x.ndim}/{y.ndim} "
            "(parity with reference Q4MatMul.forward assertion)"
        )
    return _q4_matmul(x, y, x_clip, y_clip)


@jax.custom_vjp
def _q4_matmul(x, y, x_clip, y_clip):
    out, *_ = _q4_fwd_math(x, y, x_clip, y_clip)
    return out


def _q4_fwd_math(x, y, x_clip, y_clip):
    q_x, sx = _quantize(x, x_clip)
    q_y, sy = _quantize(y, y_clip)
    acc = _batched_int_mm(q_x.astype(jnp.int8), q_y.astype(jnp.int8))
    out = (acc.astype(jnp.float32) * (sx * sy)).astype(x.dtype)
    return out, q_x, q_y, sx, sy


def _q4_fwd(x, y, x_clip, y_clip):
    out, q_x, q_y, sx, sy = _q4_fwd_math(x, y, x_clip, y_clip)
    return out, (x, y, q_x, q_y, sx, sy, x_clip, y_clip)


def _lsq_terms(x, scale, grad, numel):
    """Shared STE mask + LSQ scale gradient (``q4_layer.py:289-307`` with
    the int4 bounds; grad-scale normalizer ``1/sqrt(numel * Qp)``)."""
    q = x.astype(jnp.float32) / scale
    small = (q < _Q4_LOW).astype(jnp.float32)
    large = (q > _Q4_HIGH).astype(jnp.float32)
    middle = 1.0 - small - large
    masked = grad * middle
    grad_scale = jnp.sum(
        (small * _Q4_LOW + large * _Q4_HIGH + middle * (jnp.round(q) - q)) * masked
    ) / math.sqrt(numel * _Q4_HIGH)
    return masked, grad_scale


def _q4_bwd(res, g):
    x, y, q_x, q_y, sx, sy, x_clip, y_clip = res
    g32 = g.astype(jnp.float32)

    # grad wrt x: g (.., M, N) @ dequant(y) (.., N, K) -> (.., M, K)
    nb = g32.ndim - 2
    batch = tuple(range(nb))
    y_fp = q_y * sy
    x_fp = q_x * sx
    grad_x = jax.lax.dot_general(
        g32, y_fp,
        dimension_numbers=(((g32.ndim - 1,), (y_fp.ndim - 2,)), (batch, batch)),
        preferred_element_type=jnp.float32,
    )
    # grad wrt y: g^T (.., N, M) @ dequant(x) (.., M, K) -> (.., N, K)
    grad_y = jax.lax.dot_general(
        jnp.swapaxes(g32, -1, -2), x_fp,
        dimension_numbers=(((g32.ndim - 1,), (x_fp.ndim - 2,)), (batch, batch)),
        preferred_element_type=jnp.float32,
    )
    grad_x, grad_xc = _lsq_terms(x, sx, grad_x, x.size)
    grad_y, grad_yc = _lsq_terms(y, sy, grad_y, y.size)
    return (
        grad_x.astype(x.dtype),
        grad_y.astype(y.dtype),
        grad_xc.astype(x_clip.dtype).reshape(x_clip.shape),
        grad_yc.astype(y_clip.dtype).reshape(y_clip.shape),
    )


_q4_matmul.defvjp(_q4_fwd, _q4_bwd)
