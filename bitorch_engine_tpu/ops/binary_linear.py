"""Binary (1-bit) linear op with STE backward.

TPU-native re-design of the reference's binary linear stack
(``layers/qlinear/binary/cuda/layer.py:25-123`` autograd Function +
``binary_linear_cuda_kernel.cu`` XNOR kernels):

* Forward math: ``out = (x_bin ⊛ w_bin) * scale_a * scale_w`` where ⊛ is the
  ±1-domain GEMM.  Two execution paths:

  - **MXU path** (default, training & large batch): signs are materialized as
    bf16 ±1 and fed to ``jnp.dot`` — on TPU the MXU runs this at full speed
    and XLA fuses the sign() into the matmul operands.  The reference's
    popcount trick exists because GPUs have no cheap ±1 GEMM; the MXU does.
  - **Packed path** (inference, weight packed 32x): XNOR + popcount over
    uint32 words — ``dot = K - 2 * popcount(xor)`` (parity with
    ``binary_linear_cuda_kernel.cu:176,334``), used when weights are stored
    packed and HBM bandwidth dominates.  A Pallas kernel (ops/pallas) covers
    the hot shapes; this file provides the XLA fallback.

* Backward (STE, parity with ``binary/cuda/layer.py:97-123``):
  ``grad_input = g @ sign(W) * scale_w`` masked to the clip range
  ``|x / scale_a| <= 1``; ``grad_weight = g^T @ sign(x) * scale_a`` quantized
  to int8 via nv_tensor_quant; ``grad_scale_a = sum(grad_input_masked *
  sign(x)) / sqrt(numel)``.

The weight gradient is delivered through ``BinaryQTensor.grad_shadow``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..qtensor import BinaryQTensor, qtensor_cotangent
from . import packing
from .quant import nv_tensor_quant

Array = jax.Array


def _sign_pm1(x: Array) -> Array:
    """sign() with sign(0) := +1, matching the >= 0 convention of the packers."""
    return jnp.where(x >= 0, 1.0, -1.0).astype(jnp.float32)


def xnor_popcount_mm(x_packed: Array, w_packed: Array, k: int) -> Array:
    """±1-domain GEMM over sign-packed uint32 words (XLA fallback).

    ``x_packed``: uint32 ``(M, Kw)``; ``w_packed``: uint32 ``(N, Kw)``;
    returns fp32 ``(M, N)`` equal to ``sign(x) @ sign(w)^T`` over K=32*Kw
    logical features (padding bits must be equal in both operands — the
    packers pad with -1).  Domain conversion ``K - 2*popc(xor)`` mirrors
    ``binary_linear_cuda_kernel.cu:176``.
    """
    xors = lax.bitwise_xor(x_packed[:, None, :], w_packed[None, :, :])
    pop = jnp.sum(lax.population_count(xors), axis=-1, dtype=jnp.int32)
    return (k - 2 * pop).astype(jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=())
def binary_linear(x: Array, qt: BinaryQTensor, scale_a: Array, bias_a: Array) -> Array:
    """Binary linear layer core: ``(x + bias_a) ⊛ sign(W)^T * scale_a * scale_w``.

    ``x``: fp ``(..., K)``; ``qt.data``: int8 ``(N, K)`` (QAT) or packed
    uint32 ``(N, K/32)`` (inference); returns fp ``(..., N)``.
    ``bias_a`` is the learnable input shift, ``scale_a`` the learnable
    activation scale (``binary/cuda/layer.py:233-248``).
    """
    out, _ = _binary_linear_fwd(x, qt, scale_a, bias_a)
    return out


def _binary_forward_math(x, qt: BinaryQTensor, scale_a, bias_a):
    xs = (x + bias_a).astype(jnp.float32)
    if qt.packed:
        k = qt.logical_shape[1]
        kw = qt.data.shape[1]
        lead = xs.shape[:-1]
        x2d = xs.reshape(-1, k)
        # Adaptive dispatch (the reference's m-dependent kernel pick,
        # binary_linear_cuda_kernel.cu:612-626), measured on v5e (4096²,
        # same-process A/B, BENCH_NOTES round 5): the packed-VPU popcount
        # GEMV reads 1/16 the weight bytes and wins while HBM-bound —
        # 18.2 vs 47.0 µs at m=8 (0.39×) — but scales with m on the VPU
        # and loses by m=32 (66.2 vs 45.9 µs).  Past the crossover,
        # unpacking signs to bf16 once (~2 bytes/weight of extra traffic)
        # and riding the MXU is faster.
        if jax.default_backend() == "tpu" and x2d.shape[0] <= 16:
            from .pallas.binary_gemm import xnor_gemm_pallas

            xp, _ = packing.pad_to_multiple(x2d, 1, 32, value=-1.0)
            y = xnor_gemm_pallas(packing.pack_signs(xp), qt.data, k)
        elif jax.default_backend() == "tpu":
            w_sign = packing.unpack_signs(qt.data, jnp.bfloat16)[:, :k]  # (N, K)
            y = jnp.dot(
                _sign_pm1(x2d).astype(jnp.bfloat16),
                w_sign.T,
                preferred_element_type=jnp.float32,
            )
        else:
            xp, _ = packing.pad_to_multiple(x2d, 1, 32, value=-1.0)
            y = xnor_popcount_mm(packing.pack_signs(xp), qt.data, kw * 32)
            # padding bits in both operands are -1 → contribute +1 each
            y = y - (kw * 32 - k)
        y = y.reshape(*lead, -1)
    else:
        w_sign = _sign_pm1(qt.data.astype(jnp.float32))  # (N, K)
        y = jnp.dot(
            _sign_pm1(xs), w_sign.T, preferred_element_type=jnp.float32
        )
    return (y * scale_a * qt.scale_w).astype(x.dtype), xs


def _binary_linear_fwd(x, qt, scale_a, bias_a):
    out, xs = _binary_forward_math(x, qt, scale_a, bias_a)
    return out, (xs, qt, scale_a)


def _binary_linear_bwd(res, g):
    xs, qt, scale_a = res
    g32 = g.astype(jnp.float32)
    lead = g32.shape[:-1]
    n = g32.shape[-1]
    g2d = g32.reshape(-1, n)
    if qt.packed:
        w_sign = packing.unpack_signs(qt.data)[:, : qt.logical_shape[1]]  # (N, K)
    else:
        w_sign = _sign_pm1(qt.data.astype(jnp.float32))
    k = w_sign.shape[1]
    x2d = xs.reshape(-1, k)

    # grad_input = g @ sign(W) * scale_w, STE-masked to |x/scale_a| <= 1
    grad_input = jnp.dot(g2d, w_sign * qt.scale_w, preferred_element_type=jnp.float32)
    q_w = x2d / scale_a
    in_range = jnp.logical_and(q_w >= -1.0, q_w <= 1.0).astype(jnp.float32)
    grad_input = grad_input * in_range

    x_sign = _sign_pm1(x2d)
    # grad_scale_a (binary/cuda/layer.py:116)
    grad_scale_a = jnp.sum(grad_input * x_sign) / jnp.sqrt(float(x2d.size))
    # grad wrt weight: g^T @ sign(x) * scale_a, int8-requantized like the
    # reference (:121) but kept fp in the shadow; the optimizer's EMA handles
    # the magnitude (nv_tensor_quant applied here for parity of dynamics).
    grad_weight = jnp.dot(g2d.T, x_sign * scale_a, preferred_element_type=jnp.float32)
    grad_weight = nv_tensor_quant(grad_weight)[0]

    grad_bias_a = jnp.sum(grad_input, axis=0).astype(xs.dtype)
    grad_qt = qtensor_cotangent(qt, grad_weight if qt.grad_shadow is not None else None)
    return (
        grad_input.reshape(*lead, k).astype(xs.dtype),
        grad_qt,
        grad_scale_a.astype(scale_a.dtype),
        grad_bias_a,
    )


binary_linear.defvjp(_binary_linear_fwd, _binary_linear_bwd)


def binary_matmul(x: Array, y: Array) -> Array:
    """Binarized batched matmul (both operands binarized on the fly).

    Parity: ``BinaryMatMul`` (``binary/cutlass/layer.py:268-403``) used for
    attention score/context products in BMHA.  TPU-native: sign→bf16 on the
    MXU; STE gradients via the surrounding custom_vjp-free formulation
    (sign is piecewise constant; we use the straight-through estimate).
    """

    @jax.custom_vjp
    def _bmm(x, y):
        return jnp.matmul(_sign_pm1(x), _sign_pm1(y), preferred_element_type=jnp.float32).astype(x.dtype)

    def _fwd(x, y):
        return _bmm(x, y), (x, y)

    def _bwd(res, g):
        x, y = res
        g32 = g.astype(jnp.float32)
        gx = jnp.matmul(g32, jnp.swapaxes(_sign_pm1(y), -1, -2))
        gy = jnp.matmul(jnp.swapaxes(_sign_pm1(x), -1, -2), g32)
        # STE clip masks
        gx = gx * (jnp.abs(x) <= 1.0)
        gy = gy * (jnp.abs(y) <= 1.0)
        return gx.astype(x.dtype), gy.astype(y.dtype)

    _bmm.defvjp(_fwd, _bwd)
    return _bmm(x, y)
