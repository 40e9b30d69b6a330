"""Quantized 2-D convolution ops (binary XNOR conv, int4/int8 QAT conv).

Parity targets: ``qconv/binary/{cpp,cutlass}`` (XNOR-popcount im2col conv /
``cutlass::uint1b_t`` implicit-GEMM fprop, ``binary_conv2d_cutlass_kernel.cu:16-129``)
and ``qconv/nbit/cutlass`` (int4 NHWC implicit-GEMM conv,
``q4_conv_cutlass.cpp:93-94``).

TPU-native design: convolutions lower to MXU implicit GEMMs through
``lax.conv_general_dilated`` in NHWC (the TPU-preferred layout, which the
reference's CUTLASS path also uses).  Binary/int values are exactly
representable in bf16/fp32, so running the conv in fp after on-the-fly
(de)quantization is bit-identical to an integer conv while letting XLA fuse
the quantize/dequantize into the conv — there is no reason to hand-write an
int conv kernel on TPU.  STE backward math mirrors the linear layers.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..qtensor import BinaryQTensor, IntQTensor, qtensor_cotangent

Array = jax.Array

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def _conv(x, w, stride, padding, dilation=(1, 1)):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=_DIMSPEC,
        preferred_element_type=jnp.float32,
    )


def _sign_pm1(x):
    return jnp.where(x >= 0, 1.0, -1.0).astype(jnp.float32)


def binary_conv2d(
    x: Array,
    qt: BinaryQTensor,
    scale_a: Array,
    stride: Tuple[int, int] = (1, 1),
    padding="SAME",
) -> Array:
    """Binary conv: ``conv(sign(x), sign(W)) * scale_a * scale_w`` with STE bwd.

    ``x``: ``(N, H, W, C)``; ``qt.data``: int8 ``(KH, KW, C, O)`` logical
    weight (sign payload).  Gradient to the weight goes to ``grad_shadow``.
    """

    @jax.custom_vjp
    def _op(x, qt, scale_a):
        return _fwd_math(x, qt, scale_a)

    def _fwd_math(x, qt, scale_a):
        y = _conv(_sign_pm1(x), _sign_pm1(qt.data.astype(jnp.float32)), stride, padding)
        return (y * scale_a * qt.scale_w).astype(x.dtype)

    def _fwd(x, qt, scale_a):
        return _fwd_math(x, qt, scale_a), (x, qt, scale_a)

    def _bwd(res, g):
        x, qt, scale_a = res
        g32 = g.astype(jnp.float32)
        w_sign = _sign_pm1(qt.data.astype(jnp.float32))
        # grad wrt input: transposed conv with sign(W) * scale_w, STE-masked
        grad_x = jax.lax.conv_transpose(
            g32 * qt.scale_w,
            w_sign,
            strides=stride,
            padding=padding,
            dimension_numbers=_DIMSPEC,
            transpose_kernel=True,
        )
        mask = (jnp.abs(x / scale_a) <= 1.0).astype(jnp.float32)
        grad_x = grad_x * mask
        grad_scale_a = jnp.sum(grad_x * _sign_pm1(x)) / jnp.sqrt(float(x.size))
        # grad wrt weight: correlate sign(x) with g
        grad_w = _conv_weight_grad(_sign_pm1(x) * scale_a, g32, qt.data.shape, stride, padding)

        grad_qt = qtensor_cotangent(qt, grad_w if qt.grad_shadow is not None else None)
        return grad_x.astype(x.dtype), grad_qt, grad_scale_a.astype(scale_a.dtype)

    _op.defvjp(_fwd, _bwd)
    return _op(x, qt, scale_a)


def _conv_weight_grad(x, g, w_shape, stride, padding):
    """dL/dW for NHWC/HWIO conv via conv_general_dilated_patches-free formulation."""
    # Use jax's built-in transpose rule by differentiating a fp conv closure.
    def f(w):
        return _conv(x, w, stride, padding)

    _, vjp = jax.vjp(f, jnp.zeros(w_shape, jnp.float32))
    return vjp(g)[0]


def qat_conv2d(
    x: Array,
    qt: IntQTensor,
    scale_a: Array,
    stride: Tuple[int, int] = (1, 1),
    padding="SAME",
) -> Array:
    """int4/int8 QAT conv: quantize activations, integer-valued conv, rescale.

    Parity: ``Q4Conv2dCutlass`` forward returning ``[out, q_a, q_w]`` for
    backward reuse (``qconv/nbit/cutlass/layer.py:47-60``); here residuals are
    held by the vjp closure.
    """
    w_bit = qt.w_bit
    qlow, qhigh = -(2.0 ** (w_bit - 1)), 2.0 ** (w_bit - 1) - 1.0

    @jax.custom_vjp
    def _op(x, qt, scale_a):
        out, _ = _fwd_math(x, qt, scale_a)
        return out

    def _fwd_math(x, qt, scale_a):
        scale = jnp.maximum(scale_a.astype(jnp.float32), 1e-5)
        q_a = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), qlow, qhigh)
        w = qt.data.astype(jnp.float32)
        y = _conv(q_a, w, stride, padding)
        return (y * scale * qt.scale_w).astype(x.dtype), q_a

    def _fwd(x, qt, scale_a):
        out, q_a = _fwd_math(x, qt, scale_a)
        return out, (x, q_a, qt, scale_a)

    def _bwd(res, g):
        x, q_a, qt, scale_a = res
        g32 = g.astype(jnp.float32)
        scale = jnp.maximum(scale_a.astype(jnp.float32), 1e-5)
        w_fp = qt.data.astype(jnp.float32) * qt.scale_w
        grad_x = jax.lax.conv_transpose(
            g32,
            w_fp,
            strides=stride,
            padding=padding,
            dimension_numbers=_DIMSPEC,
            transpose_kernel=True,
        )
        q_x = x.astype(jnp.float32) / scale
        small = (q_x < qlow).astype(jnp.float32)
        large = (q_x > qhigh).astype(jnp.float32)
        middle = 1.0 - small - large
        grad_x = grad_x * middle
        grad_scale_a = jnp.sum(
            (small * qlow + large * qhigh + middle * (jnp.round(q_x) - q_x)) * grad_x
        ) / math.sqrt(x.size * qhigh)
        grad_w = _conv_weight_grad(q_a * scale, g32, qt.data.shape, stride, padding)

        grad_qt = qtensor_cotangent(qt, grad_w if qt.grad_shadow is not None else None)
        return grad_x.astype(x.dtype), grad_qt, grad_scale_a.astype(scale_a.dtype)

    _op.defvjp(_fwd, _bwd)
    return _op(x, qt, scale_a)
