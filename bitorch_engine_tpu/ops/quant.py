"""Quantization math: scalar quantizers, MPQ (GPTQ/GBA) quantize/dequantize,
GBA double-quant decompression, binary weight initialization.

Functional parity targets in the reference:

* ``nv_tensor_quant`` — ``utils/quant_operators.py:7-90``
* ``q4_quantization`` / ``q8_quantization`` — ``quant_operators.py:234-307``
* ``init_weight`` (binary int8 init + L1 scale) — ``utils/model_helper.py:286-327``
* MPQ dequantize (3 styles) — ``nbit/cuda/utils.py:5-69`` (``unpack_qweight``)
* MPQ requantize/pack — ``nbit/cuda/utils.py:72-147`` (``pack_fp_weight``)
* GBA double-quant decompress — ``nbit/cuda/mpq_layer.py:163-204``
  (``MPQLinearCuda.prepare_params``)

All functions are pure and jit-safe; nothing mutates in place.
"""

from __future__ import annotations

import functools

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..qtensor import BinaryQTensor, IntQTensor, MPQTensor
from . import packing

Array = jax.Array


# ---------------------------------------------------------------------------
# Scalar / per-tensor quantizers
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=('num_bits', 'narrow_range'))
def nv_tensor_quant(
    inputs: Array,
    amax: Optional[Array] = None,
    num_bits: int = 8,
    narrow_range: bool = True,
) -> Tuple[Array, Array]:
    """Symmetric per-tensor quantization (TensorRT-style).

    Parity: ``quant_operators.py:7-90`` (signed path, the only one the
    reference exercises).  Returns ``(q, scale)`` with
    ``q = clamp(round(x * scale), -max_bound, max_bound)`` computed in fp32.
    """
    x = inputs.astype(jnp.float32)
    if amax is None:
        amax = jnp.max(x)  # NOTE: reference uses max (not abs-max) over all elements
    amax = jnp.asarray(amax, jnp.float32)
    max_bound = float(2.0 ** (num_bits - 1) - 1.0)
    min_bound = -max_bound if narrow_range else -max_bound - 1.0
    scale = max_bound / amax
    q = jnp.clip(jnp.round(x * scale), min_bound, max_bound)
    # amax ~ 0: outputs keep the huge-scale clamped values; only the RETURNED
    # scale is overridden to 1 (reference :78-85 zeroes then sets scale after
    # outputs are computed — behavior pinned bit-exactly by
    # tests/test_reference_parity.py::test_nv_tensor_quant_parity)
    epsilon = 1.0 / (1 << 24)
    scale = jnp.where(amax <= epsilon, 1.0, scale)
    return q.astype(inputs.dtype), scale


def q8_quantization(x: Array, scale_a: Optional[Array] = None, eps: float = 1e-5):
    """Uniform 8-bit activation quantization; parity ``quant_operators.py:234-269``."""
    xf = x.astype(jnp.float32)
    if scale_a is None:
        scale = 2.0 * jnp.mean(jnp.abs(xf)) / 11.269
        scale = jnp.maximum(scale, eps)
        return jnp.clip(jnp.round(xf / scale), -128, 127), scale
    scale = jnp.maximum(scale_a.astype(jnp.float32), eps)
    return jnp.clip(jnp.round(xf / scale), -128, 127)


def q4_quantization(x: Array, scale_a: Optional[Array] = None, eps: float = 1e-5):
    """Uniform 4-bit activation quantization; parity ``quant_operators.py:272-307``."""
    xf = x.astype(jnp.float32)
    if scale_a is None:
        scale = 2.0 * jnp.mean(jnp.abs(xf)) / 5.6345
        scale = jnp.maximum(scale, eps)
        return jnp.clip(jnp.round(xf / scale), -8, 7), scale
    scale = jnp.maximum(scale_a.astype(jnp.float32), eps)
    return jnp.clip(jnp.round(xf / scale), -8, 7)


# ---------------------------------------------------------------------------
# Binary / n-bit QAT weight initialization
# ---------------------------------------------------------------------------


@jax.jit
def init_binary_weight(weight: Array) -> BinaryQTensor:
    """fp weight → int8 binary-QAT weight + L1 scale.

    Parity: ``init_weight`` (``model_helper.py:286-327``): scale = mean |w|,
    weight centered, int8-quantized via nv_tensor_quant, zeros replaced by the
    sign of the centered weight so no sign information is lost.
    """
    w = weight.astype(jnp.float32)
    scale_w = jnp.sum(jnp.abs(w)) / w.size
    centered = w - jnp.mean(w)
    w_int8, _ = nv_tensor_quant(centered)
    w_int8 = jnp.where(w_int8 == 0, jnp.sign(centered), w_int8)
    return BinaryQTensor(
        data=w_int8.astype(jnp.int8),
        scale_w=scale_w,
        in_features=weight.shape[1],
    )


@functools.partial(jax.jit, static_argnames=('w_bit',))
def init_nbit_weight(weight: Array, w_bit: int = 4) -> IntQTensor:
    """fp weight → int8 n-bit QAT weight with a dequant-multiplier scale.

    ``scale_w = 2·mean|w| / divisor`` mirrors the reference's
    ``prepare_params`` for Q4/Q8 layers (``q4_layer.py:146-147`` /
    ``q8_layer.py``): ``w ≈ data * scale_w``.  The optimizer requantizes with
    ``nv_tensor_quant`` after every step (``model_helper.py:452-483``).
    """
    w = weight.astype(jnp.float32)
    divisor = 5.6345 if w_bit == 4 else 11.269
    scale_w = jnp.maximum(2.0 * jnp.mean(jnp.abs(w)) / divisor, 1e-5)
    qlow, qhigh = -(2.0 ** (w_bit - 1)), 2.0 ** (w_bit - 1) - 1.0
    data = jnp.clip(jnp.round(w / scale_w), qlow, qhigh)
    return IntQTensor(data=data.astype(jnp.int8), scale_w=scale_w, w_bit=w_bit)


@jax.jit
def pack_binary_weight(qt: BinaryQTensor) -> BinaryQTensor:
    """int8 QAT binary weight → fully bit-packed inference weight (32x smaller).

    Parity: ``generate_quantized_weight`` + ``w_pack`` kernels
    (``binary/cuda/layer.py:202-231``).
    """
    if qt.packed:
        return qt
    data, _ = packing.pad_to_multiple(qt.data.astype(jnp.float32), 1, 32, value=-1.0)
    return BinaryQTensor(
        data=packing.pack_signs(data),
        scale_w=qt.scale_w,
        packed=True,
        in_features=qt.data.shape[1],
    )


# ---------------------------------------------------------------------------
# MPQ (GPTQ / GBA) quantize & dequantize
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=('dtype',))
def dequantize_mpq(qt: MPQTensor, dtype=jnp.bfloat16) -> Array:
    """Reconstruct the fp weight ``(K, N)`` from an MPQTensor.

    Parity with the three styles of ``unpack_qweight``
    (``nbit/cuda/utils.py:30-51``):

    1. asym (classical GPTQ):  ``w = scales[g] * (q - zeros[g])`` with packed
       zeros carrying the ``+1`` offset.
    2. sym with g_idx:         ``w = q * scales[g] - zeros[g]``.
    3. sym without g_idx:      groups are contiguous; optional ``q_perm``
       scatter restores the original row order
       (``quant_operators.py:337-341``).
    """
    k, n = qt.logical_shape
    q = packing.unpack_rows_layout(
        qt.packed, qt.w_bit, qt.group_size, qt.layout
    )  # (K, N) int32
    if qt.asym:
        zeros = packing.unpack_cols(qt.zeros, qt.w_bit)  # (G, N) int, incl. +1
        g = _group_index(qt, k)
        w = qt.scales[g].astype(jnp.float32) * (q - zeros[g]).astype(jnp.float32)
        if qt.g_idx is None and qt.q_perm is not None:
            # canonicalized act-order GPTQ (ingest.mpq_from_gptq): rows are
            # stored group-sorted; scatter back to logical order
            w = jnp.zeros_like(w).at[qt.q_perm].set(w)
    else:
        g = _group_index(qt, k)
        w = (
            q.astype(jnp.float32) * qt.scales[g].astype(jnp.float32)
            - qt.zeros[g].astype(jnp.float32)
        )
        if qt.g_idx is None and qt.q_perm is not None:
            # rows were stored permuted; scatter back to logical order
            w = jnp.zeros_like(w).at[qt.q_perm].set(w)
    return w.astype(dtype)


def _group_index(qt: MPQTensor, k: int) -> Array:
    if qt.g_idx is not None:
        return qt.g_idx
    return (jnp.arange(k, dtype=jnp.int32) // qt.group_size)


def slice_mpq_n(qt: MPQTensor, start: int, size: int) -> MPQTensor:
    """Static slice of ``size`` output columns starting at ``start``.

    The inverse of :func:`concat_mpq` (group metadata is per N-column, so a
    column slice is self-contained).  asym tensors pack zeros along N, so
    ``start``/``size`` must be multiples of the codes-per-word there.
    """
    packed = lax.slice_in_dim(qt.packed, start, start + size, axis=1)
    scales = lax.slice_in_dim(qt.scales, start, start + size, axis=1)
    if qt.asym:
        ppw = 32 // qt.w_bit
        if start % ppw or size % ppw:
            raise ValueError("asym slice must align to codes-per-word")
        zeros = lax.slice_in_dim(
            qt.zeros, start // ppw, (start + size) // ppw, axis=1
        )
    else:
        zeros = lax.slice_in_dim(qt.zeros, start, start + size, axis=1)
    shadow = None
    if qt.grad_shadow is not None:
        shadow = lax.slice_in_dim(qt.grad_shadow, start, start + size, axis=1)
    return qt.replace(packed=packed, scales=scales, zeros=zeros, grad_shadow=shadow)


def concat_mpq(parts: Tuple[MPQTensor, ...]) -> MPQTensor:
    """Concatenate MPQTensors sharing one K along the output-feature axis.

    Group quantization is per (K-group, N-column), so concatenation along N
    commutes with quantization: ``quantize(concat(W_i)) == concat(quantize(W_i))``
    column-for-column.  Used to build fused projections (qkv, gate|up) whose
    single kernel launch streams at large-N efficiency — the TPU analogue of
    the reference engaging one fused GEMV per projection
    (``mpq_linear_cuda_kernel.cu:67-458``); on TPU the launch/tile overhead
    of small-N matmuls (k/v at N=1024 stream ~336 GB/s vs ~615 at N≥4096)
    makes fusion the natural layout.

    All parts must agree on K, w_bit, group_size, asym, layout and code_bits;
    act-order parts (g_idx/q_perm) are rejected — their per-matrix row maps
    can't share one launch.
    """
    first = parts[0]
    for p in parts[1:]:
        if (
            p.w_bit != first.w_bit
            or p.group_size != first.group_size
            or p.asym != first.asym
            or p.layout != first.layout
            or p.code_bits != first.code_bits
            or p.in_features != first.in_features
        ):
            raise ValueError("concat_mpq: parts disagree on quant structure")
    if any(p.g_idx is not None or p.q_perm is not None for p in parts):
        # per-matrix act-order row maps can't share one fused kernel launch
        raise ValueError(
            "concat_mpq: parts with g_idx/q_perm (act-order) cannot be fused"
        )
    packed = jnp.concatenate([p.packed for p in parts], axis=1)
    scales = jnp.concatenate([p.scales for p in parts], axis=1)
    zeros = jnp.concatenate([p.zeros for p in parts], axis=1)
    shadow = None
    if all(p.grad_shadow is not None for p in parts):
        shadow = jnp.concatenate([p.grad_shadow for p in parts], axis=1)
    return first.replace(
        packed=packed, scales=scales, zeros=zeros, grad_shadow=shadow,
        zeros_mid=all(p.zeros_mid for p in parts),
    )


@functools.partial(
    jax.jit, static_argnames=('w_bit', 'group_size', 'asym', 'code_bits', 'mid_sym')
)
def quantize_mpq(
    weight: Array,
    w_bit: int = 4,
    group_size: int = 128,
    asym: bool = False,
    code_bits: Optional[int] = None,
    mid_sym: bool = False,
) -> MPQTensor:
    """RTN group-wise quantization of an fp weight ``(K, N)`` into an MPQTensor.

    This is the from-scratch quantizer (the reference consumes externally
    produced GPTQ/GBA checkpoints; its own repack path is ``pack_fp_weight``,
    ``nbit/cuda/utils.py:72-147`` — the math here matches that inverse).

    ``code_bits`` < ``w_bit`` quantizes at an odd width (3/5/6-bit, the exl2
    widths of ``qdq_{3,5,6}.cuh``) while packing into the byte-aligned
    ``w_bit`` container.
    """
    k, n = weight.shape
    if w_bit not in packing.SUPPORTED_BITS:
        raise ValueError(
            f"w_bit={w_bit} is not a packable container width "
            f"{packing.SUPPORTED_BITS}; for odd exl2 widths pass the "
            f"container (e.g. w_bit=4, code_bits=3)"
        )
    if k % group_size != 0:
        raise ValueError(f"K={k} not a multiple of group_size={group_size}")
    if code_bits is not None and not 0 < code_bits <= w_bit:
        raise ValueError(f"code_bits={code_bits} must be in (0, w_bit={w_bit}]")
    w = weight.astype(jnp.float32).reshape(k // group_size, group_size, n)
    maxq = float(2 ** (code_bits or w_bit) - 1)
    if asym:
        wmin = jnp.min(w, axis=1)
        wmax = jnp.max(w, axis=1)
        scales = jnp.maximum((wmax - wmin) / maxq, 1e-8)  # (G, N)
        zeros_int = jnp.clip(jnp.round(-wmin / scales), 1, maxq).astype(jnp.int32)
        q = jnp.clip(
            jnp.round(w / scales[:, None, :]) + zeros_int[:, None, :], 0, maxq
        ).astype(jnp.int32)
        return MPQTensor(
            packed=packing.pack_rows(q.reshape(k, n), w_bit),
            scales=scales,
            zeros=packing.pack_cols(zeros_int, w_bit),
            w_bit=w_bit,
            group_size=group_size,
            asym=True,
            code_bits=code_bits,
        )
    wmin = jnp.min(w, axis=1)
    wmax = jnp.max(w, axis=1)
    if mid_sym:
        # symmetric-midpoint (exl2 form, qdq_*.cuh): zeros ≡ mid·scales
        # EXACTLY, so signed codes q − mid cancel the zeros correction in
        # the quad kernel (MPQTensor.zeros_mid).  Slightly coarser than
        # the affine min-max form on skewed groups (the grid is forced
        # symmetric around 0); bounded by the ppl gate's *_midsym configs.
        mid = float(2 ** ((code_bits or w_bit) - 1))
        scales = jnp.maximum(
            jnp.maximum(wmax / (maxq - mid), -wmin / mid), 1e-8
        )
        zeros = mid * scales
        q = jnp.clip(jnp.round(w / scales[:, None, :]) + mid, 0, maxq)
        return MPQTensor(
            packed=packing.pack_rows(q.reshape(k, n).astype(jnp.int32), w_bit),
            scales=scales,
            zeros=zeros,
            w_bit=w_bit,
            group_size=group_size,
            asym=False,
            code_bits=code_bits,
            zeros_mid=True,
        )
    # symmetric/GBA style: w = q * scale - zero  with q in [0, maxq]
    scales = jnp.maximum((wmax - wmin) / maxq, 1e-8)
    zeros = -wmin  # fp subtractive zero: w = q*scale - (-wmin) → q = (w + zero)/scale
    q = jnp.clip(jnp.round((w + zeros[:, None, :]) / scales[:, None, :]), 0, maxq)
    return MPQTensor(
        packed=packing.pack_rows(q.reshape(k, n).astype(jnp.int32), w_bit),
        scales=scales,
        zeros=zeros,
        w_bit=w_bit,
        group_size=group_size,
        asym=False,
        code_bits=code_bits,
    )


@jax.jit
def repack_mpq(weight: Array, qt: MPQTensor, unpacked_zeros: Optional[Array] = None) -> Array:
    """fp weight ``(K, N)`` → packed int32, reusing ``qt``'s scales/zeros/g_idx.

    Parity: ``pack_fp_weight`` (``nbit/cuda/utils.py:102-147``).  Used by the
    DiodeMix MPQ update regime after the AdamW step on the dequantized weight.
    """
    k, n = qt.logical_shape
    maxq = 2**qt.quant_bits - 1
    g = _group_index(qt, k)
    scales = qt.scales[g].astype(jnp.float32)
    w = weight.astype(jnp.float32)
    if qt.g_idx is None and qt.q_perm is not None:
        w = w[qt.q_perm]  # gather into stored (permuted) order, ref :124-126
    if qt.asym:
        if unpacked_zeros is None:
            zeros = packing.unpack_cols(qt.zeros, qt.w_bit)
        else:
            zeros = unpacked_zeros
        intweight = jnp.clip(
            jnp.round(w / scales + zeros[g].astype(jnp.float32)), 0, maxq
        ).astype(jnp.int32)
    else:
        zeros = qt.zeros[g].astype(jnp.float32)
        intweight = jnp.clip(jnp.round((w + zeros) / scales), 0, maxq).astype(jnp.int32)
    return packing.pack_rows_layout(intweight, qt.w_bit, qt.group_size, qt.layout)


# ---------------------------------------------------------------------------
# GBA double-quantization decompression ("prepare_params")
# ---------------------------------------------------------------------------


def _apply_scale_affine(qscales, zeros, scales, g, out_channels, dq_mode, dtype):
    """Affine-dequantize 4-bit scale codes.

    ``dq_mode=2`` (default, LLaMA-2/3 GBA checkpoints): the affine pair is
    per (group, dq-group) — shape ``(G, N/dqg, 1)`` broadcasting against
    ``(G, N/dqg, dqg)`` codes.  ``dq_mode=1`` (LLaMA-1-era GBA): the pair is
    per output channel — shape ``(1, N, 1)`` applied after flattening codes
    to ``(G, N)`` (reference buffer layouts ``nbit/layer.py:445-451``).
    """
    if dq_mode == 1:
        q2d = qscales.reshape(g, out_channels)
        return (q2d - zeros.astype(dtype).reshape(1, out_channels)) * scales.astype(
            dtype
        ).reshape(1, out_channels)
    return ((qscales - zeros.astype(dtype)) * scales.astype(dtype)).reshape(
        g, out_channels
    )


def decompress_gba_sym(
    qstatistic: Array,
    qzeros_zeros: Array,
    qzeros_scales: Array,
    qscales_zeros: Array,
    qscales_scales: Array,
    out_channels: int,
    dtype=jnp.float32,
    dq_mode: int = 2,
) -> Tuple[Array, Array]:
    """Decompress GBA double-quantized scales/zeros (symmetric mode).

    Parity: ``MPQLinearCuda.prepare_params`` (``mpq_layer.py:172-183``):
    ``qstatistic`` uint8 ``(G, N/dqg, dqg)`` holds the 4-bit quantized scale in
    the high nibble and the 4-bit quantized zero in the low nibble;
    both are dequantized with their own (zero, scale) pairs and flattened to
    ``(G, N)``.  ``dq_mode`` selects the scale-affine layout (see
    :func:`_apply_scale_affine`); the zeros affine is per dq-group in both
    modes.
    """
    qs = qstatistic.astype(jnp.uint8)
    qscales = (qs >> 4).astype(dtype)
    qzeros = (qs & 0x0F).astype(dtype)
    g = qs.shape[0]
    zeros = ((qzeros - qzeros_zeros.astype(dtype)) * qzeros_scales.astype(dtype)).reshape(
        g, out_channels
    )
    scales = _apply_scale_affine(
        qscales, qscales_zeros, qscales_scales, g, out_channels, dq_mode, dtype
    )
    return scales, zeros


def decompress_gba_asym(
    qscales: Array,
    qscales_zeros: Array,
    qscales_scales: Array,
    out_channels: int,
    w_bit: int,
    dtype=jnp.float32,
    dq_mode: int = 2,
) -> Array:
    """Decompress GBA double-quantized scales (asymmetric mode).

    Parity: ``mpq_layer.py:176-183`` — for w_bit==2 the stored qscales get an
    extra trailing axis; zeros stay as the packed int32 ``qzeros``.
    ``dq_mode`` selects the scale-affine layout (:func:`_apply_scale_affine`).
    """
    qsc = qscales.astype(dtype)
    if w_bit == 2 and qsc.ndim == 2:
        qsc = qsc[..., None]
    g = qsc.shape[0]
    return _apply_scale_affine(
        qsc, qscales_zeros, qscales_scales, g, out_channels, dq_mode, dtype
    )
