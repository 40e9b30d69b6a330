"""Bit-packing / unpacking primitives (pure JAX, XLA-fusable).

Functional parity targets in the reference:

* GPTQ-style int32 row packing / unpacking —
  ``utils/quant_operators.py:310-368`` (``gptq_style_unpacking`` /
  ``gptq_style_zeros_packing``) and ``layers/qlinear/nbit/cuda/utils.py:5-147``
  (``unpack_qweight`` / ``pack_fp_weight``).
* Sign-bit packing for binary tensors — ``functions/cuda/functions_cuda_kernel.cu``
  (``tensor_pack_to_uint8`` / ``uint8_to_unpacked_tensor``) and the CPU
  reference ``get_binary_row`` (``quant_operators.py:118-173``).

Everything here is shape-static and uses logical shifts so it lowers to plain
vector ops on the TPU VPU; XLA fuses these into surrounding computations.
The Pallas kernels in ``ops/pallas`` re-implement the unpack inline in VMEM —
these functions are the semantic reference they are tested against.
"""

from __future__ import annotations

import functools

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_jit = functools.partial(jax.jit, inline=True)


SUPPORTED_BITS = (1, 2, 4, 8)

# storage container per quantization width: odd exl2 widths (3/5/6,
# reference exl2/quant/qdq_{3,5,6}.cuh) ride in the next byte-aligned
# container; MPQTensor.code_bits records the true width
CONTAINER_BITS = {1: 1, 2: 2, 3: 4, 4: 4, 5: 8, 6: 8, 8: 8}


def _shift_amounts(w_bit: int) -> Array:
    """Bit offsets of the ``32 // w_bit`` values inside one int32 word (LSB first)."""
    if w_bit not in SUPPORTED_BITS:
        raise ValueError(
            f"w_bit={w_bit} unsupported; int32 packing needs w_bit in "
            f"{SUPPORTED_BITS} (parity with reference mpq_layer.py:160)"
        )
    ppw = 32 // w_bit
    return (jnp.arange(ppw, dtype=jnp.int32) * w_bit)


# ---------------------------------------------------------------------------
# GPTQ-style packing along the *row* (K) axis: int32 (K//32*b, N) <-> int (K, N)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=('w_bit',))
def pack_rows(intweight: Array, w_bit: int) -> Array:
    """Pack unsigned int values in [0, 2^w_bit) along axis 0 into int32 words.

    ``intweight``: int array ``(K, N)``; returns int32 ``(K // 32 * w_bit, N)``.
    Parity: ``pack_fp_weight`` bit-packing step (``nbit/cuda/utils.py:133-142``).
    """
    k, n = intweight.shape
    ppw = 32 // w_bit
    if k % ppw != 0:
        raise ValueError(f"K={k} must be a multiple of {ppw} for w_bit={w_bit}")
    vals = intweight.astype(jnp.uint32).reshape(k // ppw, ppw, n)
    shifts = _shift_amounts(w_bit).astype(jnp.uint32)[None, :, None]
    words = jnp.sum(lax.shift_left(vals, shifts), axis=1, dtype=jnp.uint32)
    return words.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('w_bit',))
def unpack_rows(packed: Array, w_bit: int) -> Array:
    """Inverse of :func:`pack_rows`: int32 ``(K//32*b, N)`` → int32 ``(K, N)`` in [0, 2^b).

    Parity: ``unpack_qweight`` GPTQ branch (``nbit/cuda/utils.py:31-34``).
    """
    kw, n = packed.shape
    ppw = 32 // w_bit
    mask = jnp.uint32((1 << w_bit) - 1)
    words = packed.astype(jnp.uint32)[:, None, :]  # (kw, 1, n)
    shifts = _shift_amounts(w_bit).astype(jnp.uint32)[None, :, None]
    vals = lax.shift_right_logical(jnp.broadcast_to(words, (kw, ppw, n)), shifts) & mask
    return vals.reshape(kw * ppw, n).astype(jnp.int32)


# ---------------------------------------------------------------------------
# GPTQ-style zeros packing along the *column* (N) axis: (G, N) <-> int32 (G, N//32*b)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=('w_bit',))
def pack_cols(zeros: Array, w_bit: int) -> Array:
    """Pack zero-points along the last axis, storing ``zero - 1`` per GPTQ convention.

    ``zeros``: int ``(G, N)`` in [1, 2^b]; returns int32 ``(G, N // 32 * b)``.
    Parity: ``gptq_style_zeros_packing`` (``quant_operators.py:348-368``).
    """
    g, n = zeros.shape
    ppw = 32 // w_bit
    if n % ppw != 0:
        raise ValueError(f"N={n} must be a multiple of {ppw} for w_bit={w_bit}")
    mask = jnp.uint32((1 << w_bit) - 1)
    vals = (zeros.astype(jnp.int32) - 1).astype(jnp.uint32) & mask
    vals = vals.reshape(g, n // ppw, ppw)
    shifts = _shift_amounts(w_bit).astype(jnp.uint32)[None, None, :]
    words = jnp.sum(lax.shift_left(vals, shifts), axis=-1, dtype=jnp.uint32)
    return words.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('w_bit',))
def unpack_cols(packed_zeros: Array, w_bit: int) -> Array:
    """Inverse of :func:`pack_cols`; returns int32 ``(G, N)`` with the ``+1`` re-applied.

    Parity: zeros branch of ``unpack_qweight`` (``nbit/cuda/utils.py:37-41``).
    """
    g, nw = packed_zeros.shape
    ppw = 32 // w_bit
    mask = jnp.uint32((1 << w_bit) - 1)
    words = packed_zeros.astype(jnp.uint32)[:, :, None]
    shifts = _shift_amounts(w_bit).astype(jnp.uint32)[None, None, :]
    vals = lax.shift_right_logical(jnp.broadcast_to(words, (g, nw, ppw)), shifts) & mask
    return vals.reshape(g, nw * ppw).astype(jnp.int32) + 1


# ---------------------------------------------------------------------------
# Sign-bit packing for binary tensors: fp/int8 <-> uint32 words along last axis
# ---------------------------------------------------------------------------


@jax.jit
def pack_signs(x: Array) -> Array:
    """Pack signs along the last axis into uint32 words (bit j = 1 iff x[..., j] >= 0).

    ``x``: ``(..., K)`` with K % 32 == 0 → uint32 ``(..., K // 32)``.
    Bit order parity with reference ``get_binary_row``
    (``quant_operators.py:118-173``): LSB holds the first element.
    """
    *lead, k = x.shape
    if k % 32 != 0:
        raise ValueError(f"last axis {k} must be a multiple of 32")
    bits = (x >= 0).astype(jnp.uint32).reshape(*lead, k // 32, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32).reshape((1,) * (bits.ndim - 1) + (32,))
    return jnp.sum(lax.shift_left(bits, shifts), axis=-1, dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnames=('dtype',))
def unpack_signs(packed: Array, dtype=jnp.float32) -> Array:
    """Inverse of :func:`pack_signs`: uint32 ``(..., Kw)`` → ±1 values ``(..., Kw*32)``.

    Parity: ``uint8_to_unpacked_tensor`` semantics (unpack to ±scale with
    scale=1; reference ``functions/cuda/functions.py``).
    """
    *lead, kw = packed.shape
    words = packed[..., None]
    shifts = jnp.arange(32, dtype=jnp.uint32).reshape((1,) * (words.ndim - 1) + (32,))
    bits = lax.shift_right_logical(words, shifts) & jnp.uint32(1)
    pm1 = bits.astype(jnp.int32) * 2 - 1
    return pm1.reshape(*lead, kw * 32).astype(dtype)


def pad_to_multiple(x: Array, axis: int, multiple: int, value=0) -> Tuple[Array, int]:
    """Pad ``axis`` of ``x`` up to the next multiple; returns (padded, pad_amount).

    TPU-native analogue of reference ``pad_last_2_dims_to_multiple_of_128`` /
    ``pad_embedding_dim`` (``utils/model_helper.py:54-117``) — here a generic
    helper used to align shapes to (8, 128)/MXU tiling.
    """
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value), pad

# ---------------------------------------------------------------------------
# TPU-tiled row packing: within each quant group, value j of word r is
# logical row j*(group_size/ppw) + r — the order the Pallas kernel's
# shift-and-concat unpack produces natively (see ops/pallas/dequant_matmul.py).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=('w_bit', 'group_size'))
def pack_rows_tpu_tiled(q_int: Array, w_bit: int, group_size: int) -> Array:
    """int codes ``(K, N)`` → int32 ``(K/32*b, N)`` in tpu_tiled order."""
    k, n = q_int.shape
    ppw = 32 // w_bit
    bkp = group_size // ppw
    g = k // group_size
    v = q_int.reshape(g, ppw, bkp, n).astype(jnp.uint32)
    shifts = (jnp.arange(ppw, dtype=jnp.uint32) * w_bit)[None, :, None, None]
    words = jnp.sum(lax.shift_left(v, shifts), axis=1, dtype=jnp.uint32)
    return words.reshape(g * bkp, n).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('w_bit', 'group_size'))
def unpack_rows_tpu_tiled(packed: Array, w_bit: int, group_size: int) -> Array:
    """Inverse of :func:`pack_rows_tpu_tiled` → int32 (K, N) in logical order."""
    kw, n = packed.shape
    ppw = 32 // w_bit
    bkp = group_size // ppw
    g = kw // bkp
    mask = jnp.uint32((1 << w_bit) - 1)
    words = packed.astype(jnp.uint32).reshape(g, 1, bkp, n)
    shifts = (jnp.arange(ppw, dtype=jnp.uint32) * w_bit)[None, :, None, None]
    vals = lax.shift_right_logical(jnp.broadcast_to(words, (g, ppw, bkp, n)), shifts) & mask
    return vals.reshape(g * ppw * bkp, n).astype(jnp.int32)


# ---------------------------------------------------------------------------
# TPU paired-lane packing ("tpu_pair"): each 32-bit word carries codes for the
# two 16-bit lane halves, so the Pallas kernel extracts TWO codes per
# shift+mask+or (paired-lane extraction) and converts to bf16 with a single
# width-changing bitcast instead of a per-element int→float convert:
#     t_j = ((words >> j*b) & 0x000m000m) | 0x43004300   # bf16(128 + q) pair
#     q   = bitcast(concat_j(t_j), bf16)                 # rows in order
# The +128 bias is folded into the zeros term by the kernel.  bitcast
# semantics (Mosaic/pallas `pltpu.bitcast` u32→bf16): word row i → bf16 rows
# (2i = low half, 2i+1 = high half).  Logical row of (tile j, word r, half h)
# is therefore j*(2*bkp) + 2r + h with bkp = group_size*w_bit/32.
# ---------------------------------------------------------------------------


PAIR_BITS = (1, 2, 4)  # codes must fit bf16's exact-integer window [0,128)


@functools.partial(jax.jit, static_argnames=('w_bit', 'group_size'))
def pack_rows_tpu_pair(q_int: Array, w_bit: int, group_size: int) -> Array:
    """int codes ``(K, N)`` → int32 ``(K/32*b, N)`` in tpu_pair order."""
    if w_bit not in PAIR_BITS:
        raise ValueError(f"tpu_pair layout supports w_bit in {PAIR_BITS}")
    k, n = q_int.shape
    ppw = 32 // w_bit
    bkp = group_size // ppw
    g = k // group_size
    # axes: (group, tile j, word r, half h, n)
    v = q_int.reshape(g, ppw // 2, bkp, 2, n).astype(jnp.uint32)
    shifts = (
        (jnp.arange(ppw // 2, dtype=jnp.uint32) * w_bit)[None, :, None, None, None]
        + (jnp.arange(2, dtype=jnp.uint32) * 16)[None, None, None, :, None]
    )
    words = jnp.sum(lax.shift_left(v, shifts), axis=(1, 3), dtype=jnp.uint32)
    return words.reshape(g * bkp, n).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('w_bit', 'group_size'))
def unpack_rows_tpu_pair(packed: Array, w_bit: int, group_size: int) -> Array:
    """Inverse of :func:`pack_rows_tpu_pair` → int32 (K, N) in logical order."""
    kw, n = packed.shape
    ppw = 32 // w_bit
    bkp = group_size // ppw
    g = kw // bkp
    mask = jnp.uint32((1 << w_bit) - 1)
    words = packed.astype(jnp.uint32).reshape(g, 1, bkp, 1, n)
    shifts = (
        (jnp.arange(ppw // 2, dtype=jnp.uint32) * w_bit)[None, :, None, None, None]
        + (jnp.arange(2, dtype=jnp.uint32) * 16)[None, None, None, :, None]
    )
    vals = (
        lax.shift_right_logical(
            jnp.broadcast_to(words, (g, ppw // 2, bkp, 2, n)), shifts
        )
        & mask
    )
    return vals.reshape(g * group_size, n).astype(jnp.int32)


# ---------------------------------------------------------------------------
# TPU quad-byte packing ("tpu_quad"): each 32-bit word carries codes for its
# FOUR int8 byte slots, so the Pallas A8 kernel extracts FOUR codes per
# shift+mask (byte-parallel extraction) and feeds the int8 MXU with a single
# width-changing bitcast — half the VPU extract ops per code of tpu_pair,
# which is the whole story for the extract-bound w2 path (BENCH_NOTES round
# 3: paired-lane extracts cap w2 streams at ~377 GB/s on v5e).
#
# Packing is per SUPERBLOCK of S = 8/w_bit consecutive quant groups (w2: 4
# groups, w4: 2, w1: 8), not per group: a group's packed words at small
# group sizes are only bkp = gs*b/32 sublane rows (w2 g32: TWO of eight —
# per-group extraction wastes 75% of every VPU op; measured 366 GB/s on
# v5e vs 303 for pair, round-4 probe).  With superblock tiles the kernel
# extracts on full (S*bkp >= 8, bn) blocks and ONE concat+bitcast yields
# all S*gs rows in logical order:
#     t_j = (words_sb >> j*b) & (m * 0x01010101)     # full-occupancy op
#     q   = bitcast(concat_j(t_j), int8)             # (S*gs, bn), in order
# bitcast semantics (Mosaic `pltpu.bitcast` u32→i8): word row i → int8 rows
# (4i + byte h, little-endian).  Logical row of (tile j, word r, byte h)
# WITHIN a superblock is therefore j*(4*S*bkp) + 4r + h; tile j spans the
# contiguous logical rows [j*4*S*bkp, (j+1)*4*S*bkp), an exact whole number
# of groups — which is what makes the superblock self-contained.  Codes are
# unbiased (no magic-exponent trick — int8 holds [0, 16) exactly).
# ---------------------------------------------------------------------------


QUAD_BITS = (1, 2, 4)  # codes must fit an int8 byte unbiased; w8 is tiled


def quad_superblock_groups(w_bit: int) -> int:
    """Quant groups per tpu_quad superblock (= ppw/4 = 8/w_bit)."""
    return 8 // w_bit


@functools.partial(jax.jit, static_argnames=('w_bit', 'group_size'))
def pack_rows_tpu_quad(q_int: Array, w_bit: int, group_size: int) -> Array:
    """int codes ``(K, N)`` → int32 ``(K/32*b, N)`` in tpu_quad order.

    Requires the group count ``K/group_size`` to be a multiple of the
    superblock size ``8/w_bit`` (callers fall back to tpu_pair otherwise).
    """
    if w_bit not in QUAD_BITS:
        raise ValueError(f"tpu_quad layout supports w_bit in {QUAD_BITS}")
    k, n = q_int.shape
    ppw = 32 // w_bit
    bkp = group_size // ppw
    S = quad_superblock_groups(w_bit)
    if (k // group_size) % S != 0:
        raise ValueError(
            f"tpu_quad needs group count {k // group_size} divisible by the "
            f"superblock size {S} (w_bit={w_bit})"
        )
    nsb = k // (S * group_size)
    R = S * bkp  # word rows per superblock
    # axes: (superblock, tile j, word r, byte h, n)
    v = q_int.reshape(nsb, ppw // 4, R, 4, n).astype(jnp.uint32)
    shifts = (
        (jnp.arange(ppw // 4, dtype=jnp.uint32) * w_bit)[None, :, None, None, None]
        + (jnp.arange(4, dtype=jnp.uint32) * 8)[None, None, None, :, None]
    )
    words = jnp.sum(lax.shift_left(v, shifts), axis=(1, 3), dtype=jnp.uint32)
    return words.reshape(nsb * R, n).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('w_bit', 'group_size'))
def unpack_rows_tpu_quad(packed: Array, w_bit: int, group_size: int) -> Array:
    """Inverse of :func:`pack_rows_tpu_quad` → int32 (K, N) in logical order."""
    kw, n = packed.shape
    ppw = 32 // w_bit
    bkp = group_size // ppw
    S = quad_superblock_groups(w_bit)
    R = S * bkp
    nsb = kw // R
    mask = jnp.uint32((1 << w_bit) - 1)
    words = packed.astype(jnp.uint32).reshape(nsb, 1, R, 1, n)
    shifts = (
        (jnp.arange(ppw // 4, dtype=jnp.uint32) * w_bit)[None, :, None, None, None]
        + (jnp.arange(4, dtype=jnp.uint32) * 8)[None, None, None, :, None]
    )
    vals = (
        lax.shift_right_logical(
            jnp.broadcast_to(words, (nsb, ppw // 4, R, 4, n)), shifts
        )
        & mask
    )
    return vals.reshape(nsb * S * group_size, n).astype(jnp.int32)


def pack_rows_layout(q_int: Array, w_bit: int, group_size: int, layout: str) -> Array:
    """Dispatch packing by :class:`MPQTensor` ``layout`` string."""
    if layout == "tpu_pair":
        return pack_rows_tpu_pair(q_int, w_bit, group_size)
    if layout == "tpu_quad":
        return pack_rows_tpu_quad(q_int, w_bit, group_size)
    if layout == "tpu_tiled":
        return pack_rows_tpu_tiled(q_int, w_bit, group_size)
    return pack_rows(q_int, w_bit)


def unpack_rows_layout(packed: Array, w_bit: int, group_size: int, layout: str) -> Array:
    """Dispatch unpacking by :class:`MPQTensor` ``layout`` string."""
    if layout == "tpu_pair":
        return unpack_rows_tpu_pair(packed, w_bit, group_size)
    if layout == "tpu_quad":
        return unpack_rows_tpu_quad(packed, w_bit, group_size)
    if layout == "tpu_tiled":
        return unpack_rows_tpu_tiled(packed, w_bit, group_size)
    return unpack_rows(packed, w_bit)
