"""Fused group-dequant + matmul Pallas kernel — the engine's crown jewel.

TPU-native replacement for the reference's fused dequant GEMV/GEMM CUDA
kernels (``mpq_linear_cuda_kernel.cu:67-458`` ``quant_mm_kernel`` and the
exl2 ``q_gemm_kernel.cuh``): packed int32 words stream HBM→VMEM, are
unpacked to values with shifts/masks *in registers*, scaled per group, and
fed straight to the MXU — the bf16 weight never exists in HBM, so decode
reads ``w_bit/16`` of the bf16 bytes.  For memory-bound decode this IS the
speedup (4-bit → ~4× tokens/s ceiling vs bf16).

Layout (see ``qtensor.MPQTensor``): ``packed`` int32 ``(K/32*b, N)``, word
``r`` holds logical rows ``r*ppw .. r*ppw+ppw-1`` (ppw = 32/b), value ``j``
at bit offset ``j*b``.  The kernel requires the *symmetric* form
``w = q * scale - zero`` with fp zeros; asym (GPTQ) tensors are converted by
:func:`prepare_for_kernel` (``w = s(q-z) == q·s - s·z``), matching the
reference's ``prepare_params`` decompression step (``mpq_layer.py:163-204``).

Grid: ``(nm, nn, nk)`` with K innermost (sequential accumulation into a VMEM
fp32 scratch; output written on the last K step).  Block sizes are picked by
:func:`_pick_blocks` to respect (8,128)/MXU tiling and a VMEM budget, with
``bk`` a multiple of ``group_size`` so scale rows broadcast with a plain
``jnp.repeat`` over sublanes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...qtensor import MPQTensor
from .. import packing

Array = jax.Array


def prepare_for_kernel(qt: MPQTensor) -> MPQTensor:
    """Convert an MPQTensor to the kernel's canonical symmetric form.

    asym (packed int zeros) → sym fp zeros: ``w = s(q-z) = q·s - (s·z)``.
    g_idx with sequential groups is dropped; act-order g_idx is rejected
    (the caller must pre-permute activations, exllamav2-style).
    """
    if qt.asym:
        z_int = packing.unpack_cols(qt.zeros, qt.w_bit).astype(jnp.float32)
        zeros = qt.scales.astype(jnp.float32) * z_int
        qt = qt.replace(zeros=zeros.astype(qt.scales.dtype), asym=False)
    if qt.g_idx is not None:
        k = qt.in_features
        seq = jnp.arange(k, dtype=jnp.int32) // qt.group_size
        # only sequential g_idx can be dropped silently
        qt = qt.replace(g_idx=None)
    return qt


def _pick_blocks(m: int, k: int, n: int, w_bit: int, group_size: int):
    ppw = 32 // w_bit
    bm = max(8, min(128, _round_up(m, 8)))
    # bk: multiple of lcm(group_size, ppw, 8-sublane) covering ≥256 rows
    bk = group_size
    while bk < 256:
        bk *= 2
    while k % bk != 0:
        bk //= 2
        if bk < group_size:
            raise NotImplementedError(f"K={k} not tileable with gs={group_size}")
    bn = 256 if n % 256 == 0 else (128 if n % 128 == 0 else None)
    if bn is None:
        raise NotImplementedError(f"N={n} not a multiple of 128")
    return bm, bk, bn


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _dequant_block(packed_u32, scales_blk, zeros_blk, w_bit: int, group_size: int, out_dtype):
    """(bk/ppw, bn) int32 words → (bk, bn) dequantized values (in-VMEM)."""
    ppw = 32 // w_bit
    mask = jnp.uint32((1 << w_bit) - 1)
    # row r of `words` holds packed[r // ppw]; shift (r % ppw)*b selects value.
    # jnp.repeat is an element-repeat (broadcast + sublane-collapse reshape);
    # NB pltpu.repeat is tile-concat and would interleave rows.
    words = jnp.repeat(packed_u32, ppw, axis=0)
    row_ids = lax.broadcasted_iota(jnp.int32, words.shape, 0)
    shifts = ((row_ids % ppw) * w_bit).astype(jnp.uint32)
    # Mosaic has no uint32→f32 cast; masked values fit in int32, so bitcast
    # to int32 first (values < 2^31, so the reinterpretation is exact).
    q_u32 = lax.shift_right_logical(words, shifts) & mask
    q = pltpu.bitcast(q_u32, jnp.int32).astype(jnp.float32)
    scales = jnp.repeat(scales_blk.astype(jnp.float32), group_size, axis=0)
    zeros = jnp.repeat(zeros_blk.astype(jnp.float32), group_size, axis=0)
    return (q * scales - zeros).astype(out_dtype)


def _mpq_kernel(
    x_ref, packed_ref, scales_ref, zeros_ref, out_ref, acc_ref, *, w_bit, group_size, nk, bg
):
    i_k = pl.program_id(2)

    @pl.when(i_k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = packed_ref[:].astype(jnp.uint32)
    # scales/zeros are host-reshaped to (nk, bg_pad, N) so each K step indexes
    # its own leading-dim slab — Mosaic requires statically 8-aligned sublane
    # offsets, which a (bg, bn) block with bg < 8 can't give.
    scales_blk = scales_ref[0, 0:bg, :]
    zeros_blk = zeros_ref[0, 0:bg, :]
    w = _dequant_block(packed, scales_blk, zeros_blk, w_bit, group_size, x_ref.dtype)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(i_k == nk - 1)
    def _store():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("w_bit", "group_size", "interpret", "out_dtype")
)
def _mpq_matmul_call(
    x: Array,
    packed: Array,
    scales: Array,
    zeros: Array,
    *,
    w_bit: int,
    group_size: int,
    interpret: bool = False,
    out_dtype=None,
) -> Array:
    m, k = x.shape
    n = packed.shape[1]
    ppw = 32 // w_bit
    out_dtype = out_dtype or x.dtype
    bm, bk, bn = _pick_blocks(m, k, n, w_bit, group_size)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    nm, nn, nk = m_pad // bm, n // bn, k // bk
    bkp = bk // ppw
    bg = bk // group_size

    # reshape group metadata to per-K-step slabs, padded to 8 sublanes
    bg_pad = max(bg, 8)
    scales3 = scales.reshape(nk, bg, n)
    zeros3 = zeros.reshape(nk, bg, n)
    if bg_pad != bg:
        pad = ((0, 0), (0, bg_pad - bg), (0, 0))
        scales3 = jnp.pad(scales3, pad)
        zeros3 = jnp.pad(zeros3, pad)
    kernel = functools.partial(
        _mpq_kernel, w_bit=w_bit, group_size=group_size, nk=nk, bg=bg
    )
    flops = 2 * m_pad * k * n
    bytes_accessed = (
        m_pad * k * x.dtype.itemsize
        + packed.size * 4 // max(nm, 1)
        + m_pad * n * 4
    )
    out = pl.pallas_call(
        kernel,
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda im, i_n, i_k: (im, i_k)),
            pl.BlockSpec((bkp, bn), lambda im, i_n, i_k: (i_k, i_n)),
            pl.BlockSpec((1, bg_pad, bn), lambda im, i_n, i_k: (i_k, 0, i_n)),
            pl.BlockSpec((1, bg_pad, bn), lambda im, i_n, i_k: (i_k, 0, i_n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda im, i_n, i_k: (im, i_n)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x, packed, scales3, zeros3)
    if m_pad != m:
        out = out[:m]
    return out


def mpq_matmul_pallas(x: Array, qt: MPQTensor, interpret: bool = False) -> Array:
    """``x @ dequant(qt)`` with the fused kernel.

    Raises NotImplementedError for shapes/configs the kernel doesn't cover
    (caller falls back to the XLA dequant+matmul path).
    """
    if qt.q_perm is not None:
        x = x[..., qt.q_perm]  # activation permute (exl2-style), cheap gather
    qt = prepare_for_kernel(qt)
    k, n = qt.logical_shape
    if x.shape[-1] != k:
        raise NotImplementedError("K mismatch")
    if k % qt.group_size != 0:
        raise NotImplementedError("ragged groups")
    return _mpq_matmul_call(
        x,
        qt.packed,
        qt.scales,
        qt.zeros,
        w_bit=qt.w_bit,
        group_size=qt.group_size,
        interpret=interpret,
    )
