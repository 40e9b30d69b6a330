"""Fused multi-segment mixed-bit (MBWQ) dequant matmul — one Pallas launch.

TPU-native equivalent of the reference's single templated mixed-bit kernel
(``mbwq_linear_cuda_kernel.cu:928-1006`` launching one
``fp_gemm_half_q_half_kernel`` over all per-bit row segments via
``pick_gemm_half_q_half_kernel``, ``exl2/kernel_select.cuh:1-128``): instead
of one kernel call per uniform-bit segment (two+ launches, separate output
writes, ~226 GB/s effective in round 1), ONE ``pallas_call`` covers all
segments.  The K grid dimension is the concatenation of every segment's
K-steps; each segment's refs use *clamped index maps* so a segment's blocks
only stream from HBM during its own steps (Pallas skips the DMA when the
block index repeats), and the shared f32 accumulator makes the output a
single write.

Per-segment unpack code is statically specialized (different ``w_bit`` /
``group_size`` / layout per segment) and guarded by ``pl.when`` on the
K-step range, so each grid step executes exactly one segment's body.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...qtensor import MBWQTensor, MPQTensor
from .dequant_matmul import (
    _accumulate_k_step,
    _pick_tiles,
    _round_up,
    prepare_for_kernel,
)

Array = jax.Array


def _clamped(start: int, nk: int):
    """Index component for segment-local K blocks: advance only while the
    global step is inside [start, start+nk); pin to the boundary block
    otherwise so no DMA is issued for out-of-turn segments."""

    def f(i_k):
        return jnp.clip(i_k - start, 0, nk - 1)

    return f


def _mbwq_kernel(*refs, seg_specs, nk_total: int):
    n_seg = len(seg_specs)
    ins = refs[: 4 * n_seg]
    out_ref = refs[4 * n_seg]
    acc_ref = refs[4 * n_seg + 1]
    i_k = pl.program_id(2)

    @pl.when(i_k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for si, spec in enumerate(seg_specs):
        x_ref, packed_ref, scales_ref, zeros_ref = ins[4 * si : 4 * si + 4]
        start, nk, w_bit, gs, gpk, meta3d, layout = spec

        @pl.when((i_k >= start) & (i_k < start + nk))
        def _do(
            x_ref=x_ref,
            packed_ref=packed_ref,
            scales_ref=scales_ref,
            zeros_ref=zeros_ref,
            w_bit=w_bit,
            gs=gs,
            gpk=gpk,
            meta3d=meta3d,
            layout=layout,
        ):
            scales_blk = scales_ref[0] if meta3d else scales_ref[:]
            zeros_blk = zeros_ref[0] if meta3d else zeros_ref[:]
            # legacy full in-kernel zeros correction (zeros_blk given): the
            # single-launch kernel keeps the self-contained form
            acc_ref[:] = _accumulate_k_step(
                x_ref[:],
                packed_ref[:],
                scales_blk,
                acc_ref[:],
                w_bit=w_bit,
                group_size=gs,
                gpk=gpk,
                layout=layout,
                zeros_blk=zeros_blk,
            )

    @pl.when(i_k == nk_total - 1)
    def _store():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("seg_statics", "interpret", "k_step_rows", "block_n"),
)
def _mbwq_matmul_call(
    x_parts: Tuple[Array, ...],
    packeds: Tuple[Array, ...],
    scaless: Tuple[Array, ...],
    zeross: Tuple[Array, ...],
    *,
    seg_statics: Tuple[Tuple[int, int, str], ...],  # (w_bit, group_size, layout)
    interpret: bool = False,
    k_step_rows: Optional[int] = None,
    block_n: Optional[int] = None,
) -> Array:
    m = x_parts[0].shape[0]
    n = packeds[0].shape[1]

    # shared bn across segments (same N); bm from m
    for cand in ((block_n,) if block_n else (1024, 512, 256, 128)):
        if cand and n % cand == 0:
            bn = cand
            break
    else:
        raise NotImplementedError(f"N={n} not a multiple of 128")
    bm = max(8, min(256, _round_up(m, 8)))
    m_pad = _round_up(m, bm)

    seg_specs = []
    in_arrays = []
    in_specs = []
    start = 0
    for x_s, packed, scales, zeros, (w_bit, gs, layout) in zip(
        x_parts, packeds, scaless, zeross, seg_statics
    ):
        k_s = x_s.shape[1]
        _, gpk, _ = _pick_tiles(m, k_s, n, w_bit, gs, k_step_rows, bn, layout)
        nk = (k_s // gs) // gpk
        ppw = 32 // w_bit
        bkp = gs // ppw
        if m_pad != m:
            x_s = jnp.pad(x_s, ((0, m_pad - m), (0, 0)))
        idx = _clamped(start, nk)
        meta3d = gpk % 8 != 0
        if meta3d:
            scales_in = scales.reshape(nk, gpk, n)
            zeros_in = zeros.reshape(nk, gpk, n)
            meta_spec = pl.BlockSpec(
                (1, gpk, bn), lambda im, i_n, i_k, idx=idx: (idx(i_k), 0, i_n)
            )
        else:
            scales_in = scales
            zeros_in = zeros
            meta_spec = pl.BlockSpec(
                (gpk, bn), lambda im, i_n, i_k, idx=idx: (idx(i_k), i_n)
            )
        in_arrays += [x_s, packed, scales_in, zeros_in]
        in_specs += [
            pl.BlockSpec((bm, gpk * gs), lambda im, i_n, i_k, idx=idx: (im, idx(i_k))),
            pl.BlockSpec(
                (gpk * bkp, bn), lambda im, i_n, i_k, idx=idx: (idx(i_k), i_n)
            ),
            meta_spec,
            meta_spec,
        ]
        seg_specs.append((start, nk, w_bit, gs, gpk, meta3d, layout))
        start += nk
    nk_total = start

    out = pl.pallas_call(
        functools.partial(
            _mbwq_kernel, seg_specs=tuple(seg_specs), nk_total=nk_total
        ),
        grid=(m_pad // bm, n // bn, nk_total),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda im, i_n, i_k: (im, i_n)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x_parts[0].dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*in_arrays)
    return out[:m] if m_pad != m else out


def mbwq_matmul_pallas(
    x: Array,
    qt: MBWQTensor,
    interpret: bool = False,
    k_step_rows: Optional[int] = None,
    block_n: Optional[int] = None,
) -> Array:
    """``x_permuted @ dequant(segments)`` in ONE fused kernel launch.

    ``x``: fp ``(m, K_total)`` — already channel-scaled and gathered into
    segment-sorted order (the caller applies ``channel_scale``/``q_perm``
    like the reference applies them outside its kernel,
    ``mbwq_layer.py:352-372``).  Raises ``NotImplementedError`` for shapes
    outside the kernel envelope (caller falls back to per-segment calls).
    """
    segs = [prepare_for_kernel(s) for s in qt.segments]
    if any(s.layout == "tpu_quad" for s in segs):
        # A8 segments quantize activations per segment slice; the fused
        # launch has no per-segment activation-scale plumbing — route
        # through the per-segment dispatch (which wins e2e anyway).
        raise NotImplementedError("tpu_quad segments use per-segment calls")
    off = 0
    x_parts = []
    for s in segs:
        k_s = s.in_features
        if k_s % s.group_size != 0:
            raise NotImplementedError("segment K not a multiple of its group_size")
        x_parts.append(x[:, off : off + k_s])
        off += k_s
    if off != x.shape[1]:
        raise NotImplementedError("K mismatch")
    return _mbwq_matmul_call(
        tuple(x_parts),
        tuple(s.packed for s in segs),
        tuple(s.scales for s in segs),
        tuple(s.zeros for s in segs),
        seg_statics=tuple((s.w_bit, s.group_size, s.layout) for s in segs),
        interpret=interpret,
        k_step_rows=k_step_rows,
        block_n=block_n,
    )
