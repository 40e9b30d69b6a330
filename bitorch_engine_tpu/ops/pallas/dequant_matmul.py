"""Fused group-dequant + matmul Pallas kernel — the engine's crown jewel.

TPU-native replacement for the reference's fused dequant GEMV/GEMM CUDA
kernels (``mpq_linear_cuda_kernel.cu:67-458`` ``quant_mm_kernel`` and the
exl2 ``q_gemm_kernel.cuh``): packed int32 words stream HBM→VMEM, are
unpacked with shifts/masks *in registers*, and feed the MXU — the bf16
weight never exists in HBM, so decode reads ``w_bit/16`` of the bf16 bytes.
For memory-bound decode this IS the speedup (4-bit → ~4× tokens/s ceiling).

Two design moves make the unpack free on TPU (vs the naive translation,
which drowns in sublane relayouts):

1. **Group-factored scaling.**  For quant group ``g``:
       out += scales[g,n] * (x_g @ q_g) - (Σ_k x_g[k]) * zeros[g,n]
   Scales/zeros apply *after* the per-group dot as rank-1 row updates, so
   no per-row broadcast of group metadata is ever materialized — the MXU
   consumes raw integer codes cast to bf16.

2. **TPU packed layouts.**  ``tpu_tiled`` (8-bit): within each group, value
   ``j`` of word ``r`` is logical row ``j*(gs/ppw) + r``, so the unpack is
   ``concat_j((words >> j*b) & mask)`` — a scalar shift per tile and a free
   sublane concatenation, zero shuffles.  ``tpu_pair`` (1/2/4-bit): each
   32-bit word carries codes for both 16-bit lane halves, so one
   ``(words >> j*b) & 0x000m000m | 0x43004300`` extracts TWO codes already
   in bf16 magic-exponent form (``0x4300`` = 128.0; mantissa OR gives
   ``128 + q`` exactly) and a single width-changing ``pltpu.bitcast``
   replaces the per-element int→float convert — roughly halving the VPU
   unpack work that round-1 profiling identified as the kernel's bottleneck.
   The +128 bias folds into the zeros term (``zeros_eff = zeros +
   128*scales``).  The reference does layout tricks of the same spirit at
   load time with its ``shuffle_kernel`` / ``trans_qweight`` re-layouts
   (``mbwq_linear_cuda_kernel.cu:536-628``) and the exl2 bit-twiddle dequant
   (``quant/qdq_4.cuh:34-60``).

Checkpoint-order ("gptq" layout) tensors are converted once by
:func:`relayout_tpu` (pure XLA unpack→repack, runs at prepare time like the
reference's ``prepare_params``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...qtensor import MPQTensor
from .. import packing

Array = jax.Array


# ---------------------------------------------------------------------------
# Layout conversion (prepare-time, pure XLA)
# ---------------------------------------------------------------------------


def _kernel_layout(w_bit: int, act_bits: int = 16) -> str:
    """Canonical kernel layout per bit width: paired-lane extraction for
    sub-byte codes (two codes per shift+mask+or, bf16 magic-exponent convert),
    tiled shift-and-concat for 8-bit (codes ≥128 don't fit the bf16 trick).
    A8 regime (act_bits=8): quad-byte extraction feeding the int8 MXU —
    four codes per shift+mask, the lever that breaks the w2 VPU-extract
    bound (BENCH_NOTES round 3)."""
    if act_bits == 8 and w_bit in packing.QUAD_BITS:
        return "tpu_quad"
    return "tpu_pair" if w_bit in packing.PAIR_BITS else "tpu_tiled"


def relayout_tpu(qt: MPQTensor, meta_dtype=None, act_bits=None) -> MPQTensor:
    """Convert to the kernel's canonical form: sym zeros + TPU packing order.

    The asym→sym rewrite (``w = s(q-z) = q·s - s·z``) mirrors the reference's
    prepare-time decompression (``mpq_layer.py:163-204``); the row re-layout
    mirrors ``mbwq_trans_qweight``'s load-time shuffle.

    ``meta_dtype``: storage dtype for the group scales/zeros.  The decode
    step streams this metadata every token alongside the codes (12.5% of the
    weight bytes at w4g128 when fp32); ``jnp.bfloat16`` halves that stream.
    NOTE: the reference's exl2/GPTQ formats store fp16 scales
    (``matrix_view.cuh``/GPTQ safetensors) — same 16-bit width, but bf16
    carries 8 mantissa bits vs fp16's 11, so bf16-stored scales (and the
    asym→sym ``s·z`` product rounded into them) are coarser than the source
    format.  This is a measured quality trade, not format parity: the
    perplexity gate bounds the delta (``ppl_w4g64_bf16meta`` in
    tests/test_ppl_gate.py); keep ``meta_dtype=None`` (fp32 storage, a
    superset of fp16) where bit-faithful metadata matters more than the
    ~6% byte saving.  The kernel upcasts blocks to f32 before use either
    way.

    ``act_bits``: override the decode-regime activation width (8 selects
    the A8 int8-MXU layout ``tpu_quad`` for 1/2/4-bit containers).
    """
    if act_bits is not None and act_bits != qt.act_bits:
        qt = qt.replace(act_bits=act_bits)
    if qt.act_bits == 8 and qt.w_bit in packing.QUAD_BITS:
        # quad packs per superblock of 8/w_bit groups; tensors whose group
        # count doesn't divide stay on the A16 pair path (consistent math
        # everywhere beats a mixed regime)
        S = packing.quad_superblock_groups(qt.w_bit)
        if (qt.in_features // qt.group_size) % S != 0:
            qt = qt.replace(act_bits=16)
    if (
        qt.act_bits == 8
        and not qt.asym
        and not qt.zeros_mid
        and qt.w_bit in packing.QUAD_BITS
        and not isinstance(qt.zeros, jax.core.Tracer)
    ):
        # detect the exl2 symmetric-midpoint form (zeros ≡ mid·scales
        # exactly) on concrete tensors at load time: the quad kernel then
        # runs signed codes and drops the whole zeros correction
        import numpy as _np

        mid = 2 ** ((qt.code_bits or qt.w_bit) - 1)
        if _np.array_equal(
            _np.asarray(qt.zeros), mid * _np.asarray(qt.scales, _np.float32)
        ):
            qt = qt.replace(zeros_mid=True)
    target = _kernel_layout(qt.w_bit, qt.act_bits)
    if qt.layout == target:
        if meta_dtype is not None and qt.scales.dtype != meta_dtype:
            return qt.replace(
                scales=qt.scales.astype(meta_dtype),
                zeros=qt.zeros if qt.asym else qt.zeros.astype(meta_dtype),
            )
        return qt
    if qt.group_size % (32 // qt.w_bit) != 0:
        raise NotImplementedError("group_size must be a multiple of 32/w_bit")
    zeros = qt.zeros
    asym = qt.asym
    if asym:
        z_int = packing.unpack_cols(qt.zeros, qt.w_bit).astype(jnp.float32)
        zeros = (qt.scales.astype(jnp.float32) * z_int).astype(qt.scales.dtype)
        asym = False
    q_int = packing.unpack_rows_layout(qt.packed, qt.w_bit, qt.group_size, qt.layout)
    packed = packing.pack_rows_layout(q_int, qt.w_bit, qt.group_size, target)
    scales = qt.scales
    if meta_dtype is not None:
        scales = scales.astype(meta_dtype)
        zeros = zeros.astype(meta_dtype)
    return qt.replace(
        packed=packed, scales=scales, zeros=zeros, asym=asym, layout=target
    )


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


# bf16 magic: 0x4300 = 128.0; OR-ing a code q < 128 into the mantissa yields
# bf16(128 + q) exactly (ulp at [128,256) is 1).  The +128 bias is folded
# into the zeros term: zeros_eff = zeros + 128*scales.
_PAIR_MAGIC = 0x43004300
_PAIR_BIAS = 128.0


def _unpack_group_to_dtype(words, w_bit: int, layout: str, dtype):
    """(bkp, bn) uint32 words → (group_size, bn) ``dtype`` codes.

    tpu_pair: values come out biased by +128 (see ``_PAIR_MAGIC``); the
    caller compensates via the zeros term.  tpu_tiled: unbiased.
    (tpu_quad is unpacked whole-K-step by :func:`_unpack_kstep_quad`.)
    """
    ppw = 32 // w_bit
    mask32 = jnp.uint32((1 << w_bit) - 1)
    if layout == "tpu_pair":
        pair_mask = jnp.uint32(((1 << w_bit) - 1) * 0x00010001)
        magic = jnp.uint32(_PAIR_MAGIC)
        tiles = [
            (lax.shift_right_logical(words, jnp.uint32(j * w_bit)) & pair_mask)
            | magic
            for j in range(ppw // 2)
        ]
        blk = jnp.concatenate(tiles, axis=0)  # (gs/2 words, bn)
        q = pltpu.bitcast(blk, jnp.bfloat16)  # (gs, bn) = 128 + codes
        return q if dtype == jnp.bfloat16 else q.astype(dtype)
    tiles = [
        pltpu.bitcast(
            lax.shift_right_logical(words, jnp.uint32(j * w_bit)) & mask32,
            jnp.int32,
        )
        for j in range(ppw)
    ]
    return jnp.concatenate(tiles, axis=0).astype(dtype)


def _unpack_kstep_quad_tiles(packed, w_bit: int, mid: int = 0):
    """Whole-K-step tpu_quad unpack, zero-copy form: (gpk·bkp, bn) uint32 →
    list of ``8/w_bit`` int8 tile arrays, each (gpk·gs·w_bit/8, bn).

    The shift+mask ops run on the FULL packed block (full sublane
    occupancy — the per-group form at small group sizes runs on bkp=2-row
    slivers at 25% occupancy; measured 366 vs target ~750 GB/s, round-4
    probe).  A (superblock, tile) pair covers EXACTLY one quant group
    (4·S·bkp = gs identically), so group ``g``'s codes are the rows
    ``[(g//S)·gs, (g//S+1)·gs)`` of tile ``g % S`` — per-group access is a
    tile-aligned slice and the concat materialization of the whole
    unpacked block (measured ~9 µs on the 8192×4096 w2 K-steps, round-4
    ablation) never happens.  See ``packing.pack_rows_tpu_quad`` for the
    layout derivation.
    """
    ppw = 32 // w_bit
    qmask = jnp.uint32(((1 << w_bit) - 1) * 0x01010101)
    # NB: mid-code (signed) tensors keep the UNSIGNED extraction — Mosaic
    # on v5e cannot legalize elementwise i8 arithmetic (`arith.subi` on
    # vector<i8> fails to compile), so the mid bias is folded into the
    # per-group accumulation instead (see _accumulate_k_step): the int32
    # dot and the f32 group-sum are both exact integers < 2^24, so
    # d − mid·Σx is bit-identical to the signed-code dot.
    del mid
    return [
        pltpu.bitcast(
            lax.shift_right_logical(packed, jnp.uint32(j * w_bit)) & qmask,
            jnp.int8,
        )
        for j in range(ppw // 4)
    ]


def _quad_group(q_tiles, g: int, w_bit: int, group_size: int):
    """Group ``g``'s (gs, bn) int8 codes from the tile list."""
    S = 8 // w_bit
    sb = g // S
    return q_tiles[g % S][sb * group_size : (sb + 1) * group_size]


def _accumulate_k_step(
    x_blk,
    packed_blk,
    scales_blk,
    acc,
    *,
    w_bit: int,
    group_size: int,
    gpk: int,
    layout: str,
    xsums_blk=None,
    zeros_blk=None,
    mid_codes: int = 0,
    pair_fma: bool = False,
):
    """One K-step of the fused dequant matmul: unpack ``gpk`` quant groups,
    dot each against its activation slice, apply group-factored scales.
    Shared by the grid and multi-segment (MBWQ) kernels.

    Zeros correction placement (round-4/5 history): the subtractive-zero
    term ``Σ_g xsum_g · zeros[g,n]`` lived in-kernel as a per-K-step
    ``precision=HIGHEST`` MXU dot (expensive at small group sizes, ~4.7 µs
    per 8192×4096 w2 g32 K-step), moved OUTSIDE as one XLA dot per
    projection in round 4, and moved back IN for tpu_quad in round 5 as
    per-group VPU broadcast FMAs (``contrib·s − xsum·z``) after the
    outside form's group-sum reduces measured ~185 µs/step of fixed
    launch latency on the uniform-w2 serving step.  ``zeros_mid`` tensors
    (zeros ≡ mid·scales) skip the zeros stream entirely and subtract
    ``mid·xsum_g``.  tpu_pair keeps its +128 magic-exponent bias row
    (``contrib − 128·xsum_g``) and the legacy batched end-of-loop dot.

    ``xsums_blk``: (bm, gpk) f32 per-group activation sums, required for
    tpu_pair (the bias rows).  ``zeros_blk``: when given, the legacy full
    in-kernel correction runs instead (the multi-segment MBWQ kernel still
    uses this form; see mbwq_matmul.py)."""
    ppw = 32 // w_bit
    bkp = group_size // ppw
    # "legacy" = the batched end-of-loop zeros dot (pair/tiled layouts);
    # quad (and pair under the experimental pair_fma mode) handle their
    # correction per group inside the loop
    legacy = (
        zeros_blk is not None
        and layout != "tpu_quad"
        and not (pair_fma and layout == "tpu_pair")
    )
    if legacy:
        zeros_eff = zeros_blk.astype(jnp.float32)
        if layout == "tpu_pair":
            # compensate the +128 bias the magic-exponent unpack adds
            zeros_eff = zeros_eff + _PAIR_BIAS * scales_blk.astype(jnp.float32)
    packed = packed_blk.astype(jnp.uint32)  # (gpk*bkp, bn)
    q_tiles = (
        _unpack_kstep_quad_tiles(packed, w_bit, mid_codes)
        if layout == "tpu_quad"
        else None
    )
    xsums = []
    for g in range(gpk):  # static unroll over groups in this K step
        x_g = x_blk[:, g * group_size : (g + 1) * group_size]  # (bm, gs)
        if layout == "tpu_quad":
            # A8 regime: int8 activations × int8 codes on the int8 MXU,
            # exact int32 accumulate; the per-token activation scale is
            # factored out entirely (applied by the caller on the output).
            # The zeros correction lives HERE as per-group broadcast FMAs
            # on the VPU — not as the legacy per-K-step (gpk,bn) MXU dot
            # (whose HIGHEST-precision pass cost ~4.7 µs/K-step, the
            # round-4 reason zeros moved outside) and not as the outside
            # XLA dot + group-sum reduces (~185 µs/step of fixed-latency
            # ops on the uniform-w2 8B decode, round-5 trace).  xsum and
            # the int32 dot are exact integers in f32 (< 2^24).
            q = _quad_group(q_tiles, g, w_bit, group_size)  # (gs, bn) i8
            contrib = jnp.dot(
                x_g, q, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            scale = scales_blk[g : g + 1, :].astype(jnp.float32)  # (1, bn)
            if mid_codes:
                # zeros ≡ mid·scales: correction = mid·Σx_g, no zeros
                # stream at all (bit-identical to a signed-code dot)
                xsum = jnp.sum(x_g.astype(jnp.float32), axis=1, keepdims=True)
                contrib = contrib - float(mid_codes) * xsum
                acc = acc + contrib * scale
            elif zeros_blk is not None:
                xsum = jnp.sum(x_g.astype(jnp.float32), axis=1, keepdims=True)
                z_row = zeros_blk[g : g + 1, :].astype(jnp.float32)
                acc = acc + (contrib * scale - xsum * z_row)
            else:
                acc = acc + contrib * scale
            continue
        else:
            words = packed[g * bkp : (g + 1) * bkp, :]
            q = _unpack_group_to_dtype(words, w_bit, layout, x_blk.dtype)
            contrib = jnp.dot(x_g, q, preferred_element_type=jnp.float32)
            if layout == "tpu_pair" and pair_fma and zeros_blk is not None:
                # experimental per-group FMA zeros for pair (the quad
                # round-5 form): contrib − 128·xsum bias, then
                # acc += contrib·s − xsum·z — replaces the per-K-step
                # HIGHEST MXU zeros dot.  BITORCH_PAIR_FMA=1.
                xsum = jnp.sum(x_g.astype(jnp.float32), axis=1, keepdims=True)
                scale = scales_blk[g : g + 1, :].astype(jnp.float32)
                z_row = zeros_blk[g : g + 1, :].astype(jnp.float32)
                acc = acc + (
                    (contrib - _PAIR_BIAS * xsum) * scale - xsum * z_row
                )
                continue
            if layout == "tpu_pair" and not legacy:
                contrib = contrib - _PAIR_BIAS * xsums_blk[:, g : g + 1]
        scale = scales_blk[g : g + 1, :].astype(jnp.float32)  # (1, bn)
        acc = acc + contrib * scale
        if legacy and xsums_blk is None:
            xsums.append(jnp.sum(x_g.astype(jnp.float32), axis=1, keepdims=True))
    if not legacy:
        return acc
    # legacy in-kernel zeros term, batched into ONE MXU op per K step:
    #   Σ_g (Σ_k x_g[k]) · zeros[g, n]  ==  xsums (bm, gpk) @ zeros (gpk, bn)
    # precision=HIGHEST is load-bearing: at default precision the MXU
    # truncates these f32 operands to bf16, and for tpu_pair the folded
    # +128 bias makes this term up to 128/maxq ≈ 128× larger than the
    # signal — bf16 truncation there showed up as 10–73% end error on
    # hardware (interpret mode computes f32 and hid it).
    xsums_mat = (
        xsums_blk.astype(jnp.float32)
        if xsums_blk is not None
        else jnp.concatenate(xsums, axis=1)
    )  # (bm, gpk)
    return acc - jnp.dot(
        xsums_mat,
        zeros_eff,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def _mpq_kernel(
    x_ref,
    packed_ref,
    scales_ref,
    *rest,
    w_bit: int,
    group_size: int,
    gpk: int,
    nk: int,
    meta3d: bool,
    layout: str = "tpu_tiled",
    has_zeros: bool = False,
    has_xsums: bool = False,
    mid_codes: int = 0,
    pair_fma: bool = False,
):
    idx = 0
    zeros_ref = None
    if has_zeros:
        zeros_ref = rest[idx]
        idx += 1
    xsums_ref = None
    if has_xsums:
        xsums_ref = rest[idx]
        idx += 1
    out_ref, acc_ref = rest[idx], rest[idx + 1]
    i_k = pl.program_id(2)

    @pl.when(i_k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # metadata blocks: (gpk, bn) straight from the 2-D (G, N) arrays when
    # gpk is sublane-aligned; the 3-D reshape fallback costs a relayout copy
    # of the whole scales per call (measured ~3 us on 4096² w4)
    scales_blk = scales_ref[0] if meta3d else scales_ref[:]
    zeros_blk = None
    if zeros_ref is not None:
        zeros_blk = zeros_ref[0] if meta3d else zeros_ref[:]

    acc_ref[:] = _accumulate_k_step(
        x_ref[:],
        packed_ref[:],
        scales_blk,
        acc_ref[:],
        w_bit=w_bit,
        group_size=group_size,
        gpk=gpk,
        layout=layout,
        xsums_blk=None if xsums_ref is None else xsums_ref[0],
        zeros_blk=zeros_blk,
        mid_codes=mid_codes,
        pair_fma=pair_fma,
    )

    @pl.when(i_k == nk - 1)
    def _store():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# v5e-tuned (k_step_rows, block_n) per (k, n, w_bit) for the tpu_pair
# layout — measured sweep (session r2b, 300-iter on-device loops); the
# TPU analogue of the reference's per-GPU CUTLASS tile-selection tables
# (binary cutlass layer.py device tables).  Shapes: llama3-8B/llama2-7B
# projections.  Fallback is the generic heuristic below.
_PAIR_TILE_TABLE_BUILTIN = {
    (4096, 4096, 4): (4096, 512),    # q/o proj: 707 GB/s (vs 680 default)
    (4096, 14336, 4): (2048, 2048),  # gate/up: 731 GB/s (vs 651)
    (14336, 4096, 4): (2048, 2048),  # down:    688 GB/s incl meta
    # fused projections + padded lm_head (session r2c sweep, bf16 metadata)
    (4096, 6144, 4): (4096, 2048),   # fused qkv: 677 GB/s (vs 579 default)
    (4096, 28672, 4): (4096, 2048),  # fused gate|up: 725 GB/s (vs 714)
    (4096, 131072, 4): (2048, 2048), # lm_head pad 128*1024: 750 GB/s
    (4096, 129024, 4): (2048, 2048), # lm_head pad 63*2048 (0.6% pad bytes)
    (4096, 128256, 4): (4096, 256),  # unpadded llama3 head: 614 vs 461
    # llama2-7B MBWQ w4 g64 segments (tools/autotune_tiles.py, v5e,
    # 2026-08-20, m=8) — these small calls ran at the generic heuristic's
    # 480-640 GB/s before
    (1024, 4096, 4): (1024, 4096),   # o/qkv w4 segment: 1418 GB/s (vs 481)
    (1024, 12288, 4): (1024, 1024),  # fused qkv w4 segment: 681 (vs 562)
    (1024, 22528, 4): (1024, 2048),  # fused gate|up w4 segment: 680 (vs 641)
}

# v5e-tuned tiles for the A8 tpu_quad layout (round-4 probe-3 sweep, m=8,
# bf16 metadata; tools/autotune_tiles.py --layout quad regenerates for new
# chips/shapes).  Shapes: llama2-7B MBWQ-2.5 w2 segments (fused serving).
_QUAD_TILE_TABLE_BUILTIN = {
    (3072, 4096, 2): (3072, 2048),   # o-proj w2 segment: 330 GB/s
    (3072, 12288, 2): (3072, 4096),  # fused qkv w2 segment: 442 GB/s
    (8192, 4096, 2): (4096, 1024),   # down w2 segment: 388 GB/s
    (4096, 4096, 2): (2048, 1024),   # uniform-w2 q/o proj: 367 GB/s
    # padded fused gate|up w2 segment (tools/autotune_tiles.py, v5e,
    # 2026-08-20, m=8): 562 GB/s vs 431 with the generic heuristic
    (3072, 22528, 2): (1536, 2048),
}

# Live tables = built-ins overlaid with measured entries from a JSON file,
# closing the adopt-the-sweep loop (VERDICT r4 wp8: hand-editing source
# meant new chips/shapes silently fell to the generic heuristic).
# ``tools/autotune_tiles.py --write`` maintains the file; search order is
# $BITORCH_TILE_TABLE, then the checked-in ``tile_tables.json`` next to
# this module.  JSON schema: {"tpu_pair": {"K,N,WBIT": [ks, bn], ...},
# "tpu_quad": {...}, "_meta": {...ignored provenance...}}.
_PAIR_TILE_TABLE = dict(_PAIR_TILE_TABLE_BUILTIN)
_QUAD_TILE_TABLE = dict(_QUAD_TILE_TABLE_BUILTIN)


def tile_table_path() -> str:
    import os

    return os.environ.get("BITORCH_TILE_TABLE") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tile_tables.json"
    )


def reload_tile_tables(path: Optional[str] = None) -> dict:
    """Re-read the tile-table JSON and rebuild the live tables (built-ins
    first, file entries overriding).  Called at import; call again after
    writing a new file.  NOTE: tiles are resolved inside jitted calls, so
    shapes already compiled in this process keep their old tiles."""
    import json
    import os

    global _PAIR_TILE_TABLE, _QUAD_TILE_TABLE
    path = path or tile_table_path()
    pair = dict(_PAIR_TILE_TABLE_BUILTIN)
    quad = dict(_QUAD_TILE_TABLE_BUILTIN)
    loaded = {}
    if os.path.exists(path):
        with open(path) as f:
            raw = json.load(f)
        for layout, tbl in ((("tpu_pair"), pair), (("tpu_quad"), quad)):
            for key, val in (raw.get(layout) or {}).items():
                k, n, wb = (int(v) for v in key.split(","))
                tbl[(k, n, wb)] = (int(val[0]), int(val[1]))
            loaded[layout] = len(raw.get(layout) or {})
    _PAIR_TILE_TABLE = pair
    _QUAD_TILE_TABLE = quad
    return loaded


reload_tile_tables()


def _pick_tiles(
    m: int, k: int, n: int, w_bit: int, gs: int,
    k_step_rows: Optional[int] = None, block_n: Optional[int] = None,
    layout: str = "tpu_tiled",
):
    """(bm, gpk, bn): groups-per-K-step sized so the packed block has ≥ 8
    sublane rows and ~≥ `k_step_rows` logical K rows for MXU efficiency."""
    table = {"tpu_pair": _PAIR_TILE_TABLE, "tpu_quad": _QUAD_TILE_TABLE}.get(layout)
    if (
        table is not None
        and k_step_rows is None
        and block_n is None
        and m <= 8
        and (k, n, w_bit) in table
    ):
        k_step_rows, block_n = table[(k, n, w_bit)]
    ppw = 32 // w_bit
    bkp = gs // ppw
    g_total = k // gs
    target = k_step_rows or 2048
    # tpu_quad packs per superblock of S groups; every K step must hold
    # whole superblocks (see packing.pack_rows_tpu_quad)
    S = 8 // w_bit if layout == "tpu_quad" else 1
    if g_total % S != 0:
        raise NotImplementedError(
            f"groups {g_total} not divisible by quad superblock {S}"
        )
    gpk = S
    while gpk * bkp < 8 or (gpk * gs < target and gpk * 2 <= g_total):
        if g_total % (gpk * 2) != 0:
            break
        gpk *= 2
    if (gpk * bkp) % 8 != 0:
        raise NotImplementedError(
            f"packed block rows {gpk * bkp} not 8-aligned (w_bit={w_bit}, gs={gs})"
        )
    if g_total % gpk != 0:
        raise NotImplementedError(f"groups {g_total} not divisible by gpk {gpk}")
    if (gpk * gs) % 128 != 0 and gpk * gs != k:
        # Mosaic requires the x block's lane dim to be 128-aligned (or the
        # whole K); odd group counts (e.g. K=2752 @ gs=64 → 43 groups) land
        # here → caller falls back to the XLA dequant path
        raise NotImplementedError(
            f"K step {gpk * gs} not 128-lane-aligned (K={k}, gs={gs})"
        )
    bm = max(8, min(256, _round_up(m, 8)))
    # default bn: largest of 1024/512/256/128 dividing N (v5e autotune sweep:
    # 4096x4096 w4g128 m8 → ks=2048/bn=1024 = 509 GB/s, 2.9x vs bf16)
    if block_n is not None and n % block_n == 0:
        bn = block_n
    else:
        for cand in (1024, 512, 256, 128):
            if n % cand == 0:
                bn = cand
                break
        else:
            raise NotImplementedError(f"N={n} not a multiple of 128")
        if bn <= 256:
            # N with few 2-power factors (llama2 11008 = 128*86) makes
            # narrow blocks that stream poorly (256-wide ≈ 180 GB/s): any
            # 128-multiple divisor works — take the largest ≤ 4096, else
            # cover the whole N in one block (Mosaic allows block == dim;
            # an 11008-wide w2 block is ~2.8 MB of VMEM, well in budget)
            for mult in range(min(n, 4096) // 128, bn // 128, -1):
                if n % (mult * 128) == 0:
                    bn = mult * 128
                    break
            else:
                if n <= 16384:
                    bn = n
    # scoped-VMEM guard: the double-buffered packed block (+ x/meta/acc)
    # must fit the ~16 MB scoped limit.  N with few 2-power factors takes
    # the whole-N bn fallback above (e.g. llama2 gate/up N=11008), where a
    # 2048-row K step is 5.6 MB of packed words alone and Mosaic refuses
    # the stack allocation (measured on v5e, round-4 probe) — halve the K
    # step until the estimate fits.
    def vmem_est(gpk_):
        xb = bm * gpk_ * gs * (1 if layout == "tpu_quad" else 2)
        pk = gpk_ * bkp * bn * 4
        meta = 2 * gpk_ * bn * 4
        return 2 * (xb + pk + meta) + 2 * bm * bn * 4
    while vmem_est(gpk) > 12 * 1024 * 1024 and gpk > S and gpk % 2 == 0 \
            and (gpk // 2) * bkp >= 8 and g_total % (gpk // 2) == 0 \
            and ((gpk // 2) * gs) % 128 == 0:
        gpk //= 2
    if vmem_est(gpk) > 14 * 1024 * 1024:
        raise NotImplementedError(
            f"no VMEM-fitting K step for K={k}, N={n} (bn={bn}, gpk={gpk})"
        )
    return bm, gpk, bn


@functools.partial(
    jax.jit,
    static_argnames=(
        "w_bit", "group_size", "interpret", "out_dtype", "k_step_rows", "block_n",
        "layout", "mid_codes", "pair_fma",
    ),
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
    k_step_rows: Optional[int] = None,
    block_n: Optional[int] = None,
    layout: str = "tpu_tiled",
    mid_codes: int = 0,
    pair_fma: bool = False,
) -> Array:
    m, k = x.shape
    n = packed.shape[1]
    gs = group_size
    out_dtype = out_dtype or x.dtype
    bm, gpk, bn = _pick_tiles(m, k, n, w_bit, gs, k_step_rows, block_n, layout)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    nm, nn, nk = m_pad // bm, n // bn, (k // gs) // gpk
    ppw = 32 // w_bit
    bkp = gs // ppw

    meta3d = gpk % 8 != 0
    if meta3d:
        scales_in = scales.reshape(nk, gpk, n)
        meta_spec = pl.BlockSpec((1, gpk, bn), lambda im, i_n, i_k: (i_k, 0, i_n))
    else:
        scales_in = scales
        meta_spec = pl.BlockSpec((gpk, bn), lambda im, i_n, i_k: (i_k, i_n))

    # Zeros-correction placement (round-4/5 history): round 4 moved the
    # quad correction OUT of the kernel (the in-kernel form then was a
    # per-K-step precision=HIGHEST MXU dot, ~4.7 µs on g32 shapes); the
    # round-5 trace showed the outside form costs ~185 µs/step of
    # fixed-latency XLA group-sum reduces on the uniform-w2 8B config, so
    # the correction moved back IN — as per-group VPU broadcast FMAs
    # (contrib·s − xsum·z), which touch no MXU and stream zeros exactly
    # once alongside the scales.  mid_codes tensors (zeros ≡ mid·scales)
    # skip the zeros operand entirely.  pair/tiled keep the legacy
    # batched end-of-loop dot (small group counts make it cheap).
    has_zeros = not (mid_codes and layout == "tpu_quad")
    kernel = functools.partial(
        _mpq_kernel, w_bit=w_bit, group_size=gs, gpk=gpk, nk=nk, meta3d=meta3d,
        layout=layout, has_zeros=has_zeros,
        has_xsums=False, mid_codes=mid_codes, pair_fma=pair_fma,
    )

    in_specs = [
        pl.BlockSpec((bm, gpk * gs), lambda im, i_n, i_k: (im, i_k)),
        pl.BlockSpec((gpk * bkp, bn), lambda im, i_n, i_k: (i_k, i_n)),
        meta_spec,
    ]
    operands = [x, packed, scales_in]
    if has_zeros:
        zeros_in = zeros.reshape(nk, gpk, n) if meta3d else zeros
        in_specs.append(meta_spec)
        operands.append(zeros_in)

    out = pl.pallas_call(
        kernel,
        grid=(nm, nn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda im, i_n, i_k: (im, i_n)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        # NB: no pl.CostEstimate — measured on v5e it pessimizes the grid
        # pipeline by ~20% (16.4us vs 13.5us on the 4096^2 w4 GEMV)
        interpret=interpret,
    )(*operands)
    if m_pad != m:
        out = out[:m]
    return out


# ---------------------------------------------------------------------------
# A manually double-buffered DMA variant (grid over n-blocks, K streamed via
# a 2-slot `make_async_copy` rotation) lived here through round 1.  It was
# built on the theory that Mosaic fails to overlap the K-step DMA with the
# unpack+dot chain; it looked great in isolated microbenchmarks but LOST in
# every same-process e2e A/B (llama3-8B decode: 10.43 vs 9.25 ms/step), and
# after the paired-lane layout halved the unpack work it lost even the
# single-op comparisons on every serving shape (v5e, bf16 metadata, m=8:
# head 4096x131072 507.7us vs grid 387.0; gate|up 111.7 vs 94.8; down 48.7
# vs 44.3; q/o 18.5 vs 14.2).  Deleted per that evidence — the grid kernel +
# XLA's own scheduling is the better TPU design; see git history for the
# implementation and BENCH_NOTES.md for the measurement trail.
# ---------------------------------------------------------------------------


def prepare_for_kernel(qt: MPQTensor) -> MPQTensor:
    """Kept for API compatibility: canonicalize to kernel form."""
    if qt.g_idx is not None:
        qt = qt.replace(g_idx=None)  # sequential-group g_idx only
    return relayout_tpu(qt)


def mpq_matmul_pallas(
    x: Array,
    qt: MPQTensor,
    interpret: bool = False,
    k_step_rows: Optional[int] = None,
    block_n: Optional[int] = None,
) -> Array:
    """``x @ dequant(qt)`` with the fused kernel.

    Accepts either layout ("gptq" is relayouted on the fly — prefer calling
    :func:`relayout_tpu` once at load time).  Raises NotImplementedError for
    configurations the kernel doesn't cover (caller falls back to XLA).
    """
    if qt.q_perm is not None:
        x = x[..., qt.q_perm]  # activation permute (exl2-style), cheap gather
    qt = prepare_for_kernel(qt)
    k, n = qt.logical_shape
    if x.shape[-1] != k:
        raise NotImplementedError("K mismatch")
    if k % qt.group_size != 0:
        raise NotImplementedError("ragged groups")
    if qt.layout == "tpu_quad":
        # A8 regime: dynamic per-token activation quantization.  The
        # per-row scale sx factors out of both the code dots AND the
        # zeros correction, so the kernel runs entirely in integer codes
        # and sx multiplies the f32 output once (beyond-reference; the
        # reference fixes a_bit=16, mpq_layer.py:160-161).
        xf = x.astype(jnp.float32)
        sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        sx = jnp.maximum(sx, 1e-12)
        qx = jnp.round(xf / sx).astype(jnp.int8)
        out = _mpq_matmul_call(
            qx,
            qt.packed,
            qt.scales,
            qt.zeros,
            w_bit=qt.w_bit,
            group_size=qt.group_size,
            interpret=interpret,
            k_step_rows=k_step_rows,
            block_n=block_n,
            layout=qt.layout,
            out_dtype=jnp.float32,
            mid_codes=(
                2 ** ((qt.code_bits or qt.w_bit) - 1) if qt.zeros_mid else 0
            ),
        )
        return (out * sx).astype(x.dtype)
    import os as _os

    return _mpq_matmul_call(
        x,
        qt.packed,
        qt.scales,
        qt.zeros,
        w_bit=qt.w_bit,
        group_size=qt.group_size,
        interpret=interpret,
        k_step_rows=k_step_rows,
        block_n=block_n,
        layout=qt.layout,
        # experimental pair-layout per-group FMA zeros (read at trace
        # time; static arg so each setting compiles separately)
        pair_fma=_os.environ.get("BITORCH_PAIR_FMA", "0") == "1",
    )


# ---------------------------------------------------------------------------
# Dequant-only kernel: packed → bf16 weight, for the m>MAX_FUSED_ROWS regime
# ---------------------------------------------------------------------------


def _dequant_kernel(
    packed_ref,
    scales_ref,
    zeros_ref,
    out_ref,
    *,
    w_bit: int,
    group_size: int,
    gpk: int,
    meta3d: bool,
    layout: str,
):
    scales_blk = scales_ref[0] if meta3d else scales_ref[:]
    zeros_blk = zeros_ref[0] if meta3d else zeros_ref[:]
    ppw = 32 // w_bit
    bkp = group_size // ppw
    zeros_eff = zeros_blk.astype(jnp.float32)
    if layout == "tpu_pair":
        zeros_eff = zeros_eff + _PAIR_BIAS * scales_blk.astype(jnp.float32)
    packed = packed_ref[:].astype(jnp.uint32)
    q_tiles = (
        _unpack_kstep_quad_tiles(packed, w_bit) if layout == "tpu_quad" else None
    )
    parts = []
    for g in range(gpk):
        if layout == "tpu_quad":
            q = _quad_group(q_tiles, g, w_bit, group_size).astype(jnp.float32)
        else:
            q = _unpack_group_to_dtype(
                packed[g * bkp : (g + 1) * bkp, :], w_bit, layout, jnp.float32
            )
        w = q * scales_blk[g : g + 1, :].astype(jnp.float32) - zeros_eff[g : g + 1, :]
        parts.append(w)
    out_ref[:] = jnp.concatenate(parts, axis=0).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("w_bit", "group_size", "layout", "out_dtype", "interpret"),
)
def _dequant_call(
    packed, scales, zeros, *, w_bit, group_size, layout, out_dtype, interpret=False
):
    n = packed.shape[1]
    ppw = 32 // w_bit
    k = packed.shape[0] * ppw
    gs = group_size
    # dequant-specific tiles, NOT the matmul table: the output block here is
    # (k_step, bn) bf16 plus per-group f32 temporaries, so k_step*bn must
    # stay ~1-2 MB or the kernel blows the scoped-VMEM limit (the matmul
    # kernel's out block is only (bm, bn))
    bn_d = None
    for cand in (1024, 512, 256, 128):
        if n % cand == 0:
            bn_d = cand
            break
    if bn_d is None:
        bn_d = n
    _, gpk, bn = _pick_tiles(
        8, k, n, w_bit, gs, k_step_rows=min(512, k), block_n=bn_d, layout=layout
    )
    nk, nn = (k // gs) // gpk, n // bn
    bkp = gs // ppw
    meta3d = gpk % 8 != 0
    if meta3d:
        scales_in = scales.reshape(nk, gpk, n)
        zeros_in = zeros.reshape(nk, gpk, n)
        meta_spec = pl.BlockSpec((1, gpk, bn), lambda i_k, i_n: (i_k, 0, i_n))
    else:
        scales_in = scales
        zeros_in = zeros
        meta_spec = pl.BlockSpec((gpk, bn), lambda i_k, i_n: (i_k, i_n))
    kernel = functools.partial(
        _dequant_kernel,
        w_bit=w_bit,
        group_size=gs,
        gpk=gpk,
        meta3d=meta3d,
        layout=layout,
    )
    return pl.pallas_call(
        kernel,
        grid=(nk, nn),
        in_specs=[
            pl.BlockSpec((gpk * bkp, bn), lambda i_k, i_n: (i_k, i_n)),
            meta_spec,
            meta_spec,
        ],
        out_specs=pl.BlockSpec((gpk * gs, bn), lambda i_k, i_n: (i_k, i_n)),
        out_shape=jax.ShapeDtypeStruct((k, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(packed, scales_in, zeros_in)


def dequant_mpq_pallas(qt: MPQTensor, dtype=jnp.bfloat16, interpret: bool = False):
    """Reconstruct the fp weight ``(K, N)`` with one streaming Pallas pass.

    The m>MAX_FUSED_ROWS regime (prefill/training — the reference's
    reconstruct+cuBLAS path, ``mbwq_linear_cuda_kernel.cu:946-956``)
    previously dequantized through XLA's generic unpack, which materializes
    a u32 copy of every code (4 bytes/code: ~470 MB per gate|up projection)
    — measured ~34% of the whole 8B prefill step (BENCH_NOTES round 2).
    This kernel reads packed words once and writes bf16 once.  Bit-exact
    with :func:`~...ops.quant.dequantize_mpq` (both compute ``q·s − z`` in
    f32 and cast).  Raises NotImplementedError for configs the kernel
    doesn't cover (q_perm/g_idx/asym or non-tiling shapes) — callers fall
    back to the XLA path.
    """
    if qt.q_perm is not None or qt.g_idx is not None:
        raise NotImplementedError("q_perm/g_idx dequant stays on the XLA path")
    qt = prepare_for_kernel(qt)
    if qt.asym:
        raise NotImplementedError("asym is rewritten by relayout_tpu")
    return _dequant_call(
        qt.packed,
        qt.scales,
        qt.zeros,
        w_bit=qt.w_bit,
        group_size=qt.group_size,
        layout=qt.layout,
        out_dtype=dtype,
        interpret=interpret,
    )
