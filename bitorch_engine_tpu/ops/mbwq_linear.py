"""MBWQ: mixed-bit-width (GreenBit channel-mix / exllamav2-style) linear.

TPU-native re-design of the reference MBWQ stack
(``nbit/cuda/mbwq_layer.py`` + ``mbwq_linear_cuda_kernel.cu:536-628``):
different input-channel row-groups of one weight matrix are quantized at
different bit widths (e.g. 75% of rows at 4-bit, 25% at 2-bit ⇒ avg 3.5
bits).  The reference's ``mbwq_trans_qweight`` shuffles rows into contiguous
per-bit segments at load time and dispatches one templated CUDA kernel per
segment mix; here each segment is a uniform :class:`MPQTensor` and the
forward is a sum of per-segment (Pallas-fused) matmuls over the permuted
activations — identical math, and each segment tiles cleanly on the MXU.

``channel_scale`` is the per-input-channel pre-scale the reference applies
before the kernel (``mbwq_layer.py:180-181, 362``).

Strategy format parity (``test_nbit_linear_mixbits.py:26-29``):
``{"bits": [4, 2], "bits_prop": [0.75, 0.25], "group_size": {"4": 32, "2": 32}}``.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..qtensor import MBWQTensor, MPQTensor, qtensor_cotangent
from . import packing
from .quant import dequantize_mpq, quantize_mpq

Array = jax.Array


def strategy_dict(
    entries, default_gs: int, container_bits=None, mid_sym: bool = False
) -> Dict:
    """Build the reference-format strategy dict from config-style entries.

    ``entries`` are ``(bits, proportion[, group_size])`` tuples (the
    optional third element overrides ``default_gs`` for that bit width —
    e.g. w2 at g128 halves metadata bytes and gives the per-group dot the
    MXU's native K=128).  Shared by ``LlamaConfig.mbwq_strategy`` consumers
    (models/llama.py ``_proj`` and models/llama_loader.py) so the two
    never diverge."""
    bits, props, gss = [], [], {}
    for entry in entries:
        b, p = int(entry[0]), float(entry[1])
        bits.append(b)
        props.append(p)
        gss[str(b)] = int(entry[2]) if len(entry) > 2 else int(default_gs)
    strat = {"bits": bits, "bits_prop": props, "group_size": gss}
    if container_bits:
        strat["container_bits"] = {
            str(kk): int(v) for kk, v in dict(container_bits).items()
        }
    if mid_sym:
        strat["mid_sym"] = True
    return strat


def _fit_group_size(requested: int, seg_k: int, w_bit: int) -> int:
    """Largest valid group size ≤ ``requested`` that divides the segment's K
    and keeps whole packed words per group (gs % (32/w_bit) == 0).  Uneven
    ``bits_prop`` splits can make the requested size not divide the segment
    (round-1 crash); shrinking the group is the graceful degradation.
    ``w_bit`` here is the storage container width."""
    ppw = 32 // w_bit
    gs = min(requested, seg_k)
    while gs > ppw and (seg_k % gs != 0 or gs % ppw != 0):
        gs -= ppw
    if seg_k % gs != 0 or gs % ppw != 0:
        raise ValueError(
            f"no valid group size ≤ {requested} for segment K={seg_k}, w_bit={w_bit}"
        )
    return gs


def _segment_counts(
    bits: Sequence[int], props: Sequence[float], n_blocks: int, align: int = 1
):
    """Static per-bit block counts from the strategy proportions.

    ``align``: round counts to this multiple (requires ``n_blocks % align
    == 0``).  Kernel-friendliness: aligning each segment's K to ``8 *
    group_size`` keeps its group count 8-divisible, so the fused kernel's
    K-step can always reach an (8-sublane, 128-lane)-aligned block — odd
    group counts (e.g. llama2-7B down-proj K=11008 at 25% → 2752 rows = 43
    g64 groups) would otherwise force those segments onto the XLA fallback.
    """
    counts = []
    used = 0
    for i, (b, p) in enumerate(zip(bits, props)):
        if i < len(bits) - 1:
            c = int(round(p * n_blocks / align)) * align
        else:
            c = n_blocks - used
        c = max(0, min(c, n_blocks - used))
        counts.append(c)
        used += c
    if used < n_blocks:
        counts[-1] += n_blocks - used
    return counts


def quantize_mbwq(
    weight: Array,
    strategy: Dict,
    channel_scale: Optional[Array] = None,
) -> MBWQTensor:
    """fp weight ``(K, N)`` → MBWQTensor per a mixed-bit strategy dict.

    GreenBit's channel-mix idea: input-channel blocks whose weights carry
    more energy get more bits (sensitivity proxy = per-block L2 norm).
    Segment *sizes* are static (derived from ``bits_prop``), only the
    block order is data-dependent — so this is fully jit/trace-safe and
    works inside flax ``init``.
    """
    bits = [int(b) for b in strategy["bits"]]
    props = [float(p) for p in strategy["bits_prop"]]
    gs_map = {int(kk): int(v) for kk, v in strategy.get("group_size", {}).items()}
    # per-bit storage-container override, e.g. {"2": 4}: store 2-bit codes
    # in 4-bit containers.  Quantization VALUES are identical (same maxq);
    # only the stored width changes (average_bits stays 2.x,
    # average_storage_bits reports the real footprint).  NOTE: on v5e this
    # does NOT speed up decode — the w2 path is bound by paired-lane
    # extract ops per CODE (container-independent), so wider containers
    # only add bytes (BENCH_NOTES round 3).  Kept as an experiment knob
    # and for formats that prescribe container widths.
    cont_map = {int(kk): int(v) for kk, v in strategy.get("container_bits", {}).items()}
    # "mid_sym": exl2-style symmetric-midpoint per-segment quantization
    # (zeros ≡ mid·scales ⇒ the quad kernel's signed-code regime)
    mid_sym = bool(strategy.get("mid_sym", False))
    base_gs = min(gs_map.values()) if gs_map else 32

    k, n = weight.shape
    n_blocks = k // base_gs
    w = weight.astype(jnp.float32)
    norms = jnp.sum(w * w, axis=1).reshape(n_blocks, base_gs).sum(axis=1)
    order = jnp.argsort(-norms)  # descending energy, traced is fine

    # segment alignment: counts in multiples of 8*gs/base_gs blocks so every
    # segment's group count stays 8-divisible for the fused kernel (see
    # _segment_counts); halve until it divides the total block count
    align = 1
    for b in bits:
        gs_b = gs_map.get(int(b), base_gs)
        align = max(align, 8 * max(gs_b // base_gs, 1))
    while align > 1 and n_blocks % align != 0:
        align //= 2

    counts = _segment_counts(bits, props, n_blocks, align)
    if any(c == 0 and p > 0 for c, p in zip(counts, props)):
        # tensor too small for aligned splits — keep every requested segment
        # (the kernel falls back to XLA where tiling doesn't fit)
        counts = _segment_counts(bits, props, n_blocks)

    # descending-bit segment order (parity with trans_qweight's
    # rows_8..rows_2 segmentation); counts are static
    by_bits = sorted(zip(bits, counts), reverse=True)
    segments = []
    perm_parts = []
    start = 0
    row_offsets = jnp.arange(base_gs, dtype=jnp.int32)[None, :]
    for b, cnt in by_bits:
        if cnt == 0:
            continue
        blocks = lax.dynamic_slice_in_dim(order, start, cnt)
        rows = (blocks[:, None].astype(jnp.int32) * base_gs + row_offsets).reshape(-1)
        perm_parts.append(rows)
        seg_w = w[rows]
        container = cont_map.get(b, packing.CONTAINER_BITS.get(b))
        if container is None:
            raise ValueError(f"unsupported bits={b}; choose from {sorted(packing.CONTAINER_BITS)}")
        if container < b:
            raise ValueError(f"container_bits[{b}]={container} < code width")
        gs_req = gs_map.get(b, base_gs)
        gs = _fit_group_size(gs_req, cnt * base_gs, container)
        if gs != gs_req:
            # surfaced so quality/perf labels (e.g. the ppl gate's
            # "w2g128") reflect the group size actually run — a silent
            # shrink here skews the attribution (ADVICE r4)
            import warnings

            warnings.warn(
                f"mbwq segment w{b} (K={cnt * base_gs}): requested "
                f"group_size {gs_req} does not divide; fitted to {gs}",
                stacklevel=2,
            )
        segments.append(
            quantize_mpq(
                seg_w,
                w_bit=container,
                group_size=gs,
                asym=False,
                code_bits=None if container == b else b,
                mid_sym=mid_sym,
            )
        )
        start += cnt
    perm = jnp.concatenate(perm_parts)

    return MBWQTensor(
        segments=tuple(segments),
        q_perm=perm,
        channel_scale=channel_scale,
        # by construction the permutation moves whole base_gs-row blocks
        block_perm=(perm[::base_gs] // base_gs).astype(jnp.int32),
        perm_block=base_gs,
    )


@functools.partial(jax.jit, static_argnames=("dtype",))
def dequantize_mbwq(qt: MBWQTensor, dtype=jnp.float32) -> Array:
    """Reconstruct the logical fp weight ``(K, N)``.

    Parity: ``MBWQLinearCuda.exl2fp_weight`` / ``q42fp_weight``
    (``mbwq_layer.py:302-350``) — dequantize segments, scatter rows back via
    ``q_perm``, un-apply channel_scale is NOT done (the reference's
    channel_scale multiplies activations, not the stored weight).
    """
    from .mpq_linear import reconstruct_weight

    parts = [reconstruct_weight(seg, dtype=jnp.float32) for seg in qt.segments]
    stored = jnp.concatenate(parts, axis=0)  # (K, N) in segment order
    if qt.q_perm is not None:
        k = stored.shape[0]
        w = jnp.zeros_like(stored).at[qt.q_perm].set(stored)
    else:
        w = stored
    return w.astype(dtype)


def mbwq_linear(x: Array, qt: MBWQTensor) -> Array:
    """``(x · channel_scale) @ dequant(qt)`` with per-segment fused matmuls."""
    return _mbwq_linear(x, qt)


@jax.custom_vjp
def _mbwq_linear(x, qt):
    return _mbwq_forward(x, qt)


# Dispatch for the single-launch multi-segment kernel (mbwq_matmul.py).
# Measured on v5e (same-process A/B, 4096² + 11008×4096 mbwq-2.5, m=8) the
# per-segment pair-layout calls currently WIN (fused 0.81–0.97×): the fused
# launch's per-step multi-input pipeline bookkeeping outweighs the saved
# output write at these shapes.  The kernel stays available (and tested)
# via this env knob while the pipeline is tuned.
_FUSED_ENV = "BITORCH_MBWQ_FUSED"


def _use_fused_kernel() -> bool:
    import os

    return os.environ.get(_FUSED_ENV, "0") == "1"


def _mbwq_forward(x, qt: MBWQTensor):
    from .mpq_linear import MAX_FUSED_ROWS, _use_pallas, mpq_linear

    if qt.channel_scale is not None:
        x = x * qt.channel_scale.astype(x.dtype)
    if qt.q_perm is not None:
        pb = qt.perm_block
        if pb and x.shape[-1] % pb == 0:
            # block-structured permutation: gather whole pb-row blocks
            # along a non-minor axis (a lane-axis row gather is the worst
            # case for the TPU vector memory)
            nb = x.shape[-1] // pb
            # (nb,) block indices — precomputed at quantize time when
            # available (recomputing per call costs a fusion per step)
            bp = (
                qt.block_perm
                if qt.block_perm is not None
                else qt.q_perm[::pb] // pb
            )
            x3 = x.reshape(x.shape[:-1] + (nb, pb))
            xp = jnp.take(x3, bp, axis=-2).reshape(x.shape)
        else:
            xp = x[..., qt.q_perm]
    else:
        xp = x

    lead = xp.shape[:-1]
    x2d = xp.reshape(-1, xp.shape[-1])
    # decode regime: ONE fused multi-segment kernel launch (parity with the
    # reference's single mixed-bit kernel, mbwq_linear_cuda_kernel.cu:928-1006)
    if (
        _use_fused_kernel()
        and _use_pallas()
        and x2d.shape[0] <= MAX_FUSED_ROWS
        and all(s.g_idx is None and s.q_perm is None for s in qt.segments)
    ):
        from .pallas.mbwq_matmul import mbwq_matmul_pallas

        try:
            out = mbwq_matmul_pallas(x2d, qt)
            return out.reshape(*lead, -1)
        except NotImplementedError:
            pass

    out = None
    off = 0
    for seg in qt.segments:
        k_seg = seg.in_features
        contrib = mpq_linear(xp[..., off : off + k_seg], seg)
        out = contrib if out is None else out + contrib
        off += k_seg
    return out


def _mbwq_fwd(x, qt):
    return _mbwq_forward(x, qt), (x, qt)


def _mbwq_bwd(res, g):
    x, qt = res
    w = dequantize_mbwq(qt, dtype=x.dtype)  # logical (K, N)
    if qt.channel_scale is not None:
        w_eff = w * qt.channel_scale.astype(w.dtype)[:, None]
    else:
        w_eff = w
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = g.shape[-1]
    g2d = g.reshape(-1, n).astype(x.dtype)
    grad_x = jnp.dot(g2d, w_eff.T, preferred_element_type=jnp.float32).astype(x.dtype)

    gw = None
    if qt.grad_shadow is not None:
        x2d = x.reshape(-1, k)
        if qt.channel_scale is not None:
            x2d = x2d * qt.channel_scale.astype(x2d.dtype)
        gw = jnp.dot(x2d.T, g2d, preferred_element_type=jnp.float32)
    grad_qt = qtensor_cotangent(qt, gw)
    return grad_x.reshape(*lead, k), grad_qt


_mbwq_linear.defvjp(_mbwq_fwd, _mbwq_bwd)


def average_bits(qt: MBWQTensor) -> float:
    """Average quantization bits/weight (the '2.x-bit' GreenBit metric).

    Counts true code widths (``MPQTensor.quant_bits``); odd exl2 widths
    stored in byte-aligned containers report their logical width here —
    use :func:`average_storage_bits` for the on-TPU footprint."""
    total = qt.in_features
    return sum(seg.quant_bits * seg.in_features for seg in qt.segments) / total


def average_storage_bits(qt: MBWQTensor) -> float:
    """Average *stored* bits/weight (container widths, i.e. HBM bytes)."""
    total = qt.in_features
    return sum(seg.w_bit * seg.in_features for seg in qt.segments) / total
