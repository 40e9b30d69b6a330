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
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..qtensor import MBWQTensor, MPQTensor
from . import packing
from .quant import dequantize_mpq, quantize_mpq

Array = jax.Array


def assign_bits_by_sensitivity(
    weight: Array, bits: Sequence[int], bits_prop: Sequence[float], group_size: int
) -> np.ndarray:
    """Assign a bit width to each K-row group by output-error sensitivity.

    GreenBit's channel-mix idea: rows (input channels) whose weights carry
    more energy get more bits.  Sensitivity proxy = per-row L2 norm.  Rows
    are ranked and the top ``bits_prop[0]`` fraction gets ``bits[0]``, etc.
    Assignment is done in blocks of ``group_size`` rows so quant groups stay
    uniform-bit.
    """
    k = weight.shape[0]
    n_blocks = k // group_size
    norms = np.asarray(
        jnp.sum(weight.astype(jnp.float32) ** 2, axis=1)
        .reshape(n_blocks, group_size)
        .sum(axis=1)
    )
    order = np.argsort(-norms)  # descending energy
    out = np.zeros(n_blocks, dtype=np.int32)
    start = 0
    for b, prop in zip(bits, bits_prop):
        cnt = int(round(prop * n_blocks))
        out[order[start : start + cnt]] = b
        start += cnt
    out[order[start:]] = bits[-1]
    return out


def quantize_mbwq(
    weight: Array,
    strategy: Dict,
    channel_scale: Optional[Array] = None,
) -> MBWQTensor:
    """fp weight ``(K, N)`` → MBWQTensor per a mixed-bit strategy dict."""
    bits = [int(b) for b in strategy["bits"]]
    props = [float(p) for p in strategy["bits_prop"]]
    gs_map = {int(kk): int(v) for kk, v in strategy.get("group_size", {}).items()}
    base_gs = min(gs_map.values()) if gs_map else 32

    k, n = weight.shape
    block_bits = assign_bits_by_sensitivity(weight, bits, props, base_gs)

    # build q_perm: rows sorted into descending-bit contiguous segments
    # (parity with trans_qweight's rows_8..rows_2 segmentation)
    seg_rows = []
    perm_parts = []
    for b in sorted(set(bits), reverse=True):
        blocks = np.nonzero(block_bits == b)[0]
        rows = (blocks[:, None] * base_gs + np.arange(base_gs)[None]).reshape(-1)
        if rows.size:
            perm_parts.append(rows)
            seg_rows.append((b, rows.size))
    perm = np.concatenate(perm_parts).astype(np.int32)

    w_np = np.asarray(weight, np.float32)
    segments = []
    off = 0
    for b, nrows in seg_rows:
        seg_w = w_np[perm[off : off + nrows]]
        gs = gs_map.get(b, base_gs)
        gs = min(gs, nrows)
        segments.append(
            quantize_mpq(jnp.asarray(seg_w), w_bit=b, group_size=gs, asym=False)
        )
        off += nrows

    return MBWQTensor(
        segments=tuple(segments),
        q_perm=jnp.asarray(perm),
        channel_scale=channel_scale,
    )


@functools.partial(jax.jit, static_argnames=("dtype",))
def dequantize_mbwq(qt: MBWQTensor, dtype=jnp.float32) -> Array:
    """Reconstruct the logical fp weight ``(K, N)``.

    Parity: ``MBWQLinearCuda.exl2fp_weight`` / ``q42fp_weight``
    (``mbwq_layer.py:302-350``) — dequantize segments, scatter rows back via
    ``q_perm``, un-apply channel_scale is NOT done (the reference's
    channel_scale multiplies activations, not the stored weight).
    """
    parts = [dequantize_mpq(seg, dtype=jnp.float32) for seg in qt.segments]
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


def _mbwq_forward(x, qt: MBWQTensor):
    from .mpq_linear import mpq_linear

    if qt.channel_scale is not None:
        x = x * qt.channel_scale.astype(x.dtype)
    if qt.q_perm is not None:
        xp = x[..., qt.q_perm]
    else:
        xp = x
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

    def ct(leaf):
        if leaf is None:
            return None
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        return np.zeros(leaf.shape, dtype=jax.dtypes.float0)

    grad_qt = jax.tree_util.tree_map(ct, qt)
    if qt.grad_shadow is not None:
        x2d = x.reshape(-1, k)
        if qt.channel_scale is not None:
            x2d = x2d * qt.channel_scale.astype(x2d.dtype)
        gw = jnp.dot(x2d.T, g2d, preferred_element_type=jnp.float32)
        grad_qt = grad_qt.replace(grad_shadow=gw.astype(qt.grad_shadow.dtype))
    return grad_x.reshape(*lead, k), grad_qt


_mbwq_linear.defvjp(_mbwq_fwd, _mbwq_bwd)


def average_bits(qt: MBWQTensor) -> float:
    """Average bits/weight across segments (the '2.x-bit' GreenBit metric)."""
    total = qt.in_features
    return sum(seg.w_bit * seg.in_features for seg in qt.segments) / total
