"""Checkpoint ingestion: external quantized checkpoints → QTensor pytrees.

Covers the reference's checkpoint-consumption surface:

* **GPTQ / AutoGPTQ-style** per-layer tensors ``qweight`` int32
  ``(K/32*b, N)``, ``qzeros`` int32 ``(G, N/32*b)``, ``scales`` fp ``(G, N)``,
  optional ``g_idx`` — the format ``MPQLinearBase.init_gptq`` declares
  (``nbit/layer.py:397-408``).
* **GBA double-quantized** tensors: ``qweight`` + ``qstatistic`` uint8 /
  ``qscales`` + ``(qscales|qzeros)_(zeros|scales)`` — decompressed exactly
  like ``MPQLinearCuda.prepare_params`` (``mpq_layer.py:163-204``).
* **exl2-style mixed-bit** tensors: ``q_weight``, ``q_scale``, ``q_groups``,
  ``q_invperm`` — re-laid out into per-bit-width MBWQ segments like
  ``mbwq_trans_qweight`` (``mbwq_linear_cuda_kernel.cu:536-628``).

Tensors arrive as numpy arrays (from ``safetensors.numpy`` or a torch
``state_dict``); outputs are engine QTensors.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..qtensor import MBWQTensor, MPQTensor
from ..ops import packing
from ..ops.quant import decompress_gba_asym, decompress_gba_sym

Array = jnp.ndarray


def mpq_from_gptq(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: Optional[np.ndarray] = None,
    w_bit: Optional[int] = None,
    group_size: Optional[int] = None,
) -> MPQTensor:
    """Classical GPTQ tensors → asym MPQTensor (bit-exact format parity)."""
    n = qweight.shape[1]
    g = scales.shape[0]
    if w_bit is None:
        w_bit = 32 * qzeros.shape[1] // n
    k = qweight.shape[0] * 32 // w_bit
    if group_size is None:
        group_size = k // g
    gi = None
    if g_idx is not None:
        seq = np.arange(k, dtype=np.int64) // group_size
        if not np.array_equal(np.asarray(g_idx, np.int64), seq):
            gi = jnp.asarray(np.asarray(g_idx, np.int32))
    return MPQTensor(
        packed=jnp.asarray(np.asarray(qweight, np.int32)),
        scales=jnp.asarray(np.asarray(scales, np.float32)),
        zeros=jnp.asarray(np.asarray(qzeros, np.int32)),
        g_idx=gi,
        w_bit=w_bit,
        group_size=group_size,
        asym=True,
    )


def mpq_from_gba(
    qweight: np.ndarray,
    tensors: Dict[str, np.ndarray],
    w_bit: int,
    group_size: int,
    asym: bool = False,
    dq_mode: int = 2,
) -> MPQTensor:
    """GBA double-quantized tensors → MPQTensor, decompressing scales/zeros.

    ``tensors`` holds the layer's buffers by name (``qstatistic``,
    ``qscales``, ``qzeros``, ``qscales_zeros``, ``qscales_scales``,
    ``qzeros_zeros``, ``qzeros_scales``, optionally precomputed ``scales`` /
    ``zeros`` for group_size ≥ 256 where no double quantization is applied,
    ``mpq_layer.py:173``).
    """
    n = qweight.shape[1]
    k = qweight.shape[0] * 32 // w_bit

    if "scales" in tensors and "zeros" in tensors:
        scales = jnp.asarray(np.asarray(tensors["scales"], np.float32))
        zeros = jnp.asarray(np.asarray(tensors["zeros"], np.float32))
    elif asym:
        scales = decompress_gba_asym(
            jnp.asarray(tensors["qscales"]),
            jnp.asarray(tensors["qscales_zeros"]),
            jnp.asarray(tensors["qscales_scales"]),
            out_channels=n,
            w_bit=w_bit,
        )
        # asym keeps packed int zeros (mpq_layer.py:177)
        return MPQTensor(
            packed=jnp.asarray(np.asarray(qweight, np.int32)),
            scales=scales,
            zeros=jnp.asarray(np.asarray(tensors["qzeros"], np.int32)),
            w_bit=w_bit,
            group_size=group_size,
            asym=True,
        )
    else:
        scales, zeros = decompress_gba_sym(
            jnp.asarray(tensors["qstatistic"]),
            jnp.asarray(tensors["qzeros_zeros"]),
            jnp.asarray(tensors["qzeros_scales"]),
            jnp.asarray(tensors["qscales_zeros"]),
            jnp.asarray(tensors["qscales_scales"]),
            out_channels=n,
        )
    return MPQTensor(
        packed=jnp.asarray(np.asarray(qweight, np.int32)),
        scales=scales,
        zeros=zeros,
        w_bit=w_bit,
        group_size=group_size,
        asym=False,
    )


def mbwq_from_exl2(
    q_weight: np.ndarray,
    q_scale: np.ndarray,
    q_scale_max: np.ndarray,
    q_groups: np.ndarray,
    q_invperm: Optional[np.ndarray] = None,
    channel_scale: Optional[np.ndarray] = None,
) -> MBWQTensor:
    """exllamav2 checkpoint tensors → MBWQTensor.

    exl2 stores per-group 4-bit-quantized scales (``q_scale`` packed 8/int32,
    ``q_scale_max`` per-row max) and a ``q_groups`` [bits, start_qrow] pair
    list (``make_group_map``'s input, reference ``nbit/cuda/utils.py:150-187``).
    Rows are already stored permuted; ``q_invperm`` maps stored→logical.
    """
    n = q_weight.shape[1]
    qg = np.asarray(q_groups, np.int64).reshape(-1, 2)
    num_qrows = q_weight.shape[0]

    # decode per-group scales: exl2 packs 8 4-bit scale codes per int32;
    # scale = (code+1)² · q_scale_max / 256 (exllamav2 stores sqrt-compressed
    # scale codes; unpack_cols already re-applies the +1)
    sc_codes = np.asarray(
        packing.unpack_cols(jnp.asarray(np.asarray(q_scale, np.int32)), 4)
    ).astype(np.float32)
    sc_codes = sc_codes * sc_codes
    q_scale_max = np.asarray(q_scale_max, np.float32).reshape(-1) / 256.0

    segments = []
    starts = list(qg[:, 1]) + [num_qrows]
    group_rows = []  # logical row count per group
    for i in range(len(qg)):
        bits = int(qg[i, 0])
        qrows = int(starts[i + 1] - starts[i])
        group_rows.append((bits, qrows * 32 // bits, int(starts[i])))

    # build contiguous per-bit segments (exl2 groups are already sorted by
    # descending bits after trans_qweight; enforce/merge here)
    from collections import OrderedDict

    by_bits = OrderedDict()
    row_cursor = 0
    scale_row = 0
    seg_meta = []
    for bits, rows, qstart in group_rows:
        gsize = rows  # one exl2 group
        sc = sc_codes[scale_row] * q_scale_max[scale_row]
        seg_meta.append((bits, rows, qstart, sc))
        scale_row += 1
    segs = []
    i = 0
    while i < len(seg_meta):
        bits = seg_meta[i][0]
        rows = 0
        qrows = 0
        scales_rows = []
        qstart = seg_meta[i][2]
        while i < len(seg_meta) and seg_meta[i][0] == bits:
            rows += seg_meta[i][1]
            scales_rows.append((seg_meta[i][3], seg_meta[i][1]))
            i += 1
        qend = seg_meta[i][2] if i < len(seg_meta) else num_qrows
        packed_seg = np.asarray(q_weight[qstart:qend], np.int32)
        # per-group scales matrix for this segment
        gs = scales_rows[0][1]
        scales = np.stack([s for s, _ in scales_rows]).astype(np.float32)
        zeros = (2 ** (bits - 1)) * scales  # exl2 symmetric midpoint
        segs.append(
            MPQTensor(
                packed=jnp.asarray(packed_seg),
                scales=jnp.asarray(scales),
                zeros=jnp.asarray(zeros),
                w_bit=bits,
                group_size=gs,
                asym=False,
            )
        )

    q_perm = None
    if q_invperm is not None:
        # q_invperm[stored] = logical; our q_perm maps stored→logical too
        q_perm = jnp.asarray(np.asarray(q_invperm, np.int32))
    cs = None if channel_scale is None else jnp.asarray(np.asarray(channel_scale, np.float32))
    return MBWQTensor(segments=tuple(segs), q_perm=q_perm, channel_scale=cs)


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors file into numpy arrays (no torch dependency)."""
    from safetensors import numpy as st_np

    return dict(st_np.load_file(path))
