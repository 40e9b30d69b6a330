"""Quantized-tensor pytrees: the core data model of the engine.

The reference (bitorch-engine) relies on a custom PyTorch fork that allows
``requires_grad=True`` on integer tensors, and attaches quantization metadata
to ``nn.Parameter`` subclasses (see reference ``layers/qlinear/nbit/layer.py:8-119``
``MPQWeightParameter`` and ``layers/qlinear/binary/layer.py:7-60``).  On TPU/JAX
none of that machinery is needed: a quantized weight is a *pytree dataclass*
whose integer payloads flow through ``jit``/``pjit``/``shard_map`` like any
array, and whose gradient story is explicit:

* every trainable QTensor carries an optional ``grad_shadow`` field — a
  floating-point array with the *logical* (unpacked) weight shape.  The
  ``custom_vjp`` of each quantized op writes the full-rank fp cotangent into
  that slot (the TPU-native equivalent of the reference's ``privileged_grad``
  trick, ``nbit/cuda/mpq_layer.py:116``).  The DiodeMix optimizer reads it,
  updates the quantized payload directly, and the shadow itself is never
  materialized at inference time (it is ``None`` there, i.e. an empty subtree).

Static configuration (bit width, group size, symmetry flag, ...) lives in
non-pytree fields so that ``jit`` specializes on it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


class QTensorBase:
    """Marker base class for quantized-weight pytrees.

    The optimizer (``optim/diode.py``) dispatches its update regime on the
    concrete subclass, mirroring the reference's isinstance dispatch in
    ``optim/diode_beta.py:154-159``.
    """

    @property
    def logical_shape(self) -> Tuple[int, ...]:  # pragma: no cover - abstract
        raise NotImplementedError


def _is_qtensor(x) -> bool:
    return isinstance(x, QTensorBase)


def qtensor_leaves(tree):
    """Iterate over QTensor nodes of a pytree (treating them as leaves)."""
    return [
        leaf
        for leaf in jax.tree_util.tree_leaves(tree, is_leaf=_is_qtensor)
        if _is_qtensor(leaf)
    ]


def tree_map_qtensor(fn, tree, *rest):
    """``tree_map`` that stops descending at QTensor nodes."""
    return jax.tree_util.tree_map(fn, tree, *rest, is_leaf=_is_qtensor)


@struct.dataclass
class BinaryQTensor(QTensorBase):
    """1-bit weight.

    Two representations (mirroring reference ``binary/layer.py`` lifecycle):

    * QAT ("unpacked"): ``data`` is int8 with values in [-127, 127]
      (sign is what matters; magnitude feeds the optimizer's EMA state),
      shape ``(out_features, in_features)``; produced by
      :func:`bitorch_engine_tpu.ops.quant.init_binary_weight` (reference
      ``utils/model_helper.py:286-327``).
    * Inference ("packed"): ``data`` is uint32 with sign bits packed along the
      input-feature axis, shape ``(out_features, in_features // 32)``.

    ``scale_w`` is the layer-wise L1-norm scale (reference
    ``model_helper.py:312``).
    """

    data: Array
    scale_w: Array
    grad_shadow: Optional[Array] = None
    packed: bool = struct.field(pytree_node=False, default=False)
    # Logical in_features (needed when packed and in_features % 32 != 0).
    in_features: int = struct.field(pytree_node=False, default=-1)

    @property
    def out_features(self) -> int:
        return self.data.shape[0]

    @property
    def logical_shape(self) -> Tuple[int, ...]:
        k = self.in_features
        if k < 0:
            k = self.data.shape[1] * (32 if self.packed else 1)
        return (self.data.shape[0], k)


@struct.dataclass
class IntQTensor(QTensorBase):
    """n-bit (4/8) QAT weight held as int8 values + a per-tensor scale.

    Mirrors the reference's ``nBitLinearParameter`` regime
    (``nbit/layer.py:122-174``): the weight lives as int8 in
    ``[-2^{b-1}+1, 2^{b-1}-1]`` (narrow range, nv_tensor_quant), gradients
    arrive as fp via ``grad_shadow`` and the optimizer runs AdamW on the
    dequantized weight then requantizes.
    """

    data: Array  # int8 (out_features, in_features)
    scale_w: Array  # scalar amax-derived scale (divide data by it... see quant.py)
    w_bit: int = struct.field(pytree_node=False, default=4)
    grad_shadow: Optional[Array] = None

    @property
    def logical_shape(self) -> Tuple[int, ...]:
        return self.data.shape


@struct.dataclass
class MPQTensor(QTensorBase):
    """Mixed-precision-quantized (weight-only, GPTQ/GBA-style) packed weight.

    Layout parity with reference ``MPQLinearBase.initialize``
    (``nbit/layer.py:365-455``):

    * ``packed``: int32, shape ``(K // 32 * w_bit, N)`` — each int32 holds
      ``32 // w_bit`` consecutive logical K-rows, value ``j`` at bit offset
      ``j * w_bit`` (LSB first).
    * ``scales``: fp, shape ``(G, N)`` with ``G = ceil(K / group_size)``.
    * ``zeros``: asym → *packed* int32 ``(G, N // 32 * w_bit)`` holding
      ``zero - 1`` per GPTQ convention (``quant_operators.py:348-368``);
      sym (GBA) → fp ``(G, N)`` subtractive zeros.
    * ``g_idx``: optional int32 ``(K,)`` row→group map (act-order GPTQ).
    * ``q_perm``: optional int32 ``(K,)`` input-channel permutation applied
      at dequant-time via scatter (``quant_operators.py:340-341``); the fast
      kernel path instead permutes activations.

    ``w_bit`` ∈ {1, 2, 4, 8} (``mpq_layer.py:160``) is the *container* width
    the codes are packed at; activations stay 16-bit.  Odd exl2 widths
    (3/5/6-bit, reference ``exl2/quant/qdq_{3,5,6}.cuh``) are carried in the
    next byte-aligned container (3→4, 5/6→8) with ``code_bits`` recording
    the true quantization width — the reference re-layouts these at load
    time too (``shuffle_kernel`` / ``trans_qweight``); on TPU the
    byte-aligned container is what keeps the unpack on the fast paths.
    """

    packed: Array
    scales: Array
    zeros: Array
    g_idx: Optional[Array] = None
    q_perm: Optional[Array] = None
    w_bit: int = struct.field(pytree_node=False, default=4)
    group_size: int = struct.field(pytree_node=False, default=128)
    asym: bool = struct.field(pytree_node=False, default=False)
    grad_shadow: Optional[Array] = None
    # true quantization width when it differs from the storage container
    # (e.g. 3-bit exl2 codes in a 4-bit container); None ⇒ == w_bit
    code_bits: Optional[int] = struct.field(pytree_node=False, default=None)
    # Packed-row ordering: "gptq" = value j of word r is logical row
    # r*ppw + j (checkpoint-compatible); "tpu_tiled" = within each quant
    # group, value j of word r is row j*(gs/ppw) + r, so the Pallas kernel's
    # shift-and-concat unpack yields rows in order with zero relayout;
    # "tpu_pair" (1/2/4-bit) = codes split across the two 16-bit halves of
    # each word so the kernel extracts two codes per shift+mask+or directly
    # into bf16 magic-exponent form (see ops/pallas/dequant_matmul.py);
    # "tpu_quad" (1/2/4-bit, A8 regime) = codes split across the four int8
    # byte slots of each word so the kernel extracts FOUR codes per
    # shift+mask and feeds the int8 MXU — half the VPU extract ops per
    # code of tpu_pair (the w2 decode bottleneck, BENCH_NOTES round 3).
    layout: str = struct.field(pytree_node=False, default="gptq")
    # Decode-regime activation width: 16 = bf16 activations (reference
    # parity, a_bit=16 fixed per mpq_layer.py:160-161); 8 = dynamic
    # per-token int8 activation quantization feeding the int8 MXU (beyond
    # reference — quality-gated by tools/ppl_gate.py).  Prefill/training
    # regimes always use fp activations regardless.
    act_bits: int = struct.field(pytree_node=False, default=16)
    # True ⇔ the subtractive zeros are EXACTLY mid·scales with
    # mid = 2**(quant_bits-1) (exl2 symmetric-midpoint form, qdq_2.cuh:
    # zeros ≡ 2^{b-1}; also quantize_mpq(mid_sym=True)).  The quad kernel
    # then runs SIGNED codes (q − mid) on the int8 MXU and the whole
    # zeros-correction — per-group activation sums + the zeros dot —
    # vanishes algebraically (measured ~185 µs/step of XLA reduces on the
    # uniform-w2 8B serving step, round-5 trace).  Set by relayout_tpu
    # after a concrete zeros == mid·scales check, or by the quantizer.
    zeros_mid: bool = struct.field(pytree_node=False, default=False)

    @property
    def in_features(self) -> int:
        return self.packed.shape[0] * 32 // self.w_bit

    @property
    def out_features(self) -> int:
        return self.packed.shape[1]

    @property
    def quant_bits(self) -> int:
        """True quantization width (≤ the storage container ``w_bit``)."""
        return self.code_bits if self.code_bits is not None else self.w_bit

    @property
    def num_groups(self) -> int:
        return self.scales.shape[0]

    @property
    def logical_shape(self) -> Tuple[int, ...]:
        # Logical (K, N): matmul is x @ W with x (..., K).
        return (self.in_features, self.out_features)


@struct.dataclass
class MBWQTensor(QTensorBase):
    """Mixed-bit-width (GreenBit channel-mix / exl2-style) packed weight.

    TPU-native re-design of the reference's MBWQ layout
    (``nbit/cuda/mbwq_layer.py:166-181`` + ``mbwq_linear_cuda_kernel.cu:536-628``):
    rows of the weight matrix are quantized at different bit widths
    (8/6/5/4/3/2).  At load time rows are re-sorted into contiguous
    *per-bit-width segments* (descending bit width), exactly like the
    reference's ``mbwq_trans_qweight`` shuffle, so each segment is a uniform
    MPQ problem that tiles cleanly.  ``segments`` holds one MPQTensor-like
    record per bit width present.

    ``q_perm`` maps logical input channels to segment-sorted positions; the
    forward pass gathers activations (cheap) instead of scattering weights.
    ``channel_scale`` is the per-input-channel pre-scale applied to ``x``
    (``mbwq_layer.py:180-181, 362``).
    """

    segments: Tuple[MPQTensor, ...]
    q_perm: Optional[Array] = None
    channel_scale: Optional[Array] = None
    grad_shadow: Optional[Array] = None
    # Precomputed block indices for the block-structured gather:
    # ``q_perm[::perm_block] // perm_block``, stored at quantize time.
    # Deriving them inside the decode step costs a small fusion per
    # projection per step (~150 µs/step across llama2-7B's 128 projections,
    # round-4 device trace).
    block_perm: Optional[Array] = None
    # When > 0, ``q_perm`` is guaranteed to move whole contiguous blocks of
    # this many rows (true for our channel-mix quantizer, which permutes
    # quantization blocks; detected at ingest for external checkpoints).
    # The forward then gathers (K/perm_block)-many blocks along a non-minor
    # axis instead of K single rows along the lane axis — the lane gather
    # costs ~8.5 µs per projection per step on v5e (device trace,
    # BENCH_NOTES round 2).  0 = arbitrary row permutation (exl2 act-order).
    perm_block: int = struct.field(pytree_node=False, default=0)

    @property
    def in_features(self) -> int:
        return sum(seg.in_features for seg in self.segments)

    @property
    def out_features(self) -> int:
        return self.segments[0].out_features

    @property
    def logical_shape(self) -> Tuple[int, ...]:
        return (self.in_features, self.out_features)

    @property
    def bit_widths(self) -> Tuple[int, ...]:
        """Logical quantization widths per segment (odd exl2 widths report
        their true width, not the byte-aligned storage container)."""
        return tuple(seg.quant_bits for seg in self.segments)


@struct.dataclass
class BinaryEmbeddingQTensor(QTensorBase):
    """Bit-packed binary embedding table.

    Reference ``qembedding/binary/layer.py:104-148``: uint32-packed sign bits
    ``(vocab, dim // 32)`` + per-row fp scale ``(vocab, 1)``.  Sparse updates
    are handled functionally by the optimizer (the reference's
    ``active_indices`` XOR update, ``model_helper.py:404-434``) using the
    one-hot count of rows touched in the last batch, carried in
    ``grad_shadow`` (dense fp cotangent of the full table; rows not touched
    have zero gradient, which the optimizer detects).
    """

    data: Array  # uint32 (vocab, dim // 32)
    scale: Array  # fp (vocab, 1)
    grad_shadow: Optional[Array] = None
    dim: int = struct.field(pytree_node=False, default=-1)

    @property
    def vocab_size(self) -> int:
        return self.data.shape[0]

    @property
    def logical_shape(self) -> Tuple[int, ...]:
        d = self.dim if self.dim > 0 else self.data.shape[1] * 32
        return (self.data.shape[0], d)


def qtensor_cotangent(qt: QTensorBase, grad_shadow=None) -> QTensorBase:
    """Build the cotangent pytree for a QTensor primal.

    Float leaves get symbolic zeros, integer leaves get float0 (JAX's
    zero-size tangent dtype for non-differentiable values), and the fp weight
    gradient — if any — rides in ``grad_shadow``.  Every quantized op's
    ``custom_vjp`` bwd uses this.
    """
    import numpy as np

    def ct(leaf):
        if leaf is None:
            return None
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        return np.zeros(leaf.shape, dtype=jax.dtypes.float0)

    base = jax.tree_util.tree_map(ct, qt)
    if grad_shadow is not None and qt.grad_shadow is not None:
        base = base.replace(grad_shadow=grad_shadow.astype(qt.grad_shadow.dtype))
    return base


def with_grad_shadow(qt: QTensorBase) -> QTensorBase:
    """Attach a zero fp32 grad-shadow of the logical weight shape (training mode)."""
    shape = qt.logical_shape
    return qt.replace(grad_shadow=jnp.zeros(shape, dtype=jnp.float32))


def without_grad_shadow(qt: QTensorBase) -> QTensorBase:
    """Drop the grad shadow (inference mode — no memory overhead)."""
    return qt.replace(grad_shadow=None)
