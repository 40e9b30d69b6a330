"""Flash attention (fwd + custom_vjp bwd) Pallas kernels, GQA-native.

Greenfield vs the reference: its only attention is BMHA's vanilla O(L²)
softmax (``qmha/binary/layer.py:134-143``) and it scales sequence length
only by switching GEMV→GEMM (SURVEY.md §5 long-context row).  Round 2
papered over long-sequence *training* with block remat over an O(s²)
einsum backward; this module removes the s² score tensors from both
passes — the standard TPU design:

* **forward**: streaming-softmax tiles — running max ``m``, running sum
  ``l``, f32 accumulator; saves only ``out`` and the logsumexp rows as
  residuals (O(s) extra memory instead of O(s²)).
* **backward**: two kernels.  ``dq`` re-forms each probability tile from
  the saved logsumexp (``p = exp(qkᵀ·scale − lse)``) and accumulates
  ``dq += (p ∘ (do·vᵀ − Δ))·scale @ k`` over K tiles; ``dkv`` walks Q
  tiles per KV tile and accumulates ``dv += pᵀ @ do`` and
  ``dk += dsᵀ @ q``.  ``Δ = Σ_d do∘out`` is one fused XLA pass.
* **GQA-native**: K/V are consumed at their true ``num_kv_heads`` width —
  the index maps point ``rep`` query heads at the same KV block, so the
  repeated-KV tensor the stock JAX kernel needs (``jnp.repeat`` → rep×
  HBM) never exists.  The ``dkv`` grid likewise accumulates the rep query
  heads' contributions straight into the (b·nkv) gradient blocks.
* head_dim < 128 is handled by zero-padding d to one lane tile in the
  public wrapper (zeros add nothing to qkᵀ; padded v columns produce
  zero output columns which are sliced off) — AD sees pad/slice, so the
  custom_vjp inside stays exact.

Causality skips strictly-upper tiles twice over: ``pl.when`` gates the
compute, and the K/V (resp. q/do/stat in ``dkv``) index maps CLAMP masked
grid steps to the last visible tile — consecutive equal block indices make
the Pallas pipeline skip the copy, so upper-triangle bytes never stream
(~2× less K/V traffic at long s; ``BITORCH_FLASH_CAUSAL_CLAMP=0`` restores
compute-skip-only for A/B).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = float(-jnp.inf)
_LANES = 128


def _causal_clamp() -> bool:
    """Skip upper-triangle K/V DMAs via index-map clamping (default on;
    BITORCH_FLASH_CAUSAL_CLAMP=0 restores compute-skip-only grids for
    A/B)."""
    import os

    return os.environ.get("BITORCH_FLASH_CAUSAL_CLAMP", "1") != "0"


def _pick_block(s: int, preferred: int = 512) -> int:
    for cand in (preferred, 256, 128):
        if cand <= preferred and s % cand == 0:
            return cand
    raise NotImplementedError(f"sequence {s} not a multiple of 128")


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, sm_scale: float, bq: int, bk: int, nk: int, causal: bool,
):
    j = pl.program_id(1)
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    visible = (kk * bk <= j * bq + bq - 1) if causal else (kk >= 0)

    @pl.when(visible)
    def _step():
        q = q_ref[0]  # (bq, d)
        k = k_ref[0]  # (bk, d)
        s = (
            lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
        )
        if causal:
            row = j * bq + lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            col = kk * bk + lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(col <= row, s, _NEG_INF)
        m_prev = m_ref[:, :1]  # (bq, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)  # (bq, 1); exp(-inf - finite) = 0
        p = jnp.exp(s - m_new)  # (bq, bk); masked cols → exp(-inf) = 0
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    last = jnp.minimum(j * bq // bk + (bq - 1) // bk, nk - 1) if causal else nk - 1

    @pl.when(kk == last)
    def _store():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)
        # row stats lane-broadcast to 128 (sublane-major reads in the bwd
        # kernels; the same residual layout the stock JAX kernel uses)
        lse_ref[0] = m_ref[:] + jnp.log(l_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "bq", "bk", "interpret"),
)
def _fwd_call(q, k, v, *, causal, sm_scale, bq, bk, interpret):
    bnh, s, d = q.shape
    bnkv = k.shape[0]
    rep = bnh // bnkv  # query heads per KV head, batch folded in by caller
    nq, nk = s // bq, s // bk

    def q_map(i, j, kk):
        return (i, j, 0)

    clamp = causal and _causal_clamp()

    def kv_map(i, j, kk):
        if clamp:
            # clamp masked (strictly-upper) steps to the last visible KV
            # tile: consecutive grid steps with equal block indices skip
            # the DMA, so upper-triangle K/V bytes never stream (the
            # round-3 kernel only skipped the COMPUTE via pl.when) —
            # ~2× less KV traffic at long s.  bq == bk ⇒ last tile = j.
            return (i // rep, jnp.minimum(kk, j), 0)
        return (i // rep, kk, 0)

    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, bq=bq, bk=bk, nk=nk, causal=causal
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(bnh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), q_map),
            pl.BlockSpec((1, bk, d), kv_map),
            pl.BlockSpec((1, bk, d), kv_map),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), q_map),
            pl.BlockSpec((1, bq, _LANES), lambda i, j, kk: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bnh, s, d), q.dtype),
            jax.ShapeDtypeStruct((bnh, s, _LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# Backward: dq
# ---------------------------------------------------------------------------


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_ref,
    *, sm_scale: float, bq: int, bk: int, nk: int, causal: bool,
):
    j = pl.program_id(1)
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    visible = (kk * bk <= j * bq + bq - 1) if causal else (kk >= 0)

    @pl.when(visible)
    def _step():
        q = q_ref[0]
        k = k_ref[0]
        s = (
            lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
        )
        if causal:
            row = j * bq + lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            col = kk * bk + lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(col <= row, s, _NEG_INF)
        p = jnp.exp(s - lse_ref[0][:, :1])  # (bq, bk)
        dp = lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0][:, :1]) * sm_scale
        acc_ref[:] = acc_ref[:] + lax.dot_general(
            ds.astype(k_ref.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    last = jnp.minimum(j * bq // bk + (bq - 1) // bk, nk - 1) if causal else nk - 1

    @pl.when(kk == last)
    def _store():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# Backward: dk / dv (accumulates the rep query heads of each KV head)
# ---------------------------------------------------------------------------


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, sm_scale: float, bq: int, bk: int, nq: int, rep: int, causal: bool,
):
    kk = pl.program_id(1)
    t = pl.program_id(2)  # enumerates (query-head-in-group, q block)
    jq = t % nq

    @pl.when(t == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    visible = (jq * bq + bq - 1 >= kk * bk) if causal else (jq >= 0)

    @pl.when(visible)
    def _step():
        q = q_ref[0]  # (bq, d)
        k = k_ref[0]  # (bk, d)
        s = (
            lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
        )
        if causal:
            row = jq * bq + lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            col = kk * bk + lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(col <= row, s, _NEG_INF)
        p = jnp.exp(s - lse_ref[0][:, :1])  # (bq, bk)
        do = do_ref[0]  # (bq, d)
        dv_acc[:] = dv_acc[:] + lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = lax.dot_general(
            do, v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0][:, :1]) * sm_scale
        dk_acc[:] = dk_acc[:] + lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(t == rep * nq - 1)
    def _store():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "bq", "bk", "interpret"),
)
def _bwd_call(q, k, v, out, lse, do, *, causal, sm_scale, bq, bk, interpret):
    bnh, s, d = q.shape
    bnkv = k.shape[0]
    rep = bnh // bnkv
    nq, nk = s // bq, s // bk

    # Δ = Σ_d do∘out, lane-broadcast to the stats layout (one fused pass)
    delta = jnp.broadcast_to(
        jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)[
            ..., None
        ],
        (bnh, s, _LANES),
    )

    def q_map(i, j, kk):
        return (i, j, 0)

    clamp = causal and _causal_clamp()

    def kv_map(i, j, kk):
        if clamp:
            # same masked-step clamp as the forward (skips upper-triangle
            # K/V DMAs; see _fwd_call.kv_map)
            return (i // rep, jnp.minimum(kk, j), 0)
        return (i // rep, kk, 0)

    def stat_map(i, j, kk):
        return (i, j, 0)

    dq_kernel = functools.partial(
        _dq_kernel, sm_scale=sm_scale, bq=bq, bk=bk, nk=nk, causal=causal
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bnh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), q_map),
            pl.BlockSpec((1, bk, d), kv_map),
            pl.BlockSpec((1, bk, d), kv_map),
            pl.BlockSpec((1, bq, d), q_map),
            pl.BlockSpec((1, bq, _LANES), stat_map),
            pl.BlockSpec((1, bq, _LANES), stat_map),
        ],
        out_specs=pl.BlockSpec((1, bq, d), q_map),
        out_shape=jax.ShapeDtypeStruct((bnh, s, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    # dkv grid: (b·nkv, K tiles, rep·nq) — the innermost axis walks every
    # (query head of the group, Q tile) pair so dk/dv accumulate the full
    # GQA group without a repeated-KV gradient scatter afterwards.
    def kv_self_map(i, kk, t):
        return (i, kk, 0)

    def _jq(kk, t):
        # masked steps (jq < kk never contribute under causality) clamp to
        # the first visible Q tile of this KV tile: equal consecutive block
        # indices skip the q/do/stat DMAs for the skipped lower-t steps
        return jnp.maximum(t % nq, kk) if clamp else t % nq

    def q_group_map(i, kk, t):
        return (i * rep + t // nq, _jq(kk, t), 0)

    def stat_group_map(i, kk, t):
        return (i * rep + t // nq, _jq(kk, t), 0)

    dkv_kernel = functools.partial(
        _dkv_kernel, sm_scale=sm_scale, bq=bq, bk=bk, nq=nq, rep=rep,
        causal=causal,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bnkv, nk, rep * nq),
        in_specs=[
            pl.BlockSpec((1, bq, d), q_group_map),
            pl.BlockSpec((1, bk, d), kv_self_map),
            pl.BlockSpec((1, bk, d), kv_self_map),
            pl.BlockSpec((1, bq, d), q_group_map),
            pl.BlockSpec((1, bq, _LANES), stat_group_map),
            pl.BlockSpec((1, bq, _LANES), stat_group_map),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), kv_self_map),
            pl.BlockSpec((1, bk, d), kv_self_map),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bnkv, s, d), k.dtype),
            jax.ShapeDtypeStruct((bnkv, s, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp plumbing
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, causal, sm_scale, bq, bk, interpret):
    out, _ = _fwd_call(
        q, k, v, causal=causal, sm_scale=sm_scale, bq=bq, bk=bk,
        interpret=interpret,
    )
    return out


def _flash_fwd(q, k, v, causal, sm_scale, bq, bk, interpret):
    out, lse = _fwd_call(
        q, k, v, causal=causal, sm_scale=sm_scale, bq=bq, bk=bk,
        interpret=interpret,
    )
    return out, (q, k, v, out, lse)


def _flash_bwd(causal, sm_scale, bq, bk, interpret, res, do):
    q, k, v, out, lse = res
    return _bwd_call(
        q, k, v, out, lse, do,
        causal=causal, sm_scale=sm_scale, bq=bq, bk=bk, interpret=interpret,
    )


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
) -> Array:
    """Fused attention ``softmax(q·kᵀ·scale [+causal]) · v``, differentiable.

    ``q``: (b, num_heads, s, d); ``k``/``v``: (b, num_kv_heads, s, d) with
    ``num_heads % num_kv_heads == 0`` — GQA is consumed natively (no
    repeated-KV materialization in either pass).  ``s`` must be a multiple
    of 128; ``d`` is padded to a lane tile internally.  Default
    ``sm_scale = 1/√d`` uses the *logical* (unpadded) head dim.
    """
    b, nh, s, d = q.shape
    _, nkv, sk, dk_ = k.shape
    if sk != s or dk_ != d or v.shape != k.shape:
        raise NotImplementedError("flash kernel requires matching q/k/v seq+dim")
    if nh % nkv != 0:
        raise ValueError(f"num_heads {nh} not a multiple of num_kv_heads {nkv}")
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    bq = block_q or _pick_block(s)
    bk = block_k or bq
    if bq != bk:
        raise NotImplementedError("block_q must equal block_k (causal tiling)")
    if s % bq != 0:
        raise NotImplementedError(f"sequence {s} not a multiple of block {bq}")
    d_pad = max(_LANES, -(-d // _LANES) * _LANES)
    if d_pad != d:
        pad = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    out = _flash(
        q.reshape(b * nh, s, d_pad),
        k.reshape(b * nkv, s, d_pad),
        v.reshape(b * nkv, s, d_pad),
        causal,
        float(sm_scale),
        bq,
        bk,
        interpret,
    ).reshape(b, nh, s, d_pad)
    return out[..., :d] if d_pad != d else out
