"""In-kernel paged decode attention: score KV pages in place via the table.

Greenfield vs the reference (no KV cache at all, SURVEY.md §0); this is the
TPU replacement for the XLA paged path's gather, which materializes a dense
``(b, window, nkv, hd)`` view of the mapped pages every step (one extra
write + read of the whole window — the measured 1.10–1.18× paged-vs-dense
decode overhead, BENCH_NOTES round 2).  Here the page table is a
scalar-prefetch operand and the *block index map* dereferences it, so each
grid step DMAs one page of one slot straight from the pool: the bytes read
are exactly the dense windowed read, no intermediate view exists.

Layout contract (see ``models/paged_kv.py``): pools are **head-major**
``(num_pages, kv_heads, page_size, head_dim)`` so a page block's trailing
dims ``(page_size, head_dim)`` are one native int8/bf16 tile — the
token-major layout would pad ``(kv_heads, head_dim)`` tiles 4× on int8
reads.  Scale pools stay token-major ``(num_pages, page_size, kv_heads)``:
sliced per head they give ``(ps, 1)`` columns that broadcast along the
lane (head_dim) axis for the in-kernel dequant, the free direction.

The kernel returns *unnormalized* streaming-softmax state over the cached
prefix — ``acc = Σ p·v`` plus running ``(m, l)`` per query row — and the
caller merges it with this step's new-token scores in XLA (a two-way
softmax combine over tiny shapes), mirroring the two-part attention the
dense windowed path uses (docs/DESIGN.md regime 2).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANES = 128
# finite mask value: keeps the running max finite so exp() never sees
# (-inf) - (-inf); fully-masked pages yield l = 0 which the caller's
# two-way merge zeroes out cleanly
_MASK = -1e30


def _paged_kernel(
    tbl_ref,  # scalar prefetch: (b, P) int32 page table slice
    clen_ref,  # scalar prefetch: (b,) int32 valid prefix length
    q_ref,  # (1, nkv, rs, hd)
    k_ref,  # (1, nkv, ps, hd) pool page
    v_ref,
    ks_ref,  # (1, ps, nkv) or None
    vs_ref,
    o_ref,  # (1, nkv, rs, hd) f32
    m_ref,  # (1, nkv, rs, 128) f32
    l_ref,
    acc_s,  # (nkv, rs, hd) f32
    m_s,  # (nkv, rs, 128) f32
    l_s,
    *,
    sm_scale: float,
    nkv: int,
    rs: int,
    ps: int,
    np_: int,
    quant: bool,
):
    ib = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_s[:] = jnp.zeros_like(acc_s)
        m_s[:] = jnp.full_like(m_s, _MASK)
        l_s[:] = jnp.zeros_like(l_s)

    pos = j * ps + lax.broadcasted_iota(jnp.int32, (rs, ps), 1)
    valid = pos < clen_ref[ib]

    for g in range(nkv):  # static unroll over KV heads of this page
        q_g = q_ref[0, g]  # (rs, hd)
        k_raw = k_ref[0, g]  # (ps, hd)
        v_raw = v_ref[0, g]
        if quant:
            # per-position scales broadcast along head_dim (lanes) — free
            kf = (
                k_raw.astype(jnp.float32) * ks_ref[0][:, g : g + 1]
            ).astype(q_g.dtype)
            vf = (
                v_raw.astype(jnp.float32) * vs_ref[0][:, g : g + 1]
            ).astype(q_g.dtype)
        else:
            kf = k_raw.astype(q_g.dtype)
            vf = v_raw.astype(q_g.dtype)
        s = (
            lax.dot_general(
                q_g, kf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * sm_scale
        )  # (rs, ps)
        s = jnp.where(valid, s, _MASK)
        m_prev = m_s[g][:, :1]  # (rs, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new) * valid.astype(jnp.float32)
        l_s[g] = jnp.broadcast_to(
            l_s[g][:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True),
            (rs, _LANES),
        )
        acc_s[g] = acc_s[g] * alpha + lax.dot_general(
            p.astype(vf.dtype), vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_s[g] = jnp.broadcast_to(m_new, (rs, _LANES))

    @pl.when(j == np_ - 1)
    def _store():
        o_ref[0] = acc_s[:]
        m_ref[0] = m_s[:]
        l_ref[0] = l_s[:]


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "interpret")
)
def paged_prefix_attention(
    q: Array,
    k_pool: Array,
    v_pool: Array,
    k_scale: Optional[Array],
    v_scale: Optional[Array],
    page_table: Array,
    cache_len: Array,
    *,
    sm_scale: float,
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """Streaming-softmax attention state of ``q`` over paged cached KV.

    ``q``: (b, nkv, rs, hd) — ``rs`` packs (group query heads × new tokens).
    ``k_pool``/``v_pool``: (num_pages, nkv, ps, hd); ``k_scale``/``v_scale``:
    (num_pages, ps, nkv) fp32 or None (bf16 pools).  ``page_table``:
    (b, P) int32 — only the pages covering the attention window.
    ``cache_len``: (b,) int32 valid prefix per slot.

    Returns ``(acc, m, l)``: unnormalized context (b, nkv, rs, hd) f32 and
    lane-broadcast running max / sum (b, nkv, rs, 128) f32.
    """
    b, nkv, rs, hd = q.shape
    ps = k_pool.shape[2]
    P = page_table.shape[1]
    quant = k_scale is not None
    cache_len = jnp.broadcast_to(jnp.asarray(cache_len, jnp.int32), (b,))

    def q_map(ib, j, tbl, clen):
        return (ib, 0, 0, 0)

    def page_map(ib, j, tbl, clen):
        return (tbl[ib, j], 0, 0, 0)

    def scale_map(ib, j, tbl, clen):
        return (tbl[ib, j], 0, 0)

    def out_map(ib, j, tbl, clen):
        return (ib, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, nkv, rs, hd), q_map),
        pl.BlockSpec((1, nkv, ps, hd), page_map),
        pl.BlockSpec((1, nkv, ps, hd), page_map),
    ]
    operands = [q, k_pool, v_pool]
    if quant:
        in_specs += [
            pl.BlockSpec((1, ps, nkv), scale_map),
            pl.BlockSpec((1, ps, nkv), scale_map),
        ]
        operands += [k_scale, v_scale]

    kernel = functools.partial(
        _paged_kernel if quant else _paged_kernel_noscale,
        sm_scale=sm_scale, nkv=nkv, rs=rs, ps=ps, np_=P, quant=quant,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, P),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, nkv, rs, hd), out_map),
            pl.BlockSpec((1, nkv, rs, _LANES), out_map),
            pl.BlockSpec((1, nkv, rs, _LANES), out_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((nkv, rs, hd), jnp.float32),
            pltpu.VMEM((nkv, rs, _LANES), jnp.float32),
            pltpu.VMEM((nkv, rs, _LANES), jnp.float32),
        ],
    )
    acc, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, nkv, rs, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, nkv, rs, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, nkv, rs, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table.astype(jnp.int32), cache_len, *operands)
    return acc, m, l


def _paged_kernel_noscale(
    tbl_ref, clen_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
    acc_s, m_s, l_s, *, sm_scale, nkv, rs, ps, np_, quant,
):
    _paged_kernel(
        tbl_ref, clen_ref, q_ref, k_ref, v_ref, None, None,
        o_ref, m_ref, l_ref, acc_s, m_s, l_s,
        sm_scale=sm_scale, nkv=nkv, rs=rs, ps=ps, np_=np_, quant=False,
    )


def merge_attention_parts(
    acc_pre: Array,
    m_pre: Array,
    l_pre: Array,
    acc_new: Array,
    m_new: Array,
    l_new: Array,
) -> Array:
    """Two-way streaming-softmax combine: prefix state (from the kernel)
    with this step's new-token state (XLA).  Stats are (…, 1) or (…, 128)
    lane-broadcast f32; accs are (…, hd) f32 unnormalized.  Returns the
    normalized context in f32."""
    m_pre = m_pre[..., :1]
    m_new = m_new[..., :1]
    l_pre = l_pre[..., :1]
    l_new = l_new[..., :1]
    m_tot = jnp.maximum(m_pre, m_new)
    a_pre = jnp.exp(m_pre - m_tot)
    a_new = jnp.exp(m_new - m_tot)
    denom = l_pre * a_pre + l_new * a_new
    return (acc_pre * a_pre + acc_new * a_new) / denom
