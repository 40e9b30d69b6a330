"""In-kernel paged decode attention: whole-window scoring from KV pages.

Greenfield vs the reference (no KV cache at all, SURVEY.md §0); this is the
TPU replacement for the XLA paged path's gather, which materializes a dense
``(b, window, nkv, hd)`` view of the mapped pages every step (one extra
write + read of the whole window).  Design (v2 — the v1 grid-per-page
kernel measured 1.79× dense on hardware: 32 tiny grid steps/layer with
8 small per-head dots each drowned in grid/issue overhead):

* **grid = (slots,)** — one grid step per batch slot per layer;
* the slot's window pages are **manually DMA'd** from the HBM pools
  (``pl.ANY`` operands) into a contiguous VMEM window buffer, with the
  *next* slot's copies issued before the current slot's compute
  (double-buffered across grid steps, the standard Pallas pipeline);
* compute is **whole-window**: per KV head one ``(rs, hd) @ (hd, W)``
  score dot and one ``(rs, W) @ (W, hd)`` context dot — the same shapes
  XLA's dense windowed path feeds the MXU;
* int8 KV **scales factor out of both contractions** (they are
  per-position): scores multiply by ``k_scale`` after the dot and probs
  multiply by ``v_scale`` before the context dot — identical math to the
  XLA paths (``models/llama.py`` two-part attention), and the codes feed
  the MXU raw, so no ``(W, hd)`` dequant intermediate exists;
* the scale windows ride in as ordinary ``(b, nkv, W)`` blocked operands,
  prefix-sliced by XLA from the DENSE per-slot scale caches (see
  ``models/paged_kv.py`` — scales are positional, not paged; a page's
  64-f32 scale row is below the 128-lane tile Mosaic requires of a
  strided DMA destination, so an in-kernel scale path cannot lower — the
  alignment check that failed on v5e in round 4).

Layout contract (see ``models/paged_kv.py``): KV pools are rank-3
token-major ``(num_pages, page_size, kv_heads·head_dim)`` — one page is a
single dense (ps, nkv·hd) DMA rectangle with no tile padding, heads slice
on the 128-aligned minor axis, and the model's decode write is one
contiguous dus per slot.  Scale pools are ``(num_pages, page_size,
kv_heads)``; the XLA scale gather transposes them into the ``(1, W)``
lane orientation the score/prob multiplies broadcast over.

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
# (-inf) - (-inf); fully-masked windows yield l = 0 which the caller's
# two-way merge zeroes out cleanly
_MASK = -1e30


def _paged_kernel(
    tbl_ref,  # scalar prefetch: (b, P) int32 page table slice
    clen_ref,  # scalar prefetch: (b,) int32 valid prefix length
    q_ref,  # (SB, nkv, rs, hd) VMEM block
    kpool_ref,  # (pages, ps, nkv·hd) in HBM (pl.ANY)
    vpool_ref,
    ks_ref,  # (SB, nkv, W) f32 VMEM block (XLA-gathered window scales), or None
    vs_ref,
    kn_ref,  # writeback: (SB, 1, nkv·hd) pool-dtype new-token payload
    vn_ref,
    o_ref,  # (SB, nkv, rs, hd) f32
    m_ref,  # (SB, nkv, rs, 128) f32
    l_ref,
    kp_out,  # aliased pool outputs (pl.ANY) — writeback destinations
    vp_out,
    k_buf,  # (2, SB, P, ps, nkv·hd) VMEM
    v_buf,
    wb_k,  # (SB, ps, nkv·hd) VMEM writeback staging, or None
    wb_v,
    sem,  # DMA sems (2, SB, 2, P)
    wsem,  # writeback DMA sems (SB, 2), or None
    *,
    sm_scale: float,
    nkv: int,
    rs: int,
    ps: int,
    P: int,
    nb: int,
    SB: int,
    quant: bool,
    writeback: bool,
):
    ib = pl.program_id(0)
    W = P * ps

    def dmas(st, u, t):
        """All page copies for slot ``t`` into buffer set ``st`` lane ``u``."""
        out = []
        for p in range(P):
            pg = tbl_ref[t, p]
            out.append(
                pltpu.make_async_copy(
                    kpool_ref.at[pg], k_buf.at[st, u, p], sem.at[st, u, 0, p]
                )
            )
            out.append(
                pltpu.make_async_copy(
                    vpool_ref.at[pg], v_buf.at[st, u, p], sem.at[st, u, 1, p]
                )
            )
        return out

    cur = lax.rem(ib, 2)
    nxt = lax.rem(ib + 1, 2)

    @pl.when(ib == 0)
    def _warmup():
        for u in range(SB):
            for d in dmas(cur, u, ib * SB + u):
                d.start()

    @pl.when(ib + 1 < nb)
    def _prefetch():
        for u in range(SB):
            t = jnp.minimum((ib + 1) * SB + u, nb * SB - 1)
            for d in dmas(nxt, u, t):
                d.start()

    hd = q_ref.shape[-1]
    dtype = q_ref.dtype
    wb_pending = []

    for u in range(SB):  # static unroll over the step's slots
        t = ib * SB + u
        for d in dmas(cur, u, t):
            d.wait()

        pos = lax.broadcasted_iota(jnp.int32, (1, W), 1)
        valid = pos < clen_ref[t]
        validf = valid.astype(jnp.float32)

        s_parts = []
        for g in range(nkv):
            q_g = q_ref[u, g]  # (rs, hd)
            # 128-aligned minor slice of the flattened head axis
            k_g = k_buf[cur, u, :, :, g * hd : (g + 1) * hd].reshape(W, hd)
            s_parts.append(
                lax.dot_general(
                    q_g,
                    k_g.astype(dtype),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        s = jnp.concatenate(s_parts, axis=0) * sm_scale  # (nkv·rs, W)
        if quant:
            # per-position k scales factor out of the hd contraction
            ks = jnp.broadcast_to(
                ks_ref[u].reshape(nkv, 1, W), (nkv, rs, W)
            ).reshape(nkv * rs, W)
            s = s * ks
        s = jnp.where(valid, s, _MASK)
        m = jnp.max(s, axis=1, keepdims=True)  # (nkv·rs, 1)
        p = jnp.exp(s - m) * validf
        l = jnp.sum(p, axis=1, keepdims=True)
        if quant:
            # v scales factor out of the W contraction
            vs = jnp.broadcast_to(
                vs_ref[u].reshape(nkv, 1, W), (nkv, rs, W)
            ).reshape(nkv * rs, W)
            p = p * vs
        pv = p.astype(dtype)
        for g in range(nkv):
            v_g = v_buf[cur, u, :, :, g * hd : (g + 1) * hd].reshape(W, hd)
            o_ref[u, g] = lax.dot_general(
                pv[g * rs : (g + 1) * rs],
                v_g.astype(dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (rs, hd)
        m_ref[u] = jnp.broadcast_to(m.reshape(nkv, rs, 1), (nkv, rs, _LANES))
        l_ref[u] = jnp.broadcast_to(l.reshape(nkv, rs, 1), (nkv, rs, _LANES))

        if writeback:
            # In-place decode write: the token at position clen lands in
            # window page wp = clen // ps at row woff = clen % ps.  The page
            # is already in VMEM (attention above masked it out via pos <
            # clen); insert the token with a row select and DMA the FULL
            # page back to the pool — page-granular, tile-aligned, rides
            # the kernel (no XLA-side pool write op exists at all).  Scale
            # pools are written by the CALLER in XLA (their ~1.5%-of-KV
            # rows are below HBM tile granularity: a single (ps·nkv) f32
            # row slice of the rank-2 pool fails Mosaic's 8-sublane HBM
            # slice alignment — round-4 hardware lowering check).  Slots
            # own disjoint pages, so the writeback cannot race another
            # slot's prefetch except on the inert null page.
            clen = clen_ref[t]
            # clamp for memory safety: a caller-contract violation
            # (cache_len >= window) would otherwise index past the table
            # slice; the violation itself is already NaN-poisoned upstream
            wp = jnp.minimum(clen // ps, P - 1)
            woff = lax.rem(clen, ps)
            pg_w = tbl_ref[t, wp]
            row = lax.broadcasted_iota(jnp.int32, (ps, 1), 0)
            is_row = row == woff
            wb_k[u] = jnp.where(is_row, kn_ref[u], k_buf[cur, u, wp])
            wb_v[u] = jnp.where(is_row, vn_ref[u], v_buf[cur, u, wp])
            copies = [
                pltpu.make_async_copy(wb_k.at[u], kp_out.at[pg_w], wsem.at[u, 0]),
                pltpu.make_async_copy(wb_v.at[u], vp_out.at[pg_w], wsem.at[u, 1]),
            ]
            for c in copies:
                c.start()
            wb_pending.extend(copies)

    if writeback:
        # drain every slot's writeback before the grid step retires (the
        # staging buffers are reused next step)
        for c in wb_pending:
            c.wait()


def _pick_sb(b: int, P: int, ps: int, nkv: int, hd: int, itemsize: int) -> int:
    """Slots per grid step: largest divisor of b whose double-buffered page
    buffers fit a ~10 MB VMEM budget.  Per-slot grid steps stop amortizing
    past ~16 slots (round-3 b64 cliff: 1.55× dense); batching SB slots per
    step cuts grid overhead SB× and keeps 2·SB·P page DMAs in flight.
    ``BITORCH_PAGED_SB`` overrides."""
    import os

    env = os.environ.get("BITORCH_PAGED_SB")
    if env:
        return max(1, min(int(env), b))
    per_slot = 2 * 2 * P * ps * nkv * hd * itemsize  # k+v, two buffer sets
    # v5e A/B (round-4 probe, int8 pools, W=256): b8 wants SB=b (one grid
    # step, all DMAs in flight: 8.4 vs 11.2 µs at SB=1); b64 wants SB=4
    # (42.2 vs 45.2 at SB=8 / 48.1 at SB=1 — deeper grids pipeline better
    # than giant steps once there are many steps anyway)
    cands = (8, 4, 2) if b <= 8 else (4, 8, 2)
    for cand in cands:
        if b % cand == 0 and per_slot * cand <= 10 * 1024 * 1024:
            return cand
    return 1


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
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
    ``k_pool``/``v_pool``: (num_pages, ps, nkv·hd); ``k_scale``/``v_scale``:
    DENSE per-slot (slots, L ≥ W, nkv) fp32 or None (bf16 pools) — scales
    are positional, not paged (see models/paged_kv.py).  ``page_table``:
    (b, P) int32 — only the pages covering the attention window.
    ``cache_len``: (b,) int32 valid prefix per slot.

    Returns ``(acc, m, l)``: unnormalized context (b, nkv, rs, hd) f32 and
    lane-broadcast running max / sum (b, nkv, rs, 128) f32.
    """
    b, nkv, rs, hd = q.shape
    ps = k_pool.shape[1]
    P = page_table.shape[1]
    quant = k_scale is not None
    cache_len = jnp.broadcast_to(jnp.asarray(cache_len, jnp.int32), (b,))
    SB = _pick_sb(b, P, ps, nkv, hd, k_pool.dtype.itemsize)

    def q_map(ib, tbl, clen):
        return (ib, 0, 0, 0)

    def sc_map(ib, tbl, clen):
        return (ib, 0, 0)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [
        pl.BlockSpec((SB, nkv, rs, hd), q_map),
        any_spec,
        any_spec,
    ]
    operands = [q, k_pool, v_pool]
    if quant:
        # window scales: a prefix slice of the dense (slots, L, nkv)
        # caches, transposed into the (1, W) lane orientation the kernel's
        # score/prob multiplies broadcast over (the paged form needed a
        # page gather here)
        def window_scale(cache):
            return cache[:, : P * ps].transpose(0, 2, 1)

        in_specs += [
            pl.BlockSpec((SB, nkv, P * ps), sc_map),
            pl.BlockSpec((SB, nkv, P * ps), sc_map),
        ]
        operands += [window_scale(k_scale), window_scale(v_scale)]

    kern = functools.partial(
        _paged_kernel_quant if quant else _paged_kernel_noscale,
        sm_scale=sm_scale, nkv=nkv, rs=rs, ps=ps, P=P, nb=b // SB, SB=SB,
    )
    pool_dt = k_pool.dtype
    scratch = [
        pltpu.VMEM((2, SB, P, ps, nkv * hd), pool_dt),
        pltpu.VMEM((2, SB, P, ps, nkv * hd), pool_dt),
        pltpu.SemaphoreType.DMA((2, SB, 2, P)),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // SB,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((SB, nkv, rs, hd), q_map),
            pl.BlockSpec((SB, nkv, rs, _LANES), q_map),
            pl.BlockSpec((SB, nkv, rs, _LANES), q_map),
        ],
        scratch_shapes=scratch,
    )
    acc, m, l = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, nkv, rs, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, nkv, rs, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, nkv, rs, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(page_table.astype(jnp.int32), cache_len, *operands)
    return acc, m, l


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def paged_prefix_attention_update(
    q: Array,
    k_pool: Array,
    v_pool: Array,
    k_scale: Optional[Array],
    v_scale: Optional[Array],
    page_table: Array,
    cache_len: Array,
    k_new: Array,
    v_new: Array,
    *,
    sm_scale: float,
    interpret: bool = False,
):
    """:func:`paged_prefix_attention` PLUS the decode-step KV-pool write,
    fused into the same kernel launch via ``input_output_aliases``.

    The new token (``k_new``/``v_new``: (b, nkv·hd) pool dtype) is inserted
    into its window page in VMEM and the full page is DMA'd back in place —
    no XLA-side KV-pool write op exists (the per-slot dus chain is serial
    in b and the scatter form lowers to while-loop machinery; BENCH_NOTES
    r3).  In int8 mode the caller writes the dense per-slot scale caches
    itself in XLA **before** this call and passes the post-update caches
    here for the window slice — a single scale row is below HBM tile
    granularity, so an in-kernel scale DMA cannot lower (Mosaic 8-sublane
    slice rule; round-4 hardware check).  The attention mask
    ``pos < cache_len`` excludes the new token either way.  ``cache_len``
    is the write position per slot; the caller contract is ``attn_window >
    max(cache_len)`` so the write page is inside the window slice of
    ``page_table``.

    Returns ``(acc, m, l, k_pool', v_pool')``.
    """
    b, nkv, rs, hd = q.shape
    ps = k_pool.shape[1]
    P = page_table.shape[1]
    quant = k_scale is not None
    cache_len = jnp.broadcast_to(jnp.asarray(cache_len, jnp.int32), (b,))
    SB = _pick_sb(b, P, ps, nkv, hd, k_pool.dtype.itemsize)

    def q_map(ib, tbl, clen):
        return (ib, 0, 0, 0)

    def sc_map(ib, tbl, clen):
        return (ib, 0, 0)

    def row_map(ib, tbl, clen):
        # rank-3 (b, 1, X) singleton rows: Mosaic requires the last two
        # block dims to be (mult of 8, mult of 128) OR equal to the array
        # dims — a rank-2 (SB, X) block over (b, X) violates the
        # second-minor rule (the round-3 driver-bench crash); the
        # (SB, 1, X) block over (b, 1, X) trivially equals the trailing
        # array dims.
        return (ib, 0, 0)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [pl.BlockSpec((SB, nkv, rs, hd), q_map), any_spec, any_spec]
    operands = [q, k_pool, v_pool]
    if quant:

        def window_scale(cache):
            # dense per-slot scales: prefix slice + lane-orientation swap
            return cache[:, : P * ps].transpose(0, 2, 1)

        in_specs += [
            pl.BlockSpec((SB, nkv, P * ps), sc_map),
            pl.BlockSpec((SB, nkv, P * ps), sc_map),
        ]
        operands += [window_scale(k_scale), window_scale(v_scale)]
    in_specs += [
        pl.BlockSpec((SB, 1, nkv * hd), row_map),
        pl.BlockSpec((SB, 1, nkv * hd), row_map),
    ]
    operands += [
        k_new.astype(k_pool.dtype)[:, None, :],
        v_new.astype(v_pool.dtype)[:, None, :],
    ]

    kern = functools.partial(
        _paged_kernel_quant_wb if quant else _paged_kernel_noscale_wb,
        sm_scale=sm_scale, nkv=nkv, rs=rs, ps=ps, P=P, nb=b // SB, SB=SB,
    )
    pool_dt = k_pool.dtype
    scratch = [
        pltpu.VMEM((2, SB, P, ps, nkv * hd), pool_dt),
        pltpu.VMEM((2, SB, P, ps, nkv * hd), pool_dt),
        pltpu.VMEM((SB, ps, nkv * hd), pool_dt),
        pltpu.VMEM((SB, ps, nkv * hd), pool_dt),
        pltpu.SemaphoreType.DMA((2, SB, 2, P)),
        pltpu.SemaphoreType.DMA((SB, 2)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, nkv, rs, hd), jnp.float32),
        jax.ShapeDtypeStruct((b, nkv, rs, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((b, nkv, rs, _LANES), jnp.float32),
        jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
        jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
    ]
    out_specs = [
        pl.BlockSpec((SB, nkv, rs, hd), q_map),
        pl.BlockSpec((SB, nkv, rs, _LANES), q_map),
        pl.BlockSpec((SB, nkv, rs, _LANES), q_map),
        any_spec,
        any_spec,
    ]
    # flattened-input indices include the two scalar-prefetch operands:
    # 0=tbl 1=clen 2=q 3=k_pool 4=v_pool — the pools alias outputs 3/4
    aliases = {3: 3, 4: 4}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // SB,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        input_output_aliases=aliases,
        interpret=interpret,
    )(page_table.astype(jnp.int32), cache_len, *operands)
    acc, m, l, kp, vp = outs
    return acc, m, l, kp, vp


def _paged_kernel_noscale(
    tbl_ref, clen_ref, q_ref, kpool_ref, vpool_ref, o_ref, m_ref, l_ref,
    k_buf, v_buf, sem, **kw,
):
    _paged_kernel(
        tbl_ref, clen_ref, q_ref, kpool_ref, vpool_ref, None, None,
        None, None, o_ref, m_ref, l_ref,
        None, None, k_buf, v_buf, None, None, sem, None,
        **dict(kw, quant=False, writeback=False),
    )


def _paged_kernel_quant(
    tbl_ref, clen_ref, q_ref, kpool_ref, vpool_ref, ks_ref, vs_ref,
    o_ref, m_ref, l_ref, k_buf, v_buf, sem, **kw,
):
    _paged_kernel(
        tbl_ref, clen_ref, q_ref, kpool_ref, vpool_ref, ks_ref, vs_ref,
        None, None, o_ref, m_ref, l_ref,
        None, None, k_buf, v_buf, None, None, sem, None,
        **dict(kw, quant=True, writeback=False),
    )


def _paged_kernel_quant_wb(
    tbl_ref, clen_ref, q_ref, kpool_ref, vpool_ref, ks_ref, vs_ref,
    kn_ref, vn_ref, o_ref, m_ref, l_ref, kp_out, vp_out,
    k_buf, v_buf, wb_k, wb_v, sem, wsem, **kw,
):
    _paged_kernel(
        tbl_ref, clen_ref, q_ref, kpool_ref, vpool_ref, ks_ref, vs_ref,
        kn_ref, vn_ref, o_ref, m_ref, l_ref,
        kp_out, vp_out, k_buf, v_buf, wb_k, wb_v,
        sem, wsem, **dict(kw, quant=True, writeback=True),
    )


def _paged_kernel_noscale_wb(
    tbl_ref, clen_ref, q_ref, kpool_ref, vpool_ref, kn_ref, vn_ref,
    o_ref, m_ref, l_ref, kp_out, vp_out,
    k_buf, v_buf, wb_k, wb_v, sem, wsem, **kw,
):
    _paged_kernel(
        tbl_ref, clen_ref, q_ref, kpool_ref, vpool_ref, None, None,
        kn_ref, vn_ref, o_ref, m_ref, l_ref,
        kp_out, vp_out, k_buf, v_buf, wb_k, wb_v,
        sem, wsem, **dict(kw, quant=False, writeback=True),
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
    normalized context in f32.

    CONTRACT: full-width (…, hd) stats MUST be lane-broadcast (every lane
    holds the same row max / sumexp — the paged kernel's broadcast output
    form).  Genuine per-lane stats of width hd would be normalized
    wrongly with no error; callers with real per-lane stats must reduce
    to (…, 1) first.

    When the kernel's lane-broadcast stats already match ``hd`` (= 128),
    the arithmetic runs on them directly: a ``[..., :1]`` lane slice of a
    (…, 128) f32 array is a relayout copy XLA materializes per projection
    per step (4 × 0.7 µs × layers ≈ 88 µs/step on the 8B serving config,
    round-4 device trace), while redundant 128-lane elementwise math is
    free by comparison."""
    hd = acc_pre.shape[-1]
    if m_pre.shape[-1] != hd:
        m_pre = m_pre[..., :1]
        l_pre = l_pre[..., :1]
    if m_new.shape[-1] not in (1, hd):
        m_new = m_new[..., :1]
        l_new = l_new[..., :1]
    m_tot = jnp.maximum(m_pre, m_new)
    a_pre = jnp.exp(m_pre - m_tot)
    a_new = jnp.exp(m_new - m_tot)
    denom = l_pre * a_pre + l_new * a_new
    return (acc_pre * a_pre + acc_new * a_new) / denom
