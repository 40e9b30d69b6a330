"""Paged (block) KV cache: decouple KV capacity from slot count.

Greenfield — the reference has no KV cache at all (SURVEY.md §0 "no
serving system, no KV-cache"); this is the TPU-side fix for the dense
cache's ``slots × max_len`` allocation, which OOMs a v5e at batch 64
(BENCH_NOTES "decode throughput vs batch").

Design (TPU-first, static shapes throughout):

* one **page pool** per layer — token-major rank-3 ``(num_pages,
  page_size, kv_heads·head_dim)`` for K and V (int8 pools + fp32
  per-position rank-2 ``(num_pages, page_size·kv_heads)`` scale pools in
  the int8 serving config) — shared by every slot.  This layout is the fixed
  point of three hardware constraints (each violated alternative was
  measured, BENCH_NOTES r3): one decode token is a single contiguous
  ``(1, 1, kv_heads·hd)`` dus (a head-major pool makes the token write
  strided over heads, which flips XLA's layout assignment into whole-pool
  layout-change copies every step — 3.4 ms/step on 8B); the minor dim
  kv_heads·hd ≥ 1024 keeps int8 tiles (32, 128) unpadded (a rank-4
  token-major pool pads the trailing ``(kv_heads, hd)`` tile 4×); and the
  in-place Pallas kernel (``ops/pallas/paged_attention.py``) DMAs each
  page as one dense ``(page_size, kv_heads·hd)`` rectangle and slices
  heads on the 128-aligned minor axis;
* a **page table** ``(slots, pages_per_slot) int32`` mapping each slot's
  logical cache blocks to pool pages.  The table is tiny and host-managed
  (:class:`PageAllocator`); it rides into the jitted step as a normal
  array argument, so remapping pages never recompiles;
* **page 0 is the null page**: never allocated, it absorbs writes from
  inactive lock-step slots and backs unmapped table entries.  Reads of
  garbage positions are already masked by the attention ``cache_len``
  mask, so null-page contents are inert;
* writes scatter the new token's KV at ``(table[pos // ps], pos % ps)``;
  reads gather the slot's pages into a dense ``(b, P*ps, ...)`` view that
  feeds the exact same attention math as the dense cache — with an
  identity mapping the result is bit-identical, which is the equivalence
  the tests pin.

Capacity sizing: the pool holds ``num_pages * page_size`` tokens total,
chosen independently of ``slots * max_len``.  The batcher's admission
control reserves a request's worst-case pages up front and blocks
admission (not mid-decode) when the pool is exhausted, so a too-small
pool degrades throughput, never correctness.
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array


@struct.dataclass
class PagedKV:
    """One layer's paged KV cache.

    ``k_pool``/``v_pool`` are ``(num_pages, page_size, kv_heads·head_dim)``
    (``kv_heads`` rides as static pytree metadata so attention can split
    the flattened head axis).  ``k_scale``/``v_scale`` are ``None`` in
    bf16 mode; in int8 mode they hold fp32 per-position scales in a
    **dense per-slot** layout ``(slots, pages_per_slot·page_size,
    kv_heads)`` — NOT paged.  Slots own disjoint pages (no prefix sharing
    in the allocator), so per-(slot, position) scales carry exactly the
    paged information, and the dense form turns the decode-step scale
    write into the dense cache's single dus (the paged rank-2 scale pools
    needed one dus per slot per pool: 512 ops, 418 µs/step on the 8B b8
    serving config — the round-4 device trace's #1 paged overhead) and the
    window read into a plain prefix slice instead of a page gather.
    Stale rows after slot reuse are inert: attention multiplies scales
    into scores *before* the ``pos < cache_len`` mask selects them away,
    and the pools are zero-initialized so stale values are always finite.
    ``page_table`` ``(b, pages_per_slot) int32`` holds the same *values*
    for every layer but must be a **distinct device buffer per layer**:
    the serving step donates the cache pytree, and XLA rejects donating
    one buffer twice (``Attempt to donate the same buffer twice``).
    """

    k_pool: Array
    v_pool: Array
    k_scale: Optional[Array]
    v_scale: Optional[Array]
    page_table: Array
    kv_heads: int = struct.field(pytree_node=False, default=0)

    @property
    def page_size(self) -> int:
        return self.k_pool.shape[1]

    @property
    def view_len(self) -> int:
        return self.page_table.shape[1] * self.page_size


def init_paged_kv_caches(
    cfg,
    num_pages: int,
    page_size: int,
    slots: int,
    pages_per_slot: int,
) -> List[PagedKV]:
    """Allocate per-layer page pools + one shared identity-free page table.

    ``num_pages`` includes the reserved null page 0; usable capacity is
    ``(num_pages - 1) * page_size`` tokens.
    """
    shape = (num_pages, page_size, cfg.num_kv_heads * cfg.head_dim)
    caches = []
    for _ in range(cfg.num_layers):
        # distinct buffer per layer — the donated-step requirement above
        table = jnp.zeros((slots, pages_per_slot), jnp.int32)
        if cfg.kv_cache_dtype == "int8":
            sshape = (slots, pages_per_slot * page_size, cfg.num_kv_heads)
            caches.append(
                PagedKV(
                    k_pool=jnp.zeros(shape, jnp.int8),
                    v_pool=jnp.zeros(shape, jnp.int8),
                    k_scale=jnp.zeros(sshape, jnp.float32),
                    v_scale=jnp.zeros(sshape, jnp.float32),
                    page_table=table,
                    kv_heads=cfg.num_kv_heads,
                )
            )
        else:
            caches.append(
                PagedKV(
                    k_pool=jnp.zeros(shape, cfg.dtype),
                    v_pool=jnp.zeros(shape, cfg.dtype),
                    k_scale=None,
                    v_scale=None,
                    page_table=table,
                    kv_heads=cfg.num_kv_heads,
                )
            )
    return caches


def paged_write_positions(cache: PagedKV, cache_len, b: int, s: int):
    """(page, offset) int32 arrays of shape (b, s) for writing ``s`` new
    tokens per slot starting at each slot's ``cache_len``."""
    ps = cache.page_size
    step = jnp.arange(s, dtype=jnp.int32)
    if jnp.ndim(cache_len) == 0:
        pos = jnp.broadcast_to(cache_len + step, (b, s)).astype(jnp.int32)
    else:
        pos = cache_len[:, None].astype(jnp.int32) + step[None, :]
    blk = jnp.minimum(pos // ps, cache.page_table.shape[1] - 1)
    page = jnp.take_along_axis(cache.page_table, blk, axis=1)  # (b, s)
    return page, pos % ps


class PageAllocator:
    """Host-side free-list page allocator + slot page-table bookkeeping.

    Page 0 is the null page and never handed out.  ``table`` rows of
    inactive slots point at page 0.
    """

    def __init__(
        self,
        num_pages: int,
        page_size: int,
        slots: int,
        pages_per_slot: int,
        dp_groups: int = 1,
    ):
        """``dp_groups > 1``: partition slots and pages into ``dp_groups``
        contiguous groups and only hand a slot pages from its own group.
        With the slot axis dp-sharded this keeps every page-gather local to
        its data-parallel shard — no cross-dp traffic in the decode step —
        which is the layout the multi-host serving path relies on."""
        self.page_size = page_size
        self.pages_per_slot = pages_per_slot
        self.dp_groups = dp_groups
        if slots % dp_groups:
            raise ValueError(f"slots {slots} not divisible by dp_groups {dp_groups}")
        self._slots_per_group = slots // dp_groups
        usable = list(range(1, num_pages))
        per = len(usable) // dp_groups
        if per == 0:
            raise ValueError(f"{num_pages} pages cannot cover {dp_groups} dp groups")
        # stacks: pop() hands out the lowest page of the slot's group first
        self._free_by_group: List[List[int]] = [
            list(reversed(usable[g * per : (g + 1) * per])) for g in range(dp_groups)
        ]
        self.table = np.zeros((slots, pages_per_slot), np.int32)
        self._owned: List[List[int]] = [[] for _ in range(slots)]

    @property
    def free(self) -> List[int]:
        return [p for grp in self._free_by_group for p in grp]

    def _group_of(self, slot: int) -> int:
        return slot // self._slots_per_group

    def pages_needed(self, tokens: int) -> int:
        return max(1, math.ceil(tokens / self.page_size))

    def can_alloc(self, tokens: int, slot: int = 0) -> bool:
        grp = self._free_by_group[self._group_of(slot)]
        return len(grp) >= self.pages_needed(tokens)

    def alloc(self, slot: int, tokens: int) -> bool:
        """Reserve enough pages for ``tokens`` cache positions on ``slot``
        (from the slot's dp group).  Returns False (allocating nothing) if
        that group's pages are exhausted."""
        n = self.pages_needed(tokens)
        if n > self.pages_per_slot:
            raise ValueError(
                f"request needs {n} pages > pages_per_slot {self.pages_per_slot}"
            )
        grp = self._free_by_group[self._group_of(slot)]
        if len(grp) < n:
            return False
        self.free_slot(slot)
        pages = [grp.pop() for _ in range(n)]
        self._owned[slot] = pages
        self.table[slot] = 0
        self.table[slot, : len(pages)] = pages
        return True

    def free_slot(self, slot: int):
        self._free_by_group[self._group_of(slot)].extend(
            reversed(self._owned[slot])
        )
        self._owned[slot] = []
        self.table[slot] = 0
