"""Llama-specific sharding recipe (Megatron-style TP + dp/fsdp).

Greenfield (reference is single-device).  Follows the scaling-book layout
the SNIPPETS.md sharding_map also uses:

* q/k/v/gate/up projections: **column-parallel** — output features over 'tp'
  (heads split across chips, no collective needed after the matmul);
* o/down projections: **row-parallel** — input features over 'tp' (the
  matmul contracts the sharded axis; XLA inserts one psum per block);
* embeddings/norms: replicated (or 'fsdp'-sharded rows for memory);
* KV caches: batch over 'dp', heads over 'tp'.

For MPQ tensors the row-parallel K sharding lands on whole quant groups
(checked by ``mpq_row_parallel_spec``).
"""

from __future__ import annotations


import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.sharding import make_sharding_rules, partition_specs

LLAMA_RULES = {
    r"(q|k|v)_proj": "column",
    r"(gate|up)_proj": "column",
    r"(o|down)_proj": "row",
    # vocab-dim (output-features) sharding: each shard owns a logits slice
    r"lm_head": "column",
    r"embed": "replicated",
}


def llama_partition_specs(params, axis: str = "tp"):
    """PartitionSpec pytree for a Llama params tree (quantized or fp)."""
    rules = make_sharding_rules(LLAMA_RULES, default_axis=axis)
    return partition_specs(params, rules, axis)


def shard_llama_params(params, mesh: Mesh, axis: str = "tp"):
    specs = llama_partition_specs(params, axis)
    shardings = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)
    return jax.device_put(params, shardings)


def kv_cache_shardings(mesh: Mesh, num_layers: int, kv_cache_dtype: str = "bf16"):
    """(b, L, kv_heads, d) caches: batch over dp, heads over tp.

    int8 caches are per-layer 3-tuples (k, v, kv_scale) with one merged
    (b, L, 2·kv_heads) scale cache laid out as [k-scales | v-scales]
    halves.  The halves layout keeps reads as fusible lane slices, so
    the scale cache replicates over tp (splitting 2·nkv lanes would give
    whole shards only-k or only-v scales); at ~512 KB of f32 per layer
    the replication is noise next to the sharded int8 pools.
    """
    spec = NamedSharding(mesh, P("dp", None, "tp", None))
    if kv_cache_dtype == "int8":
        sspec = NamedSharding(mesh, P("dp", None, None))
        return [(spec, spec, sspec) for _ in range(num_layers)]
    return [(spec, spec) for _ in range(num_layers)]


def paged_kv_shardings(mesh: Mesh, caches):
    """Shardings for a list of :class:`~..models.paged_kv.PagedKV`.

    Pools shard kv-heads over 'tp' and stay whole on the page axis (the
    page pool is a global resource; the allocator's ``dp_groups`` layout
    keeps each dp shard's gathers inside its own page range).  The page
    table shards its slot axis over 'dp'.
    """
    # rank-3 pools (pages, page_size, kv_heads·head_dim): tp splits the
    # flattened head axis (head-aligned because nkv % tp == 0).  Dense
    # per-slot scale caches (slots, L, kv_heads) shard their slot axis
    # over 'dp' like the page table; the head axis stays whole (~1 MB of
    # fp32 per layer, and the windowed read is a prefix slice).
    pool = NamedSharding(mesh, P(None, None, "tp"))
    scale = NamedSharding(mesh, P("dp", None, None))
    table = NamedSharding(mesh, P("dp", None))
    out = []
    for c in caches:
        out.append(
            c.replace(
                k_pool=pool,
                v_pool=pool,
                k_scale=None if c.k_scale is None else scale,
                v_scale=None if c.v_scale is None else scale,
                page_table=table,
            )
        )
    return out
