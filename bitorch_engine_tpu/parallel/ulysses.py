"""Ulysses-style sequence parallelism: all-to-all head redistribution.

Complement to :mod:`ring_attention` (SURVEY.md §5 long-context requirement):
instead of rotating KV around the ring, the sequence-sharded Q/K/V are
all-to-all'd so each device holds *all* positions for a subset of heads,
runs ordinary (fused/flash) attention locally, and all-to-all's back to
sequence sharding.  Two collectives per layer; preferable to ring when
heads ≥ devices and the per-device full-sequence attention fits memory.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map

Array = jax.Array


def _local_causal_attention(q, k, v, sm_scale):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * sm_scale
    L = q.shape[2]
    mask = jnp.tril(jnp.ones((L, L), bool))
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def ulysses_attention(
    q: Array,
    k: Array,
    v: Array,
    mesh: Mesh,
    axis: str = "sp",
    sm_scale: Optional[float] = None,
    causal: bool = True,
) -> Array:
    """Exact causal attention with the sequence axis sharded over ``axis``.

    ``q, k, v``: (b, h, L, d) logically, sharded P(None, None, axis, None);
    ``h`` must be divisible by the axis size.
    """
    b, h, L, d = q.shape
    n = mesh.shape[axis]
    if h % n != 0:
        raise ValueError(f"heads {h} not divisible by axis size {n}")
    sm = sm_scale if sm_scale is not None else 1.0 / (d**0.5)

    def local_fn(q_loc, k_loc, v_loc):
        # (b, h, Ls, d) → (b, h/n, L, d): split heads across devices,
        # concatenate the sequence shards
        def scatter_heads(x):
            return lax.all_to_all(x, axis, split_axis=1, concat_axis=2, tiled=True)

        def gather_heads(x):
            return lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)

        qh = scatter_heads(q_loc)
        kh = scatter_heads(k_loc)
        vh = scatter_heads(v_loc)
        ctx = _local_causal_attention(qh, kh, vh, sm)
        return gather_heads(ctx.astype(q_loc.dtype))

    spec = P(None, None, axis, None)
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )(q, k, v)
