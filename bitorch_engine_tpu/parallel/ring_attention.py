"""Ring attention: sequence-parallel exact attention over the ICI ring.

Greenfield component (SURVEY.md §5 — the reference has no long-context /
sequence-parallel support at all; its only attention is BMHA's O(L²)
softmax).  Design follows the blockwise/ring-attention recipe referenced in
SURVEY §7: the sequence axis is sharded over mesh axis ``sp``; each device
holds its Q shard and rotates K/V shards around the ring with
``lax.ppermute`` while accumulating streaming-softmax partial results, so
attention memory per device is O(L/n · L/n) and the KV transfers ride ICI
behind the per-block matmuls.

Causal masking uses absolute positions, so rotation order doesn't matter.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

# NB: jax.shard_map (the promoted API) enforces varying-axis typing on loop
# carries that would need pcast-to-varying plumbing on the streaming-softmax
# accumulators; check_vma=False at the call site keeps the permissive
# behavior the deleted jax.experimental entry point had.
from jax import shard_map

Array = jax.Array


def _block_attn(q, k, v, q_pos, k_pos, sm_scale):
    """One (q-block, kv-block) attention piece with running-softmax stats.

    q: (b, h, sq, d); k/v: (b, h, sk, d); returns (out_unnorm, row_max,
    row_sumexp) for streaming combination.
    """
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * sm_scale
    mask = k_pos[None, None, None, :] <= q_pos[None, None, :, None]
    scores = jnp.where(mask, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1)  # (b,h,sq)
    # rows with no visible keys: keep m finite
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(scores - m_safe[..., None])
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=-1)  # (b,h,sq)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    return out.astype(jnp.float32), m_safe, l


def _combine(acc, new):
    """Streaming-softmax combine of two partial attention results."""
    out1, m1, l1 = acc
    out2, m2, l2 = new
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    out = out1 * a1[..., None] + out2 * a2[..., None]
    l = l1 * a1 + l2 * a2
    return out, m, l


def ring_attention(
    q: Array,
    k: Array,
    v: Array,
    mesh: Mesh,
    axis: str = "sp",
    sm_scale: Optional[float] = None,
    causal: bool = True,
) -> Array:
    """Exact (optionally causal) attention with sequence sharded over ``axis``.

    ``q, k, v``: (b, h, L, d) logically; physically sharded P(None, None,
    axis, None).  Returns the same sharding.
    """
    b, h, L, d = q.shape
    n = mesh.shape[axis]
    sm = sm_scale if sm_scale is not None else 1.0 / (d**0.5)

    def local_fn(q_loc, k_loc, v_loc):
        idx = lax.axis_index(axis)
        sq = q_loc.shape[2]
        q_pos = idx * sq + jnp.arange(sq, dtype=jnp.int32)

        def rotate(x):
            perm = [(i, (i + 1) % n) for i in range(n)]
            return lax.ppermute(x, axis, perm)

        def body(step, carry):
            acc, kv, src = carry
            k_cur, v_cur = kv
            k_pos = src * sq + jnp.arange(sq, dtype=jnp.int32)
            new = _block_attn(q_loc, k_cur, v_cur, q_pos, k_pos, sm)
            acc = _combine(acc, new)
            # rotate kv to the next device; track the shard's origin index
            kv = (rotate(k_cur), rotate(v_cur))
            src = ((src - 1) % n).astype(jnp.int32)
            return acc, kv, src

        zero = (
            jnp.zeros((b, h, sq, d), jnp.float32),
            jnp.full((b, h, sq), -jnp.inf),
            jnp.zeros((b, h, sq), jnp.float32),
        )
        # mark the accumulator init as device-varying over the ring axis so
        # the fori_loop carry types match (combined results are varying)
        zero = jax.tree_util.tree_map(lambda a: lax.pcast(a, (axis,), to='varying'), zero)
        (out, m, l), _, _ = lax.fori_loop(
            0, n, body, (zero, (k_loc, v_loc), idx.astype(jnp.int32))
        )
        return (out / jnp.maximum(l, 1e-20)[..., None]).astype(q_loc.dtype)

    spec = P(None, None, axis, None)
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )(q, k, v)
