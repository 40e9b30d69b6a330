"""Collective/compute overlap for the dequant-GEMM hot loop.

The BASELINE north star asks for "all-gather/reduce-scatter overlapped with
the dequant-GEMM hot loop" — a capability the reference does not have at all
(SURVEY.md §2.3: no distributed code anywhere in ``bitorch_engine/``).  On
TPU the idiomatic construction is a *ring* matmul under ``shard_map``: the
output accumulator rotates around the ICI ring with ``lax.ppermute`` while
each device runs the fused dequant matmul
(:func:`~bitorch_engine_tpu.ops.mpq_linear.mpq_linear`) for the next column
chunk — XLA issues the permute asynchronously, so communication for chunk
``i`` rides under the dequant+MXU work of chunk ``i+1``.  This is the
manual-overlap analogue of the plain ``psum`` row-parallel layer in
``parallel/sharding.py`` (which relies on the latency-hiding scheduler
instead).

Numerics match the unsharded matmul to f32 reduction-reorder tolerance
(cross-device partials add in ring order) — tested on the 8-device CPU mesh
in ``tests/test_overlap.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.mpq_linear import mpq_linear
from ..ops.quant import slice_mpq_n
from ..qtensor import MPQTensor, QTensorBase

Array = jax.Array


def ring_reduce_scatter_mpq(
    x_local: Array, qt_local: MPQTensor, axis_name: str
) -> Array:
    """Row-parallel dequant matmul with a ring reduce-scatter epilogue.

    Inside ``shard_map`` over ``axis_name`` with D devices:

    * ``x_local``: ``(..., K/D)`` — this device's slice of the activations.
    * ``qt_local``: MPQTensor ``(K/D, N)`` — this device's K-rows, all N.
    * returns ``(..., N/D)`` — this device's column chunk of the summed
      output (chunk ``axis_index``), i.e. the reduce-scatter of the full
      row-parallel product.

    Ring schedule (standard reduce-scatter): at step ``s`` device ``i``
    computes its local partial for column chunk ``(i - s - 1) mod D`` and
    adds it to the accumulator arriving from its ring predecessor (which
    holds the same chunk's partials from the devices upstream); after D
    steps the accumulator sitting on device ``i`` is chunk ``i`` of the full
    sum.  The ``ppermute`` of step ``s`` overlaps the dequant matmul of
    step ``s+1``.

    Cross-device accumulation happens in ring order, so results match the
    unsharded matmul to f32-reduction-reordering tolerance (the per-chunk
    dequant itself is the exact kernel math).
    """
    d = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    n = qt_local.out_features
    if n % d:
        raise ValueError(f"N={n} not divisible by ring size {d}")
    n_per = n // d
    perm = [(i, (i + 1) % d) for i in range(d)]

    # packed-layout slices must be static: materialize the d candidate
    # column chunks as switch branches and select by the traced chunk id
    branches = [
        functools.partial(
            lambda c, xl, qtl: mpq_linear(xl, slice_mpq_n(qtl, c * n_per, n_per)),
            c,
        )
        for c in range(d)
    ]

    acc = None
    for s in range(d):
        chunk = jnp.mod(idx - s - 1, d)
        part = lax.switch(chunk, branches, x_local, qt_local)
        if acc is None:
            acc = part
        else:
            acc = lax.ppermute(acc, axis_name, perm) + part
    return acc


def ring_row_parallel_mpq(
    x: Array,
    qt: MPQTensor,
    mesh: Mesh,
    axis: str = "tp",
    out_sharding: Optional[P] = None,
) -> Array:
    """Convenience wrapper: shard x on K and qt on K-rows over ``axis``,
    run :func:`ring_reduce_scatter_mpq`, and all-gather the column chunks
    back to a replicated output (the second collective also rides the ring).

    Matches ``mpq_linear(x, qt)`` to f32 reduction-reorder tolerance — used
    by tests and as the template for wiring manual overlap into a serving
    step.
    """
    from jax import shard_map

    d = mesh.shape[axis]
    k, n = qt.logical_shape
    # grad_shadow must not ride into the shard_map closure (a training-sized
    # fp buffer would lower as a jit constant); metadata row maps can't be
    # split across K-shards at all
    qt = qt.replace(grad_shadow=None)
    if qt.g_idx is not None or qt.q_perm is not None:
        raise ValueError(
            "ring_row_parallel_mpq: act-order tensors (g_idx/q_perm) cannot "
            "shard along K"
        )

    def body(x_l, packed, scales, zeros):
        qt_l = qt.replace(packed=packed, scales=scales, zeros=zeros)
        out_chunk = ring_reduce_scatter_mpq(x_l, qt_l, axis)
        return lax.all_gather(out_chunk, axis, axis=-1, tiled=True)

    # shard only the contraction (last) axis of x — serving activations are
    # (batch, seq, K), tests use (rows, K); leading axes stay replicated
    lead = (None,) * (x.ndim - 1)
    in_specs = (
        P(*lead, axis),
        P(axis, None),
        P(axis, None),
        P(axis, None),
    )
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(*lead, None),
        check_vma=False,
    )
    if k % (d * qt.group_size):
        raise ValueError("K must split into whole groups per device")
    return fn(x, qt.packed, qt.scales, qt.zeros)
