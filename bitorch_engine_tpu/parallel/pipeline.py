"""Pipeline parallelism: GPipe-style microbatched stage execution.

Greenfield component (SURVEY.md §2.3 — the reference implements no
DP/TP/PP/SP/EP at all; PP is named in the build plan as "PP via
``shard_map`` stages if needed").  TPU-native design:

* the model's layers are split into ``S`` contiguous **stages**; stage
  parameters are stacked on a leading axis and sharded ``P('pp', ...)``,
  so each device along the ``pp`` mesh axis holds exactly its stage;
* the batch is split into ``M`` **microbatches**.  Inside ``shard_map``
  every device runs the same schedule of ``S + M - 1`` ticks: at tick
  ``t`` the device holding stage ``s`` processes microbatch ``t - s``
  (when in range) and hands its activation to stage ``s+1`` with ONE
  ``lax.ppermute`` per tick — the classic GPipe pipeline with
  ``(S-1)/(M + S - 1)`` bubble overhead;
* the schedule is a ``lax.scan`` over ticks, so the whole pipeline is one
  compiled program and **differentiates end-to-end**: the scan transpose
  runs the reverse schedule and the ``ppermute`` transpose carries
  gradients stage ``s+1`` → ``s`` (tested: grads match the sequential
  model bit-for-bit up to f32 reduction order).

The activation "wire" between stages is a single microbatch-shaped buffer
per device; peak activation memory per device is O(one microbatch), the
point of pipelining.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# the promoted jax.shard_map enforces varying-axis typing on loop carries;
# check_vma=False (passed at the call site) keeps the permissive behavior
# the deleted jax.experimental entry point had
from jax import shard_map

Array = jax.Array


def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    x: Array,
    mesh: Mesh,
    axis: str = "pp",
    num_microbatches: int | None = None,
):
    """Run ``x`` through ``S`` pipelined stages of ``stage_fn``.

    ``stage_fn(params_slice, x_mb) -> y_mb`` applies ONE stage to one
    microbatch (same shape in and out — the transformer-block contract).
    ``stage_params``: pytree whose leaves are stacked on a leading stage
    axis of size ``S = mesh.shape[axis]`` (shard them ``P(axis, ...)``).
    ``x``: (batch, ...) global input; ``num_microbatches`` M must divide
    batch (default M = S).  Returns the pipelined equivalent of applying
    the S stages sequentially.
    """
    S = mesh.shape[axis]
    M = num_microbatches or S
    b = x.shape[0]
    if b % M:
        raise ValueError(f"batch {b} not divisible by microbatches {M}")
    mb = b // M
    xs = x.reshape(M, mb, *x.shape[1:])

    def local_fn(params_loc, xs_loc):
        # params_loc: this stage's params, leading axis 1; xs_loc: the full
        # microbatch queue (replicated — batch memory is the caller's
        # concern; the pipeline's job is bounding *activation* memory)
        s_idx = lax.axis_index(axis)
        p_stage = jax.tree_util.tree_map(lambda a: a[0], params_loc)
        T = S + M - 1
        # carries are device-varying over the pipeline axis (the wire is
        # permuted, outs differ per stage) — mark them so the scan carry
        # types line up (cf. ring_attention.py)
        wire0 = lax.pcast(jnp.zeros_like(xs_loc[0]), (axis,), to='varying')
        outs0 = lax.pcast(jnp.zeros_like(xs_loc), (axis,), to='varying')

        def tick(carry, t):
            wire, outs = carry
            m = t - s_idx  # microbatch index this stage handles at tick t
            active = (m >= 0) & (m < M)
            # stage 0 reads from the queue, others read the incoming wire
            x_in = jnp.where(
                s_idx == 0,
                xs_loc[jnp.clip(t, 0, M - 1)],
                wire,
            )
            y = stage_fn(p_stage, x_in)
            y = jnp.where(active, y, wire)
            # the LAST stage deposits finished microbatches
            upd = lax.dynamic_update_index_in_dim(outs, y, jnp.clip(m, 0, M - 1), 0)
            outs = jnp.where(active & (s_idx == S - 1), upd, outs)
            # hand activations downstream (stage s -> s+1; the wrap-around
            # edge S-1 -> 0 carries garbage that stage 0 never reads)
            perm = [(i, (i + 1) % S) for i in range(S)]
            wire = lax.ppermute(y, axis, perm)
            return (wire, outs), None

        (_, outs), _ = lax.scan(tick, (wire0, outs0), jnp.arange(T))
        # finished microbatches live on the last stage; share them out so
        # every device returns the full output (replicated out_spec)
        outs = lax.psum(
            jnp.where(s_idx == S - 1, outs, jnp.zeros_like(outs)), axis
        )
        return outs

    out = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )(stage_params, xs)
    return out.reshape(b, *x.shape[1:])


def stack_stages(params_list):
    """Stack a list of per-stage param pytrees on a new leading stage axis
    (then ``jax.device_put`` with ``NamedSharding(mesh, P('pp', ...))``)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def stage_shardings(mesh: Mesh, stacked_params, axis: str = "pp"):
    """Shardings placing each stage's slice on its pipeline device."""
    return jax.tree_util.tree_map(
        lambda a: NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1)))),
        stacked_params,
    )
