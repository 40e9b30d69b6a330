"""On-device micro-benchmark helpers.

Per-dispatch RPC latency (especially through this sandbox's TPU tunnel, but
also on real deployments) swamps microsecond kernels, so timing loops run
*inside* one jitted ``lax.fori_loop``: one dispatch covers ``iters``
executions.  The input is perturbed per iteration (cheap elementwise add on
the small activation) so XLA cannot hoist the op out of the loop; the big
weight operand is a loop-invariant *input* and is correctly re-read from HBM
every iteration.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def _make_loop(f: Callable):
    @jax.jit
    def loop(x, iters, operands):
        def body(i, carry):
            acc, x = carry
            out = f(x, *operands)
            # consume the WHOLE output (a single-element read would let XLA
            # dead-code-eliminate the computation) and chain the next input
            # on this output (an independent perturbation could be hoisted
            # by algebraic simplification)
            s = jnp.sum(out.astype(jnp.float32))
            x = x + (s * 1e-30).astype(x.dtype)
            return acc + s, x

        acc, _ = lax.fori_loop(0, iters, body, (jnp.float32(0.0), x))
        return acc

    return loop


def time_op(
    f: Callable,
    x: jax.Array,
    *operands,
    iters: int = 100,
    warmup: int = 1,
    reps: int = 3,
) -> float:
    """Seconds per execution of ``f(x, *operands)``, measured on-device.

    Pass weights/QTensors via ``operands`` — NEVER close over device arrays
    (a closed-over array is lowered as an MLIR *constant*, which fetches it
    back to host; through this sandbox's TPU tunnel that takes minutes).

    Uses *differential* timing — per-iteration cost is the slope between a
    short and a long on-device loop — so fixed dispatch latency (large and
    jittery through the tunnel, nonzero everywhere) cancels.
    """
    loop = _make_loop(f)
    lo, hi = max(iters // 10, 2), iters
    for _ in range(max(warmup, 1)):
        float(loop(x, lo, operands))
        float(loop(x, hi, operands))

    # NB: completion is forced by FETCHING the scalar result — under this
    # sandbox's tunneled PJRT client, block_until_ready returns before the
    # device work is done.  Min-per-length first (dispatch-latency spikes
    # are one-sided), then the slope between the two floors.
    def best_of(n_iters):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(x, n_iters, operands))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = best_of(lo)
    t_hi = best_of(hi)
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def time_fn_pytree(f: Callable, args, iters: int = 20, warmup: int = 1) -> float:
    """Seconds per execution for carry-chained step functions (e.g. a decode
    step with KV caches): ``f`` must map the args pytree to a same-structure
    pytree (``new_args = f(args)``), so the loop runs in one dispatch with a
    real data dependence between iterations.  Completion is fetch-forced
    (block_until_ready is unreliable under the sandbox's tunneled client).
    """

    @jax.jit
    def loop(args, n):
        return lax.fori_loop(0, n, lambda i, a: f(a), args)

    def run(n):
        out = loop(args, n)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        return out

    lo, hi = max(iters // 5, 1), iters
    for _ in range(max(warmup, 1)):
        run(lo)
        run(hi)
    t0 = time.perf_counter()
    run(lo)
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(hi)
    t_hi = time.perf_counter() - t0
    return max((t_hi - t_lo) / (hi - lo), 1e-9)
