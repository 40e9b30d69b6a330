"""Mixture-of-Experts with quantized experts + expert parallelism.

Greenfield component (the reference supports dense models only; EP is the
last axis of the engine's parallelism surface after dp/fsdp/tp/sp/pp).
TPU-native design:

* **experts are packed QTensors** — each expert is a SwiGLU MLP whose
  gate/up/down projections are :class:`MPQTensor`s, stacked on a leading
  ``E`` axis (:func:`stack_experts`) and sharded ``P('ep', ...)`` so each
  expert-parallel device holds ``E/ep`` experts' packed weights;
* **top-k routing with static capacity**: every expert processes exactly
  ``C`` token slots — static shapes, no data-dependent control flow.
  ``capacity_factor=None`` (the serving default) sets ``C = T`` which is
  provably drop-free (a token routes to an expert at most once), making the
  routed forward equal to the dense Mixtral forward; a float gives
  Switch/GShard-style ``C = ceil(T·k/E · capacity_factor)`` where overflow
  routes are dropped (their gate weight contributes nothing) — the standard
  training trade, surfaced via the returned ``dropped_frac``;
* **Mixtral gate semantics** (``renormalize=True``): the selected top-k
  gates renormalize to sum to 1 per token;
* dispatch/combine are scatter/gather on a dense ``(E, C, d)`` buffer;
  under a sharded ``ep`` axis XLA lowers them to all-to-alls over ICI.

The per-expert MLP applies :func:`mpq_linear` on each stacked slice in a
static Python loop (E is small), so the fused dequant kernel serves MoE
decode unchanged.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .mpq_linear import mpq_linear
from .quant import quantize_mpq

Array = jax.Array


def init_moe_experts(
    key,
    num_experts: int,
    hidden: int,
    intermediate: int,
    w_bit: int = 4,
    group_size: int = 64,
    scale: float = 0.02,
    stack: bool = True,
):
    """Random-init ``E`` quantized SwiGLU experts.

    ``stack=True`` returns the stacked pytree (explicit EP sharding);
    ``stack=False`` returns the tuple-of-experts form (model params —
    relayout/checkpointing treat each expert's MPQTensors normally)."""
    experts = []
    for e in range(num_experts):
        kg, ku, kd, key = jax.random.split(key, 4)
        experts.append(
            {
                "gate": quantize_mpq(
                    jax.random.normal(kg, (hidden, intermediate)) * scale,
                    w_bit=w_bit, group_size=group_size,
                ),
                "up": quantize_mpq(
                    jax.random.normal(ku, (hidden, intermediate)) * scale,
                    w_bit=w_bit, group_size=group_size,
                ),
                "down": quantize_mpq(
                    jax.random.normal(kd, (intermediate, hidden)) * scale,
                    w_bit=w_bit, group_size=group_size,
                ),
            }
        )
    return stack_experts(experts) if stack else tuple(experts)


def stack_experts(experts):
    """Stack per-expert pytrees on a new leading E axis (shard ``P('ep')``)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *experts)


def _expert_slice(experts, e: int):
    """Expert ``e`` from either form: a tuple/list of per-expert pytrees
    (the model-param form — relayout/checkpointing see ordinary
    MPQTensors) or a stacked pytree (the explicit-EP form)."""
    if isinstance(experts, (tuple, list)):
        return experts[e]
    return jax.tree_util.tree_map(lambda a: a[e], experts)


def num_experts(experts) -> int:
    if isinstance(experts, (tuple, list)):
        return len(experts)
    return jax.tree_util.tree_leaves(experts)[0].shape[0]


def _expert_mlp(exp, x):
    h = jax.nn.silu(mpq_linear(x, exp["gate"]).astype(jnp.float32)).astype(
        x.dtype
    ) * mpq_linear(x, exp["up"])
    return mpq_linear(h, exp["down"])


def moe_mlp(
    x: Array,
    router_w: Array,
    experts,
    top_k: int = 2,
    capacity_factor: Optional[float] = 1.25,
    renormalize: bool = True,
) -> Tuple[Array, Array, Array]:
    """Top-k routed MoE MLP.  ``x``: (..., d); ``router_w``: (d, E);
    ``experts``: stacked pytree from :func:`stack_experts`.

    ``renormalize=True`` is Mixtral semantics: the k selected gates are
    renormalized to sum to 1 per token (equivalently, softmax over the
    selected top-k logits — softmax is monotone so the selection is the
    same).  ``renormalize=False`` weights by raw full-softmax probabilities
    (Switch/GShard style).

    ``capacity_factor=None`` is **drop-free**: ``C = T`` (each token routes
    to an expert at most once, so T slots can never overflow) — the correct
    serving/inference configuration where routed outputs must equal the
    dense Mixtral forward.  A float sets Switch-style static capacity
    ``C = ceil(T·k/E · capacity_factor)`` where overflowing routes are
    dropped (their gate contribution zeroed) — the standard training trade.

    Returns ``(y, aux_loss, dropped_frac)`` — ``aux_loss`` is the standard
    load-balancing term (mean fraction-routed × mean router prob, scaled by
    E²·k⁻¹ so a uniform router scores 1.0); ``dropped_frac`` is the fraction
    of (token, choice) routes dropped to capacity (0 when drop-free)."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    T = x2.shape[0]
    E = router_w.shape[1]

    logits = jnp.dot(x2.astype(jnp.float32), router_w.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)  # (T, E)
    gate_vals, gate_idx = jax.lax.top_k(probs, top_k)  # (T, k)
    if renormalize:
        gate_vals = gate_vals / jnp.sum(gate_vals, axis=-1, keepdims=True)

    if capacity_factor is None:
        C = T
    else:
        C = max(1, min(T, math.ceil(T * top_k / E * capacity_factor)))
    flat_e = gate_idx.reshape(-1)  # (T·k,) expert ids, row-major by token
    onehot = jax.nn.one_hot(flat_e, E, dtype=jnp.int32)  # (T·k, E)
    # position of each (token, choice) within its expert's capacity buffer
    pos_in_e = jnp.take_along_axis(
        jnp.cumsum(onehot, axis=0) - onehot, flat_e[:, None], axis=1
    )[:, 0]
    keep = pos_in_e < C
    pos_c = jnp.where(keep, pos_in_e, C - 1)

    tok_idx = jnp.repeat(jnp.arange(T, dtype=jnp.int32), top_k)
    disp = jnp.zeros((E, C, d), x2.dtype)
    disp = disp.at[flat_e, pos_c].add(
        jnp.where(keep[:, None], x2[tok_idx], 0).astype(x2.dtype)
    )

    # per-expert quantized MLP; static loop keeps each expert's packed
    # weights a single MPQTensor (fused kernel applies per expert)
    outs = jnp.stack(
        [_expert_mlp(_expert_slice(experts, e), disp[e]) for e in range(E)]
    )  # (E, C, d)

    gathered = outs[flat_e, pos_c]  # (T·k, d)
    w = (gate_vals.reshape(-1) * keep).astype(jnp.float32)
    y = jnp.zeros((T, d), jnp.float32).at[tok_idx].add(
        gathered.astype(jnp.float32) * w[:, None]
    )

    # load-balance aux (Switch eq. 4): E · Σ_e f_e · P_e, normalized by k
    frac = jnp.mean(
        jax.nn.one_hot(gate_idx, E, dtype=jnp.float32).sum(1), axis=0
    )  # (E,) expected ~k/E
    mean_p = jnp.mean(probs, axis=0)
    aux = jnp.sum(frac * mean_p) * E / top_k
    dropped = 1.0 - jnp.mean(keep.astype(jnp.float32))
    return y.astype(x.dtype).reshape(*lead, d), aux, dropped


def expert_shardings(mesh, experts, axis: str = "ep"):
    """Shard the stacked expert pytree's leading E axis over ``axis``."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.tree_util.tree_map(
        lambda a: NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1)))),
        experts,
    )
