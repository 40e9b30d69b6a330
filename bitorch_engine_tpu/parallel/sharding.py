"""Sharding rules for QTensor pytrees (GSPMD/pjit).

Greenfield component (reference has no distributed layer, SURVEY.md §2.3).
The central subtlety (SURVEY.md §7 hard part 4): one int32 word of an
MPQTensor packs ``32 / w_bit`` logical K-rows, and quant groups span
``group_size`` K-rows — so the *K axis must not be sharded* below
``group_size × (32 / w_bit)`` granularity.  The default strategy therefore
shards packed weights, scales and zeros along the **output-features (N)**
axis only (tensor parallel), which keeps every K-group intact per shard and
requires a single ``psum``/``reduce_scatter`` after the matmul.

Column-parallel vs row-parallel for transformer blocks follows the Megatron
convention: qkv/gate/up projections shard N (column), o/down projections
shard K — for MPQ row-parallel layers we shard the packed rows at
group-aligned boundaries, which :func:`mpq_row_parallel_spec` checks.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..qtensor import (
    BinaryEmbeddingQTensor,
    BinaryQTensor,
    IntQTensor,
    MBWQTensor,
    MPQTensor,
    QTensorBase,
)

Array = jax.Array


def mpq_column_parallel_spec(qt: MPQTensor, axis: str = "tp") -> "MPQTensor":
    """PartitionSpecs for an N-sharded (column-parallel) MPQTensor."""
    return MPQTensor(
        packed=P(None, axis),
        scales=P(None, axis),
        zeros=P(None, axis),  # asym packed zeros are (G, N/32*b): N-sharded too
        g_idx=None if qt.g_idx is None else P(None),
        q_perm=None if qt.q_perm is None else P(None),
        w_bit=qt.w_bit,
        group_size=qt.group_size,
        asym=qt.asym,
        layout=qt.layout,
        grad_shadow=None if qt.grad_shadow is None else P(None, axis),
    )


def mpq_row_parallel_spec(qt: MPQTensor, axis: str = "tp", n_shards: int = 1) -> "MPQTensor":
    """PartitionSpecs for a K-sharded (row-parallel) MPQTensor.

    Requires the packed rows and groups to divide evenly: each shard must own
    whole quant groups (scales/zeros co-shard on G) and whole int32 words.
    """
    kw = qt.packed.shape[0]
    g = qt.scales.shape[0]
    if n_shards > 1 and (kw % n_shards or g % n_shards):
        raise ValueError(
            f"row-parallel needs packed rows ({kw}) and groups ({g}) divisible "
            f"by shards ({n_shards}); pad K or use column-parallel"
        )
    return MPQTensor(
        packed=P(axis, None),
        scales=P(axis, None),
        zeros=P(axis, None),
        g_idx=None if qt.g_idx is None else P(axis),
        q_perm=None if qt.q_perm is None else P(axis),
        w_bit=qt.w_bit,
        group_size=qt.group_size,
        asym=qt.asym,
        layout=qt.layout,
        grad_shadow=None if qt.grad_shadow is None else P(axis, None),
    )


def _default_qtensor_spec(qt: QTensorBase, axis: str = "tp"):
    if isinstance(qt, MPQTensor):
        return mpq_column_parallel_spec(qt, axis)
    if isinstance(qt, BinaryQTensor):
        # (N, K) / (N, K/32): shard output features
        return qt.replace(
            data=P(axis, None),
            scale_w=P(),
            grad_shadow=None if qt.grad_shadow is None else P(axis, None),
        )
    if isinstance(qt, IntQTensor):
        return qt.replace(
            data=P(axis, None),
            scale_w=P(),
            grad_shadow=None if qt.grad_shadow is None else P(axis, None),
        )
    if isinstance(qt, BinaryEmbeddingQTensor):
        return qt.replace(
            data=P(axis, None),
            scale=P(axis, None),
            grad_shadow=None if qt.grad_shadow is None else P(axis, None),
        )
    if isinstance(qt, MBWQTensor):
        return qt.replace(
            segments=tuple(mpq_column_parallel_spec(s, axis) for s in qt.segments),
            q_perm=None if qt.q_perm is None else P(None),
            channel_scale=None if qt.channel_scale is None else P(None),
            grad_shadow=None if qt.grad_shadow is None else P(None, axis),
        )
    raise TypeError(type(qt))


def make_sharding_rules(
    rules: Dict[str, Any],
    default_axis: str = "tp",
) -> Callable:
    """Build a path→spec function from regex rules, SNIPPETS.md-style.

    ``rules`` maps path regexes (matched against '/'-joined param paths with
    layer indices collapsed to '*') to either a PartitionSpec (fp leaves) or
    one of 'column' / 'row' / 'replicated' for QTensor leaves.
    """

    def normalize(path: str) -> str:
        return re.sub(r"\b\d+\b", "*", path)

    def spec_for(path: str, leaf):
        key = normalize(path)
        choice = None
        for pat, val in rules.items():
            if re.search(pat, key):
                choice = val
                break
        if isinstance(leaf, QTensorBase):
            if choice == "row":
                return mpq_row_parallel_spec(leaf, default_axis)
            if choice == "replicated":
                return jax.tree_util.tree_map(lambda _: P(), leaf)
            return _default_qtensor_spec(leaf, default_axis)
        if choice is None or isinstance(choice, str):
            return P()
        return choice

    return spec_for


def shard_params(params, mesh: Mesh, rule_fn: Optional[Callable] = None, axis: str = "tp"):
    """Apply NamedShardings to a params pytree (QTensor-aware).

    Returns the resharded params (device_put with the computed shardings).
    """
    specs = partition_specs(params, rule_fn, axis)

    def to_sharding(spec):
        return NamedSharding(mesh, spec)

    shardings = jax.tree_util.tree_map(to_sharding, specs)
    return jax.device_put(params, shardings)


def optimizer_partition_specs(
    opt_state, params, tp_axis: str = "tp", fsdp_axis: Optional[str] = "fsdp"
):
    """PartitionSpecs for a DiodeState matching a sharded params tree.

    Optimizer moments have the *logical* (K, N) weight shape; they co-shard
    with the weight's output axis over ``tp_axis`` and (ZeRO/FSDP-style,
    greenfield vs the reference which keeps fp32 state replicated on one
    GPU) over ``fsdp_axis`` on the K axis when a mesh axis is available.
    """
    from ..optim.diode import DiodeState

    def leaf_state_spec(st, p):
        spec2d = P(fsdp_axis, tp_axis) if fsdp_axis else P(None, tp_axis)

        def moment_spec(arr):
            if hasattr(arr, "ndim") and arr.ndim == 2:
                return spec2d
            return P()

        if isinstance(st, dict):
            return {
                kk: jax.tree_util.tree_map(moment_spec, vv)
                for kk, vv in st.items()
            }
        return jax.tree_util.tree_map(moment_spec, st)

    p_leaves, treedef = jax.tree_util.tree_flatten(
        params, is_leaf=lambda x: isinstance(x, QTensorBase)
    )
    s_leaves = treedef.flatten_up_to(opt_state.leaf_states)
    new_states = [leaf_state_spec(s, p) for s, p in zip(s_leaves, p_leaves)]
    return DiodeState(
        step=P(),
        leaf_states=jax.tree_util.tree_unflatten(treedef, new_states),
    )


def partition_specs(params, rule_fn: Optional[Callable] = None, axis: str = "tp"):
    """Compute a PartitionSpec pytree matching ``params`` structure."""

    def is_q(x):
        return isinstance(x, QTensorBase)

    flat, treedef = jax.tree_util.tree_flatten_with_path(params, is_leaf=is_q)
    out = []
    for path, leaf in flat:
        pathstr = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if rule_fn is not None:
            out.append(rule_fn(pathstr, leaf))
        elif is_q(leaf):
            out.append(_default_qtensor_spec(leaf, axis))
        else:
            out.append(P())
    return jax.tree_util.tree_unflatten(treedef, out)
