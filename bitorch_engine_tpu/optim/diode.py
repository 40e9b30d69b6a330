"""DiodeMix: the engine's optimizer for quantized + fp parameters.

Functional re-design of the reference's ``optim/diode_beta.py:37-196`` +
``utils/model_helper.py:363-532`` (``qweight_update_fn``).  One optimizer
handles four parameter regimes, dispatched on the QTensor subclass (the
reference dispatches on ``nn.Parameter`` subclasses):

* **fp leaves** — AdamW (betas (0.99, 0.9999), decoupled weight decay,
  optional bias correction), parity ``diode_beta.py:160-194``.
* **BinaryQTensor** — Diode sign descent: dual EMAs + sign-flip mask,
  parity ``model_helper.py:437-449``; EMA state init
  ``exp_avg_s = -sign(w)·U(0,1e-3)`` (``diode_beta.py:143-148``).
* **IntQTensor** (q4/q8 QAT) — AdamW on the dequantized int8 payload, then
  requantize via ``nv_tensor_quant``, parity ``model_helper.py:452-483``.
* **MPQTensor** — gradient read from ``grad_shadow`` (the reference's
  ``privileged_grad``, ``diode_beta.py:124-125``), optional GaLore
  projection, AdamW moments, zero-point refresh every 5 steps
  (``model_helper.py:521-522`` + ``update_zeros`` :330-360), repack to
  int32, parity ``model_helper.py:485-530``.

Everything is pure: ``init`` builds the state pytree, ``update`` returns new
params + state.  An optax-compatible wrapper (:func:`diode_mix`) exposes it
as a ``GradientTransformation`` returning additive updates (int deltas wrap
exactly in two's-complement, so ``optax.apply_updates`` reconstructs the new
packed payloads bit-exactly).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..ops import packing
from ..ops.quant import nv_tensor_quant, repack_mpq
from ..qtensor import (
    BinaryEmbeddingQTensor,
    BinaryQTensor,
    IntQTensor,
    MBWQTensor,
    MPQTensor,
    QTensorBase,
)
from .galore import (
    GaLoreConfig,
    galore_init,
    galore_project,
    galore_project_back,
)

Array = jax.Array


@struct.dataclass
class DiodeHyperParams:
    lr: float = 1e-4
    beta1: float = struct.field(pytree_node=False, default=0.99)
    beta2: float = struct.field(pytree_node=False, default=0.9999)
    eps: float = struct.field(pytree_node=False, default=1e-6)
    weight_decay: float = struct.field(pytree_node=False, default=0.0)
    correct_bias: bool = struct.field(pytree_node=False, default=True)
    zeros_update_interval: int = struct.field(pytree_node=False, default=5)
    galore: Optional[GaLoreConfig] = struct.field(pytree_node=False, default=None)


class DiodeState(NamedTuple):
    step: Array
    leaf_states: Any  # pytree matching params (QTensor nodes → dict of EMAs)


def _is_q(x):
    return isinstance(x, QTensorBase)


def _galore_eligible(leaf, rank: int) -> bool:
    """GaLore applies to MPQ tensors AND plain fp matrices, matching the
    reference which projects any param group carrying ``rank``
    (``diode_beta.py:133-139``) — its LLM example puts both the MPQ qweights
    and the fp projections in such groups.  1-D params (biases, norms) and
    matrices smaller than the rank are left full-rank."""
    if isinstance(leaf, MPQTensor):
        return True
    if isinstance(leaf, QTensorBase):
        return False
    shape = getattr(leaf, "shape", ())
    return len(shape) == 2 and min(shape) > rank


def _leaf_init(leaf, key):
    if isinstance(leaf, BinaryQTensor):
        w = leaf.data.astype(jnp.float32)
        delta = jax.random.uniform(key, w.shape, jnp.float32) * 1e-3
        return {
            "exp_avg_l": jnp.zeros_like(w),
            "exp_avg_s": -(jnp.sign(w) * delta),
        }
    if isinstance(leaf, BinaryEmbeddingQTensor):
        shape = leaf.logical_shape
        delta = jax.random.uniform(key, shape, jnp.float32) * 1e-3
        signs = jnp.sign(leaf.data.astype(jnp.float32)) if leaf.data.dtype != jnp.uint32 else None
        from ..ops.packing import unpack_signs

        w_sign = unpack_signs(leaf.data)[:, : shape[1]]
        return {"exp_avg_s": -(w_sign * delta)}
    if isinstance(leaf, (IntQTensor, MPQTensor, MBWQTensor)):
        shape = leaf.logical_shape
        return {
            "exp_avg_l": jnp.zeros(shape, jnp.float32),
            "exp_avg_s": jnp.zeros(shape, jnp.float32),
        }
    # fp leaf
    return {
        "exp_avg_l": jnp.zeros_like(leaf, dtype=jnp.float32),
        "exp_avg_s": jnp.zeros_like(leaf, dtype=jnp.float32),
    }


def diode_init(params, seed: int = 0, hp: Optional[DiodeHyperParams] = None) -> DiodeState:
    hp = hp or DiodeHyperParams()
    leaves, treedef = jax.tree_util.tree_flatten(params, is_leaf=_is_q)
    keys = jax.random.split(jax.random.PRNGKey(seed), max(len(leaves), 1))
    states = []
    for leaf, key in zip(leaves, keys):
        st = _leaf_init(leaf, key)
        if hp.galore is not None and _galore_eligible(leaf, hp.galore.rank):
            shape = (
                leaf.logical_shape if isinstance(leaf, MPQTensor) else leaf.shape
            )
            st["galore"] = galore_init(shape, hp.galore.rank)
            # moments live in the projected space
            gs = st["galore"]
            pshape = (
                (shape[0], gs.ortho.shape[0])
                if gs.right
                else (gs.ortho.shape[1], shape[1])
            )
            st["exp_avg_l"] = jnp.zeros(pshape, jnp.float32)
            st["exp_avg_s"] = jnp.zeros(pshape, jnp.float32)
        states.append(st)
    return DiodeState(
        step=jnp.zeros((), jnp.int32),
        leaf_states=jax.tree_util.tree_unflatten(treedef, states),
    )


def _adamw_norm_grad(grad, st, hp, step):
    """Shared AdamW moment update; returns (norm_grad, step_size, new_state)."""
    exp_avg_l = st["exp_avg_l"] * hp.beta1 + grad * (1.0 - hp.beta1)
    exp_avg_s = st["exp_avg_s"] * hp.beta2 + grad * grad * (1.0 - hp.beta2)
    denom = jnp.sqrt(exp_avg_s) + hp.eps
    step_size = hp.lr
    if hp.correct_bias:
        bc1 = 1.0 - hp.beta1 ** step.astype(jnp.float32)
        bc2 = 1.0 - hp.beta2 ** step.astype(jnp.float32)
        step_size = hp.lr * jnp.sqrt(bc2) / bc1
    return exp_avg_l / denom, step_size, {**st, "exp_avg_l": exp_avg_l, "exp_avg_s": exp_avg_s}


def _update_fp(param, grad, st, hp, step):
    g = grad.astype(jnp.float32)
    galore_state = st.get("galore")
    if galore_state is not None:
        g, galore_state = galore_project(galore_state, g, step, hp.galore)
    norm_grad, step_size, st = _adamw_norm_grad(g, st, hp, step)
    if galore_state is not None:
        norm_grad = galore_project_back(galore_state, norm_grad, hp.galore)
        st = {**st, "galore": galore_state}
    w = param.astype(jnp.float32) - step_size * norm_grad
    if hp.weight_decay > 0.0:
        w = w - hp.lr * hp.weight_decay * w
    return w.astype(param.dtype), st


def _update_binary(qt: BinaryQTensor, grad_qt, st, hp, step):
    """Sign-descent with dual EMAs + flip mask (model_helper.py:437-449)."""
    g = grad_qt.grad_shadow.astype(jnp.float32)
    exp_avg_l = st["exp_avg_l"] + (g - st["exp_avg_l"]) * (1.0 - hp.beta1)
    v = jnp.sign(exp_avg_l) * hp.lr
    exp_avg_s = st["exp_avg_s"] + (v - st["exp_avg_s"]) * (1.0 - hp.beta2)
    u = -jnp.sign(exp_avg_s)
    u = jnp.where(u == 0, 1.0, u)
    w = qt.data
    flip = u != jnp.sign(w.astype(jnp.float32))
    new_data = jnp.where(flip, -w, w)
    return (
        qt.replace(data=new_data.astype(qt.data.dtype)),
        {**st, "exp_avg_l": exp_avg_l, "exp_avg_s": exp_avg_s},
    )


def _update_intq(qt: IntQTensor, grad_qt, st, hp, step):
    """AdamW on int8-as-fp payload then requantize (model_helper.py:452-483)."""
    g = grad_qt.grad_shadow.astype(jnp.float32)
    w = qt.data.astype(jnp.float32)
    norm_grad, step_size, st = _adamw_norm_grad(g, st, hp, step)
    w = w - step_size * norm_grad
    if hp.weight_decay > 0.0:
        w = w - hp.lr * hp.weight_decay * w
    # requantize to the payload's bit width (reference uses 8-bit
    # nv_tensor_quant for all n-bit layers; we keep the w_bit range so q4
    # payloads stay 4-bit-valued)
    new_data = nv_tensor_quant(w, num_bits=qt.w_bit)[0]
    return qt.replace(data=new_data.astype(jnp.int8)), st


def _group_mean(x: Array, group_size: int) -> Array:
    k, n = x.shape
    return x.reshape(k // group_size, group_size, n).mean(axis=1)


def _update_mpq(qt: MPQTensor, grad_qt, st, hp, step):
    """Unpack → AdamW → zero refresh every N steps → repack
    (model_helper.py:485-530)."""
    from ..ops.quant import dequantize_mpq

    grad = grad_qt.grad_shadow.astype(jnp.float32)

    galore_state = st.get("galore")
    if galore_state is not None:
        grad, galore_state = galore_project(galore_state, grad, step, hp.galore)

    w = dequantize_mpq(qt, dtype=jnp.float32)
    z_unpacked = None
    if qt.asym:
        z_unpacked = packing.unpack_cols(qt.zeros, qt.w_bit).astype(jnp.float32)

    norm_grad, step_size, st = _adamw_norm_grad(grad, st, hp, step)

    if galore_state is not None:
        norm_grad = galore_project_back(galore_state, norm_grad, hp.galore)
        st = {**st, "galore": galore_state}

    w = w - step_size * norm_grad

    # zero-point refresh on the reference's sparse schedule (:521-522)
    do_zeros = (step % hp.zeros_update_interval) == 0
    k, n = qt.logical_shape

    if qt.asym:
        g = qt.g_idx if qt.g_idx is not None else (jnp.arange(k) // qt.group_size)
        full_z = z_unpacked[g] + step_size * norm_grad
        # per-group mean back to (G, N) (update_zeros, model_helper.py:348-357)
        order = jnp.argsort(g)
        z_grouped = _group_mean(full_z[order], qt.group_size)
        new_z_int = jnp.clip(jnp.round(z_grouped), 1, 2**qt.w_bit).astype(jnp.int32)
        new_zeros_packed = packing.pack_cols(new_z_int, qt.w_bit)
        zeros_packed = jnp.where(do_zeros, new_zeros_packed, qt.zeros)
        z_for_repack = jnp.where(do_zeros, new_z_int, packing.unpack_cols(qt.zeros, qt.w_bit))
        qt2 = qt.replace(zeros=zeros_packed)
        new_packed = repack_mpq(w, qt2, unpacked_zeros=z_for_repack.astype(jnp.float32))
        new_qt = qt2.replace(packed=new_packed)
    else:
        g_mean = _group_mean(step_size * norm_grad, qt.group_size)
        new_zeros = jnp.where(do_zeros, qt.zeros + g_mean.astype(qt.zeros.dtype), qt.zeros)
        qt2 = qt.replace(zeros=new_zeros)
        new_packed = repack_mpq(w, qt2)
        new_qt = qt2.replace(packed=new_packed)

    return new_qt, st


def _update_mbwq(qt: MBWQTensor, grad_qt, st, hp, step):
    """Mixed-bit update: AdamW on the dequantized logical weight, then
    requantize each per-bit-width segment with its own scales/zeros.

    Beyond-reference capability: the reference's ``pack_fp_weight`` raises
    NotImplementedError for channel-mix layouts (``nbit/cuda/utils.py:143-145``),
    so it cannot round-trip MBWQ weights through an optimizer step; the
    segment decomposition here makes the repack exact per segment.
    """
    from ..ops.mbwq_linear import dequantize_mbwq

    grad = grad_qt.grad_shadow.astype(jnp.float32)
    w = dequantize_mbwq(qt, dtype=jnp.float32)  # logical (K, N)
    norm_grad, step_size, st = _adamw_norm_grad(grad, st, hp, step)
    w = w - step_size * norm_grad

    # stored order: gather logical rows by q_perm, then split per segment
    w_stored = w[qt.q_perm] if qt.q_perm is not None else w
    new_segments = []
    off = 0
    do_zeros = (step % hp.zeros_update_interval) == 0
    ng_stored = norm_grad[qt.q_perm] if qt.q_perm is not None else norm_grad
    for seg in qt.segments:
        k_seg = seg.in_features
        seg_w = w_stored[off : off + k_seg]
        g_mean = _group_mean(step_size * ng_stored[off : off + k_seg], seg.group_size)
        new_zeros = jnp.where(do_zeros, seg.zeros + g_mean.astype(seg.zeros.dtype), seg.zeros)
        seg2 = seg.replace(zeros=new_zeros)
        new_segments.append(seg2.replace(packed=repack_mpq(seg_w, seg2)))
        off += k_seg
    return qt.replace(segments=tuple(new_segments)), st


def _update_binary_embedding(qt: BinaryEmbeddingQTensor, grad_qt, st, hp, step):
    """Sparse XOR update on rows touched in the last batch
    (model_helper.py:404-434).  Rows with zero gradient are untouched."""
    g = grad_qt.grad_shadow.astype(jnp.float32)  # dense (vocab, dim)
    active = jnp.any(g != 0.0, axis=1, keepdims=True)  # the reference's active_indices
    # unpack grad sign to ±1·lr then EMA (reference lerp beta2)
    v = jnp.sign(g)
    v = jnp.where(v == 0, -1.0, v) * hp.lr
    exp_avg_s = st["exp_avg_s"] + (v - st["exp_avg_s"]) * (1.0 - hp.beta2)
    binary_grad = exp_avg_s >= 0
    dim = qt.logical_shape[1]
    new_bits = jnp.where(binary_grad, 1.0, -1.0)
    new_packed = packing.pack_signs(
        packing.pad_to_multiple(new_bits, 1, 32, value=-1.0)[0]
    )
    new_data = jnp.where(active, new_packed, qt.data)
    return qt.replace(data=new_data), {**st, "exp_avg_s": exp_avg_s}


def diode_update(grads, state: DiodeState, params, hp: Optional[DiodeHyperParams] = None):
    """One optimizer step: returns ``(new_params, new_state)``."""
    hp = hp or DiodeHyperParams()
    step = state.step + 1

    p_leaves, treedef = jax.tree_util.tree_flatten(params, is_leaf=_is_q)
    g_leaves = treedef.flatten_up_to(grads)
    s_leaves = treedef.flatten_up_to(state.leaf_states)

    new_p, new_s = [], []
    for p, g, s in zip(p_leaves, g_leaves, s_leaves):
        if isinstance(p, BinaryQTensor):
            np_, ns = _update_binary(p, g, s, hp, step)
        elif isinstance(p, BinaryEmbeddingQTensor):
            np_, ns = _update_binary_embedding(p, g, s, hp, step)
        elif isinstance(p, IntQTensor):
            np_, ns = _update_intq(p, g, s, hp, step)
        elif isinstance(p, MPQTensor):
            np_, ns = _update_mpq(p, g, s, hp, step)
        elif isinstance(p, MBWQTensor):
            np_, ns = _update_mbwq(p, g, s, hp, step)
        else:
            np_, ns = _update_fp(p, g, s, hp, step)
        new_p.append(np_)
        new_s.append(ns)

    return (
        jax.tree_util.tree_unflatten(treedef, new_p),
        DiodeState(step=step, leaf_states=jax.tree_util.tree_unflatten(treedef, new_s)),
    )


def _tree_sub(new_params, params):
    """updates = new - old, leaf-wise; int deltas wrap exactly (two's complement)."""

    def sub(a, b):
        if a is None:
            return None
        return a - b

    return jax.tree_util.tree_map(sub, new_params, params)


def diode_mix(
    lr: float = 1e-4,
    betas=(0.99, 0.9999),
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    correct_bias: bool = True,
    galore: Optional[GaLoreConfig] = None,
    seed: int = 0,
) -> optax.GradientTransformation:
    """optax-compatible DiodeMix (apply with ``optax.apply_updates``)."""
    hp = DiodeHyperParams(
        lr=lr,
        beta1=betas[0],
        beta2=betas[1],
        eps=eps,
        weight_decay=weight_decay,
        correct_bias=correct_bias,
        galore=galore,
    )

    def init_fn(params):
        return diode_init(params, seed=seed, hp=hp)

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("diode_mix requires params in update()")
        new_params, new_state = diode_update(grads, state, params, hp)
        return _tree_sub(new_params, params), new_state

    return optax.GradientTransformation(init_fn, update_fn)
