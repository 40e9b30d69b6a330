"""Binary embedding op: bit-packed table lookup with sparse-update gradients.

Parity target: ``qembedding/binary/layer.py:104-216`` (``BinaryEmbeddingCuda``)
— the table is stored as sign bits packed 32:1 (uint32 here vs uint8 in the
reference; TPU lanes prefer 32-bit words) plus a per-row fp scale.  Forward
is index-select + unpack-to-±scale; backward accumulates dense fp grads into
``grad_shadow`` (rows not indexed get exact zeros, which the optimizer uses
as the reference's ``active_indices`` mask for its sparse XOR update,
``model_helper.py:429-434``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..qtensor import BinaryEmbeddingQTensor, qtensor_cotangent
from . import packing

Array = jax.Array


def quantize_binary_embedding(weight: Array) -> BinaryEmbeddingQTensor:
    """fp table (vocab, dim) → packed signs + per-row L1 scale
    (parity: per-row scale init in ``qembedding/binary/layer.py``)."""
    w = weight.astype(jnp.float32)
    scale = jnp.mean(jnp.abs(w), axis=1, keepdims=True)
    padded, _ = packing.pad_to_multiple(w, 1, 32, value=-1.0)
    return BinaryEmbeddingQTensor(
        data=packing.pack_signs(padded),
        scale=scale,
        dim=weight.shape[1],
    )


@jax.custom_vjp
def binary_embedding(indices: Array, qt: BinaryEmbeddingQTensor) -> Array:
    """Lookup: ``(..., ) int`` indices → ``(..., dim)`` ±scale embeddings."""
    return _embed_fwd_math(indices, qt)


def _embed_fwd_math(indices, qt):
    dim = qt.logical_shape[1]
    rows = qt.data[indices]  # gather packed rows
    signs = packing.unpack_signs(rows)[..., :dim]
    return signs * qt.scale[indices]


def _embed_fwd(indices, qt):
    return _embed_fwd_math(indices, qt), (indices, qt)


def _embed_bwd(res, g):
    indices, qt = res
    vocab, dim = qt.logical_shape
    flat_idx = indices.reshape(-1)
    flat_g = g.reshape(-1, dim).astype(jnp.float32)
    dense = jnp.zeros((vocab, dim), jnp.float32).at[flat_idx].add(flat_g)

    grad_qt = qtensor_cotangent(qt, dense if qt.grad_shadow is not None else None)
    return np.zeros(indices.shape, dtype=jax.dtypes.float0), grad_qt


binary_embedding.defvjp(_embed_fwd, _embed_bwd)


def binary_embedding_bag(indices: Array, qt: BinaryEmbeddingQTensor, mode: str = "mean") -> Array:
    """Majority-vote / mean pooled binary embedding bag.

    Parity: ``BinaryEmbeddingBag`` (``qembedding/binary/layer.py:364-556``) —
    pools the ±1 sign vectors of a bag of indices; 'mean' averages the scaled
    vectors, 'majority' returns the sign of the vote.
    ``indices``: ``(batch, bag)``.
    """
    emb = binary_embedding(indices, qt)  # (batch, bag, dim)
    if mode == "mean":
        return jnp.mean(emb, axis=1)
    if mode == "majority":
        return jnp.sign(jnp.sum(jnp.sign(emb), axis=1) + 0.5)
    raise ValueError(f"unknown mode {mode}")
