"""Binary embedding layer modules.

Parity: ``BinaryEmbeddingCuda`` / ``BinaryEmbeddingBag``
(``qembedding/binary/layer.py:104-556``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.embedding import (
    binary_embedding,
    binary_embedding_bag,
    quantize_binary_embedding,
)
from ..qtensor import BinaryEmbeddingQTensor


class BinaryEmbedding(nn.Module):
    """Bit-packed sign embedding table with per-row scale."""

    vocab_size: int
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, indices: jax.Array) -> jax.Array:
        def init(key):
            w = jax.random.normal(key, (self.vocab_size, self.features)) * 0.02
            return quantize_binary_embedding(w)

        qt: BinaryEmbeddingQTensor = self.param("qweight", init)
        return binary_embedding(indices, qt).astype(self.dtype)


class BinaryEmbeddingBag(nn.Module):
    """Pooled binary embedding (mean or majority vote)."""

    vocab_size: int
    features: int
    mode: str = "mean"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, indices: jax.Array) -> jax.Array:
        def init(key):
            w = jax.random.normal(key, (self.vocab_size, self.features)) * 0.02
            return quantize_binary_embedding(w)

        qt: BinaryEmbeddingQTensor = self.param("qweight", init)
        return binary_embedding_bag(indices, qt, mode=self.mode).astype(self.dtype)
