"""Quantized conv-net family (CIFAR-class tasks, BASELINE.json configs[1]).

A compact VGG-ish net with binary or int4 QAT convolutions — the conv
analogue of the reference's quantized-layer usage (its tests exercise
``BinaryConv2dCutlass`` / ``Q4Conv2dCutlass`` on CIFAR-shaped tensors;
there is no in-tree conv example).  First and last layers stay fp, the
standard binary-net recipe.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers.conv import BinaryConv2d, Q4Conv2d


class QuantConvNet(nn.Module):
    """conv(fp) → [quant conv blocks] → pool → fp head.

    ``bits`` ∈ {1, 4}: binary XNOR convs or int4 QAT convs.
    """

    n_classes: int = 10
    bits: int = 1
    widths: Sequence[int] = (64, 128, 128, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # LayerNorm instead of BatchNorm: stateless (no mutable batch_stats
        # threading through the functional train step) and it actually
        # normalizes — binary convs saturate the hard_tanh without it.
        Conv = BinaryConv2d if self.bits == 1 else Q4Conv2d
        x = nn.Conv(self.widths[0], (3, 3), use_bias=False, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.activation.hard_tanh(x)
        for i, w in enumerate(self.widths[1:]):
            x = Conv(w, (3, 3), name=f"qconv_{i}")(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.activation.hard_tanh(x)
            if i % 2 == 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.n_classes, dtype=self.dtype)(x)
