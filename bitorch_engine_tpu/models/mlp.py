"""Binary/low-bit MLP model family (MNIST-class tasks).

Parity target: the reference MNIST example (``examples/mnist/train_mnist.py:22-56``)
— a 2-layer MLP whose hidden layer is a quantized linear (1/4/8-bit) trained
end-to-end with DiodeMix.  This is BASELINE.json configs[0] and the
minimum end-to-end slice of the engine (SURVEY.md §7 stage 3).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers.linear import BinaryLinear, Q4Linear, Q8Linear


class QuantMLP(nn.Module):
    """fc1 (fp) → hardtanh → quantized fc2 → fp head.

    ``bits`` selects the quantized hidden layer: 1 (BinaryLinear),
    4 (Q4Linear) or 8 (Q8Linear); mirrors the reference example's
    ``--bits`` flag (``train_mnist.py:32-49``).
    """

    hidden: int = 1024
    n_classes: int = 10
    bits: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.activation.hard_tanh(x)
        if self.bits == 1:
            x = BinaryLinear(self.hidden, dtype=self.dtype)(x)
        elif self.bits == 4:
            x = Q4Linear(self.hidden, dtype=self.dtype)(x)
        elif self.bits == 8:
            x = Q8Linear(self.hidden, dtype=self.dtype)(x)
        else:
            raise ValueError(f"unsupported bits: {self.bits}")
        x = nn.activation.hard_tanh(x)
        x = nn.Dense(self.n_classes, dtype=self.dtype)(x)
        return x
