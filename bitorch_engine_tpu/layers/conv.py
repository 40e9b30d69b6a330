"""Quantized convolution layer modules.

Parity: ``BinaryConv2dCPP/Cutlass`` (``qconv/binary``) and ``Q4Conv2dCutlass``
(``qconv/nbit/cutlass``) — NHWC, per-layer learnable activation scale.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import quant
from ..ops.conv import binary_conv2d, qat_conv2d
from ..qtensor import BinaryQTensor, IntQTensor


def _kaiming_conv(key, shape):
    fan_in = shape[0] * shape[1] * shape[2]
    bound = jnp.sqrt(3.0) / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


class BinaryConv2d(nn.Module):
    """1-bit conv (XNOR-conv semantics on the MXU)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        kh, kw = self.kernel_size

        def init(key):
            w = _kaiming_conv(key, (kh, kw, c, self.features))
            # reuse the binary init on the flattened weight, then reshape
            flat = quant.init_binary_weight(w.reshape(-1, self.features).T)
            return BinaryQTensor(
                data=flat.data.T.reshape(kh, kw, c, self.features),
                scale_w=flat.scale_w,
                in_features=-1,
            )

        qt: BinaryQTensor = self.param("qweight", init)
        scale_a = self.param(
            "scale_a", lambda key: (2.0 * jnp.mean(jnp.abs(x))).astype(self.dtype)
        )
        return binary_conv2d(x, qt, scale_a, self.strides, self.padding)


class Q4Conv2d(nn.Module):
    """4-bit QAT conv (int4 implicit-GEMM analogue)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    w_bit: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        kh, kw = self.kernel_size

        def init(key):
            w = _kaiming_conv(key, (kh, kw, c, self.features))
            flat = quant.init_nbit_weight(w.reshape(-1, self.features).T, self.w_bit)
            return IntQTensor(
                data=flat.data.T.reshape(kh, kw, c, self.features),
                scale_w=flat.scale_w,
                w_bit=self.w_bit,
            )

        qt: IntQTensor = self.param("qweight", init)
        divisor = 5.6345 if self.w_bit == 4 else 11.269
        scale_a = self.param(
            "scale_a",
            lambda key: (2.0 * jnp.mean(jnp.abs(x)) / divisor).astype(self.dtype),
        )
        return qat_conv2d(x, qt, scale_a, self.strides, self.padding)
