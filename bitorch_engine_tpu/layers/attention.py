"""Attention modules: BMHA (binary multi-head attention) parity layer.

Parity target: ``qmha/binary/layer.py`` — q/k/v/out projections as binary
linear layers, fp32 softmax attention core (``:134-143``), optional binarized
score/context matmuls via ``BinaryMatMul``, and the ``LearnableBias``
("move"/shift) modules (``:9-46``) applied before each projection.

The LLM decode path (Llama) uses the separate flash-attention KV-cache
implementation in ``models/llama.py``; BMHA is the QAT research layer.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.binary_linear import binary_matmul
from ..ops.qat_matmul import init_clip_scale, q4_matmul
from .linear import BinaryLinear

Array = jax.Array


class Q4MatMul(nn.Module):
    """4-bit quantized batched matmul with learnable clip scales.

    Parity: ``Q4MatMul`` module (``nbit/cutlass/q4_layer.py:319-383``) —
    scalar ``x_clip``/``y_clip`` parameters initialized data-dependently
    (``2·E|x|/√127``) on first use, LSQ/STE gradients.  Contraction follows
    the reference convention ``(… , M, K) × (… , N, K) → (… , M, N)``.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        x_clip = self.param(
            "x_clip", lambda key: init_clip_scale(x).astype(self.dtype)
        )
        y_clip = self.param(
            "y_clip", lambda key: init_clip_scale(y).astype(self.dtype)
        )
        return q4_matmul(x, y, x_clip, y_clip)


class LearnableBias(nn.Module):
    """Per-channel learnable shift (parity ``qmha/binary/layer.py:9-46``)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        bias = self.param("bias", lambda key: jnp.zeros((x.shape[-1],), x.dtype))
        return x + bias


class BMHA(nn.Module):
    """Binary multi-head attention.

    ``hidden`` must be divisible by ``num_heads``.  With
    ``binary_attention=True`` the score and context matmuls are binarized
    (``BinaryMatMul`` analogue); softmax always runs in fp32
    (``qmha/binary/layer.py:127-148``).
    """

    hidden: int
    num_heads: int
    binary_attention: bool = False
    q4_attention: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        if self.binary_attention and self.q4_attention:
            raise ValueError("choose at most one of binary_attention / q4_attention")
        b, s, h = x.shape
        d = self.hidden // self.num_heads

        def proj(name, y):
            y = LearnableBias(name=f"move_{name}")(y)
            return BinaryLinear(self.hidden, dtype=self.dtype, name=f"{name}_proj")(y)

        q = proj("q", x).reshape(b, s, self.num_heads, d).transpose(0, 2, 1, 3)
        k = proj("k", x).reshape(b, s, self.num_heads, d).transpose(0, 2, 1, 3)
        v = proj("v", x).reshape(b, s, self.num_heads, d).transpose(0, 2, 1, 3)

        if self.binary_attention:
            scores = binary_matmul(q, jnp.swapaxes(k, -1, -2))
        elif self.q4_attention:
            # 4-bit score matmul (reference wires Q4MatMul into its qmha the
            # same way); contraction convention is (M,K)x(N,K)
            scores = Q4MatMul(dtype=self.dtype, name="score_matmul")(q, k)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        scores = scores / math.sqrt(d)
        if mask is not None:
            scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)

        if self.binary_attention:
            ctx = binary_matmul(probs, v)
        elif self.q4_attention:
            ctx = Q4MatMul(dtype=self.dtype, name="context_matmul")(
                probs, jnp.swapaxes(v, -1, -2)
            )
        else:
            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, self.hidden)
        return proj("out", ctx)
