"""Quantized linear layer modules (flax.linen).

TPU-native module layer mirroring the reference's L3
(``layers/qlinear/{binary,nbit}/layer.py``).  Key design translations:

* The reference's mutable lifecycle (``prepare_params()`` converting fp →
  int8, lazy ``scale_a`` init on first forward, ``opt_weight`` switching
  between fp and packed) becomes *functional initialization*: flax ``init``
  runs the forward on a sample batch, so the activation scale is initialized
  from real data exactly like the reference's lazy init
  (``binary/cuda/layer.py:243-248``), and the weight is created directly in
  its quantized form.
* Packing for inference is a pure params→params transformation
  (:func:`bitorch_engine_tpu.utils.convert.pack_for_inference`), not an
  in-place mutation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import quant
from ..ops.binary_linear import binary_linear
from ..ops.mbwq_linear import mbwq_linear, quantize_mbwq
from ..ops.mpq_linear import mpq_linear
from ..ops.qat_linear import qat_linear
from ..qtensor import BinaryQTensor, IntQTensor, MBWQTensor, MPQTensor

Array = jax.Array


def _kaiming_uniform(key, shape, dtype=jnp.float32):
    """Kaiming-uniform fan-in init, parity with torch ``init.kaiming_uniform_(a=sqrt(5))``
    used by the reference's ``reset_parameters`` (``nbit/layer.py:214-220``)."""
    fan_in = shape[1]
    bound = 1.0 / jnp.sqrt(fan_in) * jnp.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class BinaryLinear(nn.Module):
    """1-bit linear layer with learnable activation scale/shift.

    Parity: ``BinaryLinearCuda`` (``binary/cuda/layer.py:126-284``) — weight
    int8 ±, layer-wise ``scale_w`` (L1 norm), learnable ``scale_a`` (init
    2·mean|x| for symmetric input) and per-feature input shift ``bias_a``.
    """

    out_features: int
    symmetric: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = x.shape[-1]

        def init_qweight(key):
            w = _kaiming_uniform(key, (self.out_features, k))
            return quant.init_binary_weight(w)

        qweight: BinaryQTensor = self.param("qweight", init_qweight)
        factor = 2.0 if self.symmetric else 4.0
        scale_a = self.param(
            "scale_a",
            lambda key: (factor * jnp.mean(jnp.abs(x))).astype(self.dtype),
        )
        bias_a = self.param("bias_a", lambda key: jnp.zeros((k,), self.dtype))
        return binary_linear(x, qweight, scale_a, bias_a)


class _NBitLinear(nn.Module):
    out_features: int
    w_bit: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = x.shape[-1]

        def init_qweight(key):
            w = _kaiming_uniform(key, (self.out_features, k))
            return quant.init_nbit_weight(w, w_bit=self.w_bit)

        qweight: IntQTensor = self.param("qweight", init_qweight)
        divisor = 5.6345 if self.w_bit == 4 else 11.269
        scale_a = self.param(
            "scale_a",
            lambda key: (2.0 * jnp.mean(jnp.abs(x)) / divisor).astype(self.dtype),
        )
        bias_a = self.param("bias_a", lambda key: jnp.zeros((k,), self.dtype))
        return qat_linear(x + bias_a, qweight, scale_a)


class Q4Linear(_NBitLinear):
    """4-bit QAT linear; parity ``Q4LinearCutlass`` (``q4_layer.py:100-213``)."""

    w_bit: int = 4


class Q8Linear(_NBitLinear):
    """8-bit QAT linear; parity ``Q8LinearCutlass`` (``q8_layer.py:112-200``)."""

    w_bit: int = 8


class MPQLinear(nn.Module):
    """Weight-only mixed-precision quantized linear for LLMs.

    Parity: ``MPQLinearCuda`` (``nbit/cuda/mpq_layer.py:123-224``) — 16-bit
    activations, w_bit ∈ {1,2,4,8} group-quantized packed weights, optional
    bias (``disable_bias``).  For loading real GPTQ/GBA checkpoints the
    params tree is replaced via ``utils.convert`` / ``utils.checkpoint``;
    the self-init path quantizes a random fp weight (useful for tests and
    benchmarks).
    """

    out_features: int
    w_bit: int = 4
    group_size: int = 128
    asym: bool = False
    use_bias: bool = False
    # exl2-style symmetric-midpoint quantization (zeros ≡ mid·scales):
    # enables the quad kernel's signed-code regime (no zeros correction);
    # slightly coarser than affine min-max on skewed groups — ppl-gated
    mid_sym: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = x.shape[-1]
        gs = self.group_size if self.group_size > 0 else k

        def init_qweight(key):
            w = _kaiming_uniform(key, (self.out_features, k)).T  # logical (K, N)
            return quant.quantize_mpq(
                w, w_bit=self.w_bit, group_size=gs, asym=self.asym,
                mid_sym=self.mid_sym,
            )

        qweight: MPQTensor = self.param("qweight", init_qweight)
        out = mpq_linear(x.astype(self.dtype), qweight)
        if self.use_bias:
            bias = self.param(
                "bias", lambda key: jnp.zeros((self.out_features,), self.dtype)
            )
            out = out + bias
        return out


class MBWQLinear(nn.Module):
    """Channel-mixed-bit-width linear (GreenBit/exl2-style).

    Parity: ``MBWQLinearCuda`` (``nbit/cuda/mbwq_layer.py``).  ``strategy``
    follows the reference's per-projection JSON format
    (``test_nbit_linear_mixbits.py:26-29``), e.g.
    ``{"bits": [4, 2], "bits_prop": [0.75, 0.25], "group_size": {"4": 32, "2": 32}}``.
    """

    out_features: int
    strategy: Any = None
    use_channel_scale: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = x.shape[-1]
        strategy = self.strategy or {
            "bits": [4, 2],
            "bits_prop": [0.75, 0.25],
            "group_size": {"4": 64, "2": 64},
        }

        def init_qweight(key):
            w = _kaiming_uniform(key, (self.out_features, k)).T  # (K, N)
            cs = jnp.ones((k,), jnp.float32) if self.use_channel_scale else None
            return quantize_mbwq(w, strategy, channel_scale=cs)

        qweight: MBWQTensor = self.param("qweight", init_qweight)
        return mbwq_linear(x.astype(self.dtype), qweight)
