"""Differential + gradient tests for the MPQ (weight-only) linear op.

Reference patterns: output vs torch.matmul on reconstructed fp weights with
LLM-shaped dims (``test_nbit_linear.py:360-365``), privileged-grad flow
(``mpq_layer.py:111-116``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.ops import quant
from bitorch_engine_tpu.ops.mpq_linear import mpq_linear
from bitorch_engine_tpu.qtensor import with_grad_shadow


@pytest.mark.parametrize("w_bit", [2, 4, 8])
@pytest.mark.parametrize("asym", [False, True])
def test_forward_matches_dequant_matmul(w_bit, asym):
    rng = np.random.default_rng(0)
    m, k, n, gs = 8, 256, 128, 64
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    qt = quant.quantize_mpq(jnp.asarray(w), w_bit=w_bit, group_size=gs, asym=asym)
    out = mpq_linear(x, qt)
    w_hat = np.asarray(quant.dequantize_mpq(qt, dtype=jnp.float32))
    expected = np.asarray(x) @ w_hat
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_forward_decode_and_prefill_regimes_agree():
    """m=1 (decode) and m=64 (prefill) must compute the same function."""
    rng = np.random.default_rng(1)
    k, n, gs = 128, 64, 32
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    qt = quant.quantize_mpq(jnp.asarray(w), w_bit=4, group_size=gs)
    x64 = jnp.asarray(rng.standard_normal((64, k)).astype(np.float32))
    out64 = np.asarray(mpq_linear(x64, qt))
    out1 = np.asarray(mpq_linear(x64[:1], qt))
    np.testing.assert_allclose(out1, out64[:1], rtol=1e-4, atol=1e-5)


def test_quantization_error_small_at_4bit():
    """Relative Frobenius error of 4-bit g64 RTN ≈ s/sqrt(12) ≈ 10% on Gaussians."""
    rng = np.random.default_rng(2)
    k, n = 512, 256
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    qt = quant.quantize_mpq(jnp.asarray(w), w_bit=4, group_size=64)
    w_hat = np.asarray(quant.dequantize_mpq(qt, dtype=jnp.float32))
    rel = np.linalg.norm(w_hat - w) / np.linalg.norm(w)
    assert rel < 0.15, rel
    # and 8-bit must be ~16x better
    qt8 = quant.quantize_mpq(jnp.asarray(w), w_bit=8, group_size=64)
    w_hat8 = np.asarray(quant.dequantize_mpq(qt8, dtype=jnp.float32))
    rel8 = np.linalg.norm(w_hat8 - w) / np.linalg.norm(w)
    assert rel8 < rel / 8, (rel, rel8)


def test_privileged_grad_flow():
    rng = np.random.default_rng(3)
    m, k, n = 16, 128, 64
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    qt = with_grad_shadow(quant.quantize_mpq(jnp.asarray(w), w_bit=4, group_size=32))

    def loss_fn(x, qt):
        return jnp.sum(mpq_linear(x, qt) ** 2)

    gx, gqt = jax.grad(loss_fn, argnums=(0, 1), allow_int=True)(x, qt)
    # grad_shadow == x^T @ (2 * out): verify against autodiff-free formula
    out = np.asarray(mpq_linear(x, qt))
    expected_gw = np.asarray(x).T @ (2.0 * out)
    np.testing.assert_allclose(np.asarray(gqt.grad_shadow), expected_gw, rtol=1e-3)
    # grad_input matches g @ W^T
    w_hat = np.asarray(quant.dequantize_mpq(qt, dtype=jnp.float32))
    np.testing.assert_allclose(
        np.asarray(gx), (2.0 * out) @ w_hat.T, rtol=1e-3, atol=1e-4
    )


def test_jit_3d_and_llm_shapes():
    rng = np.random.default_rng(4)
    b, s, k, n = 2, 3, 512, 256
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    qt = quant.quantize_mpq(jnp.asarray(w), w_bit=2, group_size=128)
    x = jnp.asarray(rng.standard_normal((b, s, k)).astype(np.float32))
    out = jax.jit(mpq_linear)(x, qt)
    assert out.shape == (b, s, n)
    w_hat = np.asarray(quant.dequantize_mpq(qt, dtype=jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x) @ w_hat, rtol=1e-4, atol=1e-4
    )
