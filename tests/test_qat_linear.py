"""Tests for Q4/Q8 QAT linear (int MXU GEMM + LSQ STE)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.ops import quant
from bitorch_engine_tpu.ops.qat_linear import qat_linear
from bitorch_engine_tpu.qtensor import with_grad_shadow


@pytest.mark.parametrize("w_bit", [4, 8])
def test_forward_matches_simulated_quantization(w_bit):
    rng = np.random.default_rng(0)
    m, k, n = 32, 64, 16
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.1
    qt = quant.init_nbit_weight(jnp.asarray(w), w_bit=w_bit)
    divisor = 5.6345 if w_bit == 4 else 11.269
    scale_a = jnp.asarray(2.0 * np.abs(np.asarray(x)).mean() / divisor, jnp.float32)

    out = qat_linear(x, qt, scale_a)

    qlow, qhigh = -(2 ** (w_bit - 1)), 2 ** (w_bit - 1) - 1
    q_a = np.clip(np.round(np.asarray(x) / float(scale_a)), qlow, qhigh)
    q_w = np.asarray(qt.data, np.float32)
    expected = (q_a @ q_w.T) * float(scale_a) * float(qt.scale_w)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_grad_flow_and_ste_mask():
    rng = np.random.default_rng(1)
    m, k, n = 32, 64, 16
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.1
    qt = with_grad_shadow(quant.init_nbit_weight(jnp.asarray(w), w_bit=4))
    scale_a = jnp.asarray(0.1, jnp.float32)

    def loss(x, qt, scale_a):
        return jnp.sum(qat_linear(x, qt, scale_a))

    gx, gqt, gs = jax.grad(loss, argnums=(0, 1, 2), allow_int=True)(x, qt, scale_a)
    assert float(jnp.sum(jnp.abs(gqt.grad_shadow))) > 0
    assert np.isfinite(float(gs))
    # out-of-range activations produce zero input grad (STE clip)
    gx2 = jax.grad(loss, argnums=0)(x * 1e5, qt, scale_a)
    np.testing.assert_allclose(np.asarray(gx2), 0.0)


def test_quantization_accuracy_vs_fp():
    """8-bit QAT linear should track the fp linear closely (≤2% rel error)."""
    rng = np.random.default_rng(2)
    m, k, n = 64, 128, 32
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.1
    qt = quant.init_nbit_weight(jnp.asarray(w), w_bit=8)
    scale_a = jnp.asarray(2.0 * np.abs(np.asarray(x)).mean() / 11.269, jnp.float32)
    out = np.asarray(qat_linear(x, qt, scale_a))
    # dequantized-weight reference
    w_hat = np.asarray(qt.data, np.float32) * float(qt.scale_w)
    fp_with_qw = np.asarray(x) @ w_hat.T
    rel = np.linalg.norm(out - fp_with_qw) / np.linalg.norm(fp_with_qw)
    assert rel < 0.05, rel
