"""Differential + gradient tests for the binary linear op.

Reference patterns: packed-vs-unpacked equality
(``test_binary_linear.py:249-268``), differential vs simulated binary linear,
gradient-flow smoke tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.ops import binary_linear as bl
from bitorch_engine_tpu.ops import quant
from bitorch_engine_tpu.qtensor import with_grad_shadow


def _setup(m=16, k=128, n=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32) * 0.1)
    qt = quant.init_binary_weight(w)
    scale_a = jnp.asarray(2.0 * np.abs(np.asarray(x)).mean(), jnp.float32)
    bias_a = jnp.zeros((k,), jnp.float32)
    return x, w, qt, scale_a, bias_a


def test_forward_matches_simulated_binary_linear():
    """out == sign(x) @ sign(W)^T * scale_a * scale_w (bitorch-sim parity)."""
    x, w, qt, scale_a, bias_a = _setup()
    out = bl.binary_linear(x, qt, scale_a, bias_a)
    x_sign = np.where(np.asarray(x) >= 0, 1.0, -1.0)
    w_sign = np.sign(np.asarray(qt.data, np.float32))
    expected = x_sign @ w_sign.T * float(scale_a) * float(qt.scale_w)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_packed_equals_unpacked():
    """Packed inference path must equal the QAT MXU path bit-exactly."""
    x, w, qt, scale_a, bias_a = _setup(m=8, k=96, n=16)
    out_unpacked = bl.binary_linear(x, qt, scale_a, bias_a)
    qt_packed = quant.pack_binary_weight(qt)
    assert qt_packed.data.shape == (16, 3)
    out_packed = bl.binary_linear(x, qt_packed, scale_a, bias_a)
    np.testing.assert_allclose(
        np.asarray(out_packed), np.asarray(out_unpacked), rtol=1e-5
    )


def test_packed_nonmultiple_of_32():
    x, w, qt, scale_a, bias_a = _setup(m=4, k=100, n=8)
    out_unpacked = bl.binary_linear(x, qt, scale_a, bias_a)
    qt_packed = quant.pack_binary_weight(qt)
    assert qt_packed.data.shape == (8, 4)  # padded to 128 bits
    out_packed = bl.binary_linear(x, qt_packed, scale_a, bias_a)
    np.testing.assert_allclose(
        np.asarray(out_packed), np.asarray(out_unpacked), rtol=1e-5
    )


def test_gradients_flow_to_shadow():
    x, w, qt, scale_a, bias_a = _setup()
    qt = with_grad_shadow(qt)

    def loss_fn(x, qt, scale_a, bias_a):
        return jnp.sum(bl.binary_linear(x, qt, scale_a, bias_a) ** 2)

    gx, gqt, gsa, gba = jax.grad(loss_fn, argnums=(0, 1, 2, 3), allow_int=True)(
        x, qt, scale_a, bias_a
    )
    assert gx.shape == x.shape
    assert gqt.grad_shadow.shape == qt.data.shape
    assert float(jnp.sum(jnp.abs(gqt.grad_shadow))) > 0
    assert np.isfinite(float(gsa))
    assert gba.shape == bias_a.shape
    # STE mask: inputs far outside the clip range must have zero grad
    x_large = x * 1e6
    gx2 = jax.grad(loss_fn, argnums=0)(x_large, qt, scale_a, bias_a)
    np.testing.assert_allclose(np.asarray(gx2), 0.0)


def test_jit_and_3d_input():
    x, w, qt, scale_a, bias_a = _setup(m=6, k=128, n=32)
    x3 = x.reshape(2, 3, 128)
    f = jax.jit(bl.binary_linear)
    out = f(x3, qt, scale_a, bias_a)
    assert out.shape == (2, 3, 32)
    out_flat = bl.binary_linear(x, qt, scale_a, bias_a)
    np.testing.assert_allclose(
        np.asarray(out).reshape(6, 32), np.asarray(out_flat), rtol=1e-5
    )


def test_binary_matmul():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((2, 8, 32)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2, 32, 16)).astype(np.float32))
    out = bl.binary_matmul(a, b)
    expected = np.matmul(
        np.where(np.asarray(a) >= 0, 1.0, -1.0), np.where(np.asarray(b) >= 0, 1.0, -1.0)
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)
    # grads exist
    g = jax.grad(lambda a, b: jnp.sum(bl.binary_matmul(a, b)))(a, b)
    assert g.shape == a.shape
