"""Layer-module tests: init-from-data, forward shapes, gradient flow,
embedding/conv/attention parity checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.layers import (
    BMHA,
    BinaryConv2d,
    BinaryEmbedding,
    BinaryEmbeddingBag,
    BinaryLinear,
    MPQLinear,
    Q4Conv2d,
    Q4Linear,
    Q8Linear,
)
from bitorch_engine_tpu.ops import packing


def test_binary_linear_module():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 64))
    layer = BinaryLinear(32)
    params = layer.init(jax.random.PRNGKey(1), x)
    out = layer.apply(params, x)
    assert out.shape == (8, 32)
    # scale_a initialized from the sample batch: 2 * mean|x|
    sa = float(params["params"]["scale_a"])
    np.testing.assert_allclose(sa, 2.0 * float(jnp.mean(jnp.abs(x))), rtol=1e-5)


@pytest.mark.parametrize("cls,bits", [(Q4Linear, 4), (Q8Linear, 8)])
def test_nbit_linear_module(cls, bits):
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 64))
    layer = cls(32)
    params = layer.init(jax.random.PRNGKey(1), x)
    out = layer.apply(params, x)
    assert out.shape == (8, 32)
    qt = params["params"]["qweight"]
    assert qt.w_bit == bits
    lim = 2 ** (bits - 1)
    data = np.asarray(qt.data)
    assert data.min() >= -lim and data.max() < lim


def test_mpq_linear_module():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 256))
    layer = MPQLinear(128, w_bit=4, group_size=64, dtype=jnp.float32)
    params = layer.init(jax.random.PRNGKey(1), x)
    out = layer.apply(params, x)
    assert out.shape == (4, 128)
    qt = params["params"]["qweight"]
    assert qt.packed.shape == (256 // 32 * 4, 128)


def test_binary_embedding_module_and_grad():
    idx = jnp.asarray([[1, 2], [3, 4]])
    layer = BinaryEmbedding(16, 64)
    params = layer.init(jax.random.PRNGKey(0), idx)
    out = layer.apply(params, idx)
    assert out.shape == (2, 2, 64)
    # values are ±scale per row
    qt = params["params"]["qweight"]
    scales = np.asarray(qt.scale)
    for b in range(2):
        for t in range(2):
            row = int(idx[b, t])
            np.testing.assert_allclose(
                np.abs(np.asarray(out[b, t])), scales[row, 0], rtol=1e-5
            )


def test_binary_embedding_bag():
    idx = jnp.asarray([[1, 2, 3]])
    layer = BinaryEmbeddingBag(16, 32, mode="majority")
    params = layer.init(jax.random.PRNGKey(0), idx)
    out = layer.apply(params, idx)
    assert out.shape == (1, 32)
    assert set(np.unique(np.asarray(out))).issubset({-1.0, 1.0})


def test_binary_conv_module():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    layer = BinaryConv2d(32, (3, 3))
    params = layer.init(jax.random.PRNGKey(1), x)
    out = layer.apply(params, x)
    assert out.shape == (2, 8, 8, 32)
    # differential check vs explicit sign conv
    qt = params["params"]["qweight"]
    sa = params["params"]["scale_a"]
    ref = jax.lax.conv_general_dilated(
        jnp.sign(jnp.where(x == 0, 1.0, x)),
        jnp.sign(jnp.where(qt.data == 0, 1, qt.data).astype(jnp.float32)),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref * sa * qt.scale_w), rtol=1e-4
    )


def test_q4_conv_module_grads():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8))
    layer = Q4Conv2d(16, (3, 3))
    params = layer.init(jax.random.PRNGKey(1), x)
    out = layer.apply(params, x)
    assert out.shape == (2, 8, 8, 16)

    from bitorch_engine_tpu.utils import prepare_for_training

    tparams = prepare_for_training(params)

    def loss(p, x):
        return jnp.sum(layer.apply(p, x) ** 2)

    grads = jax.grad(loss, allow_int=True)(tparams, x)
    gsh = grads["params"]["qweight"].grad_shadow
    assert gsh.shape == tparams["params"]["qweight"].data.shape
    assert float(jnp.sum(jnp.abs(gsh))) > 0


def test_bmha_module():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 64))
    layer = BMHA(hidden=64, num_heads=4)
    params = layer.init(jax.random.PRNGKey(1), x)
    out = layer.apply(params, x)
    assert out.shape == (2, 6, 64)
    layer_b = BMHA(hidden=64, num_heads=4, binary_attention=True)
    params_b = layer_b.init(jax.random.PRNGKey(1), x)
    out_b = layer_b.apply(params_b, x)
    assert out_b.shape == (2, 6, 64)
