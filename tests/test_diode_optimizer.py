"""DiodeMix optimizer tests: per-regime update semantics + end-to-end descent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.ops import packing, quant
from bitorch_engine_tpu.ops.mpq_linear import mpq_linear
from bitorch_engine_tpu.optim import DiodeHyperParams, diode_init, diode_update
from bitorch_engine_tpu.qtensor import (
    BinaryQTensor,
    IntQTensor,
    MPQTensor,
    with_grad_shadow,
)


def _grad_like(params, shadow_fill):
    """Build a gradient pytree: fp leaves get ones, QTensors get shadow_fill."""

    def g(leaf):
        from bitorch_engine_tpu.qtensor import QTensorBase

        if isinstance(leaf, QTensorBase):
            ct = jax.tree_util.tree_map(
                lambda x: jnp.zeros_like(x)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else np.zeros(x.shape, jax.dtypes.float0),
                leaf,
            )
            return ct.replace(
                grad_shadow=jnp.full(leaf.logical_shape, shadow_fill, jnp.float32)
            )
        return jnp.ones_like(leaf)

    return jax.tree_util.tree_map(
        g, params, is_leaf=lambda x: hasattr(x, "logical_shape")
    )


def test_fp_adamw_descends():
    params = {"w": jnp.ones((4, 4))}
    state = diode_init(params)
    hp = DiodeHyperParams(lr=0.01)
    grads = {"w": jnp.ones((4, 4))}
    new_params, state = diode_update(grads, state, params, hp)
    assert float(jnp.all(new_params["w"] < params["w"]))


def test_binary_sign_flip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 16)).astype(np.float32)
    qt = with_grad_shadow(quant.init_binary_weight(jnp.asarray(w)))
    params = {"q": qt}
    state = diode_init(params)
    # fast betas so the slow-EMA (beta2) crosses its ±1e-3 init within the test
    hp = DiodeHyperParams(lr=0.1, beta1=0.9, beta2=0.99)
    # strong positive gradient should eventually flip positive weights negative
    for _ in range(30):
        grads = _grad_like(params, 10.0)
        params, state = diode_update(grads, state, params, hp)
    data = np.asarray(params["q"].data)
    # sign descent with positive grads drives weights toward negative
    assert (data < 0).mean() > 0.9
    # data magnitudes unchanged (only signs flip)
    np.testing.assert_array_equal(np.abs(data), np.abs(np.asarray(qt.data)))


def test_intq_update_requantizes():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((8, 16)).astype(np.float32) * 0.1
    qt = with_grad_shadow(quant.init_nbit_weight(jnp.asarray(w), w_bit=4))
    params = {"q": qt}
    state = diode_init(params)
    hp = DiodeHyperParams(lr=0.5)
    grads = _grad_like(params, 1.0)
    new_params, state = diode_update(grads, state, params, hp)
    nd = np.asarray(new_params["q"].data)
    assert nd.min() >= -8 and nd.max() <= 7
    assert not np.array_equal(nd, np.asarray(qt.data))


@pytest.mark.parametrize("asym", [False, True])
def test_mpq_update_moves_weight_downhill(asym):
    rng = np.random.default_rng(2)
    k, n, gs = 64, 32, 32
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    qt = with_grad_shadow(
        quant.quantize_mpq(jnp.asarray(w), w_bit=4, group_size=gs, asym=asym)
    )
    params = {"q": qt}
    state = diode_init(params)
    hp = DiodeHyperParams(lr=0.01)
    w0 = np.asarray(quant.dequantize_mpq(params["q"], dtype=jnp.float32))
    for _ in range(3):
        grads = _grad_like(params, 1.0)
        params, state = diode_update(grads, state, params, hp)
    w1 = np.asarray(quant.dequantize_mpq(params["q"], dtype=jnp.float32))
    # positive gradient → weight decreases on average
    assert w1.mean() < w0.mean()
    assert params["q"].packed.dtype == jnp.int32


def test_end_to_end_training_reduces_loss_mpq():
    """A tiny regression task with an MPQ layer must descend under DiodeMix."""
    rng = np.random.default_rng(3)
    k, n, gs = 64, 32, 32
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    qt = with_grad_shadow(quant.quantize_mpq(jnp.asarray(w), w_bit=8, group_size=gs))
    x = jnp.asarray(rng.standard_normal((32, k)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((32, n)).astype(np.float32))
    params = {"q": qt}
    hp = DiodeHyperParams(lr=2e-3)
    state = diode_init(params)

    def loss_fn(params):
        pred = mpq_linear(x, params["q"])
        return jnp.mean((pred - y) ** 2)

    losses = []
    for _ in range(20):
        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(params)
        params, state = diode_update(grads, state, params, hp)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_mbwq_update_descends():
    """Mixed-bit (MBWQ) training: loss decreases, segments stay packed."""
    from bitorch_engine_tpu.ops.mbwq_linear import mbwq_linear, quantize_mbwq

    rng = np.random.default_rng(7)
    k, n = 128, 64
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    strategy = {"bits": [8, 4], "bits_prop": [0.5, 0.5], "group_size": {"8": 32, "4": 32}}
    qt = with_grad_shadow(quantize_mbwq(jnp.asarray(w), strategy))
    x = jnp.asarray(rng.standard_normal((32, k)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((32, n)).astype(np.float32))
    params = {"q": qt}
    hp = DiodeHyperParams(lr=2e-3)
    state = diode_init(params, hp=hp)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            return jnp.mean((mbwq_linear(x, p["q"]) - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(params)
        p2, s2 = diode_update(grads, state, params, hp)
        return p2, s2, loss

    losses = []
    for _ in range(20):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses[:3] + losses[-3:]
    assert params["q"].segments[0].packed.dtype == jnp.int32
