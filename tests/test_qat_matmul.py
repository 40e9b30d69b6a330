"""Q4MatMul tests — quantized batched matmul with LSQ clip scales.

Parity target: ``nbit/cutlass/q4_layer.py:215-383`` (Q4MatMulFunction /
Q4MatMul).  Differential vs fp matmul on the *quantized* operands,
gradient structure (STE masks, LSQ clip-scale gradients), and the BMHA
``q4_attention`` wiring.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.ops.qat_matmul import init_clip_scale, q4_matmul


def _mk(shape_x, shape_y, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(shape_x).astype(np.float32) * scale)
    y = jnp.asarray(rng.standard_normal(shape_y).astype(np.float32) * scale)
    return x, y


def test_q4_matmul_matches_fake_quant():
    """out == dequant(q4(x)) @ dequant(q4(y))^T exactly (int GEMM == fp GEMM
    on exactly representable values)."""
    x, y = _mk((2, 8, 32), (2, 16, 32))
    xc, yc = init_clip_scale(x), init_clip_scale(y)
    out = q4_matmul(x, y, xc, yc)

    def fq(v, c):
        return jnp.clip(jnp.round(v / c), -8, 7) * c

    ref = jnp.einsum("bmk,bnk->bmn", fq(x, xc), fq(y, yc))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_q4_matmul_approximates_fp():
    """With LSQ-initialized clips the quantized product tracks the fp one."""
    x, y = _mk((1, 16, 64), (1, 16, 64), seed=1)
    out = q4_matmul(x, y, init_clip_scale(x), init_clip_scale(y))
    ref = jnp.einsum("bmk,bnk->bmn", x, y)
    o, r = np.asarray(out).ravel(), np.asarray(ref).ravel()
    cos = float(np.dot(o, r) / (np.linalg.norm(o) * np.linalg.norm(r)))
    assert cos > 0.9, cos  # 4-bit dynamic quantization keeps the direction


def test_q4_matmul_4d_batched():
    """(b, h, s, d) attention-shaped operands."""
    x, y = _mk((2, 4, 8, 16), (2, 4, 8, 16), seed=2)
    out = q4_matmul(x, y, init_clip_scale(x), init_clip_scale(y))
    assert out.shape == (2, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_q4_matmul_rejects_2d():
    x, y = _mk((8, 32), (16, 32))
    with pytest.raises(ValueError):
        q4_matmul(x, y, jnp.float32(0.1), jnp.float32(0.1))


def test_q4_matmul_gradients():
    """STE: in-range gradients flow, clipped positions are masked; clip
    scales receive the LSQ gradient."""
    x, y = _mk((1, 4, 16), (1, 4, 16), seed=3)
    xc, yc = init_clip_scale(x), init_clip_scale(y)
    # make one x position far out of the clip range
    x = x.at[0, 0, 0].set(100.0)

    def loss(x, y, xc, yc):
        return jnp.sum(q4_matmul(x, y, xc, yc))

    gx, gy, gxc, gyc = jax.grad(loss, argnums=(0, 1, 2, 3))(x, y, xc, yc)
    assert float(gx[0, 0, 0]) == 0.0  # clipped -> STE-masked
    assert np.abs(np.asarray(gx)).sum() > 0  # in-range grads flow
    assert np.isfinite(float(gxc)) and np.isfinite(float(gyc))
    assert gxc.shape == xc.shape
    # LSQ clip gradient must be nonzero when positions clip
    assert float(jnp.abs(gxc)) > 0


def test_q4_matmul_grad_matches_fp_when_unclipped():
    """With wide clips and values on the quant grid the backward reduces to
    the plain matmul vjp."""
    rng = np.random.default_rng(4)
    c = 0.5
    x = jnp.asarray(rng.integers(-7, 8, (1, 4, 8)).astype(np.float32) * c)
    y = jnp.asarray(rng.integers(-7, 8, (1, 4, 8)).astype(np.float32) * c)
    g = jnp.asarray(rng.standard_normal((1, 4, 4)).astype(np.float32))
    xc = jnp.float32(c)
    yc = jnp.float32(c)

    def loss(x, y):
        return jnp.sum(q4_matmul(x, y, xc, yc) * g)

    gx, gy = jax.grad(loss, argnums=(0, 1))(x, y)
    ref_gx = jnp.einsum("bmn,bnk->bmk", g, y)
    ref_gy = jnp.einsum("bmn,bmk->bnk", g, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ref_gx), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(ref_gy), rtol=1e-5, atol=1e-5)


def test_bmha_q4_attention():
    from bitorch_engine_tpu.layers.attention import BMHA

    x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 8, 32)).astype(np.float32))
    m = BMHA(hidden=32, num_heads=4, q4_attention=True)
    params = m.init(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_leaves(params)
    out = m.apply(params, x)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
    # clip scales exist for both quantized matmuls
    names = str(jax.tree_util.tree_structure(params))
    assert "score_matmul" in names and "context_matmul" in names

    from bitorch_engine_tpu.utils import prepare_for_training

    tparams = prepare_for_training(params)

    def loss(p):
        return jnp.sum(m.apply(p, x) ** 2)

    grads = jax.grad(loss, allow_int=True)(tparams)
    for l in jax.tree_util.tree_leaves(grads):
        if np.asarray(l).dtype.kind == "f":
            assert np.isfinite(np.asarray(l)).all()


def test_bmha_modes_exclusive():
    from bitorch_engine_tpu.layers.attention import BMHA

    x = jnp.zeros((1, 4, 16))
    m = BMHA(hidden=16, num_heads=2, q4_attention=True, binary_attention=True)
    with pytest.raises(ValueError):
        m.init(jax.random.PRNGKey(0), x)
