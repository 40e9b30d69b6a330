"""Flash-attention kernel (fwd + custom_vjp bwd) vs einsum reference.

Interpret-mode validation per the project convention (CLAUDE.md): the same
calls run un-interpreted on hardware and must match the XLA einsum path
within bf16 tolerance.  The reference has only O(L²) BMHA softmax
(``qmha/binary/layer.py:134-143``) — this kernel is greenfield (SURVEY §5).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.ops.pallas.flash_attention import flash_attention


def ref_attn(q, k, v, causal=True, sm_scale=None):
    b, nh, s, d = q.shape
    nkv = k.shape[1]
    rep = nh // nkv
    kf = jnp.repeat(k, rep, axis=1).astype(jnp.float32)
    vf = jnp.repeat(v, rep, axis=1).astype(jnp.float32)
    scale = sm_scale or 1.0 / math.sqrt(d)
    s_ = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), kf) * scale
    if causal:
        mask = jnp.tril(jnp.ones((s, s), bool))
        s_ = jnp.where(mask, s_, -jnp.inf)
    p = jax.nn.softmax(s_, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, vf).astype(q.dtype)


def _rand(key, b, nh, nkv, s, d, dtype):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, nh, s, d), dtype)
    k = jax.random.normal(kk, (b, nkv, s, d), dtype)
    v = jax.random.normal(kv, (b, nkv, s, d), dtype)
    return q, k, v


@pytest.mark.parametrize(
    "b,nh,nkv,s,d,causal",
    [
        (2, 4, 2, 256, 128, True),   # GQA rep=2
        (1, 4, 4, 128, 64, True),    # MHA, head_dim pad 64→128
        (2, 8, 2, 256, 128, False),  # non-causal, rep=4
        (1, 2, 1, 384, 128, True),   # s not a power of two (384 = 3·128)
    ],
)
def test_forward_matches_einsum(b, nh, nkv, s, d, causal):
    q, k, v = _rand(jax.random.PRNGKey(0), b, nh, nkv, s, d, jnp.float32)
    out = flash_attention(q, k, v, causal=causal, interpret=True, block_q=128)
    ref = ref_attn(q, k, v, causal=causal)
    np.testing.assert_allclose(out, ref, atol=3e-6, rtol=1e-5)


@pytest.mark.parametrize(
    "b,nh,nkv,s,d,causal",
    [
        (2, 4, 2, 256, 128, True),
        (1, 4, 4, 128, 64, True),
        (1, 8, 2, 256, 128, False),
    ],
)
def test_grads_match_einsum(b, nh, nkv, s, d, causal):
    q, k, v = _rand(jax.random.PRNGKey(1), b, nh, nkv, s, d, jnp.float32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=causal, interpret=True, block_q=128)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(ref_attn(q, k, v, causal=causal)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(
            a, b_, atol=2e-5, rtol=1e-4, err_msg=f"d{name} mismatch"
        )


def test_bf16_layer_call_pattern():
    """The exact call the Llama layer makes: bf16 operands, GQA at true
    nkv width, sm_scale from the logical head dim."""
    b, nh, nkv, s, d = 2, 8, 2, 256, 64
    q, k, v = _rand(jax.random.PRNGKey(2), b, nh, nkv, s, d, jnp.bfloat16)
    out = flash_attention(
        q, k, v, causal=True, sm_scale=1.0 / math.sqrt(d),
        interpret=True, block_q=128,
    )
    ref = ref_attn(q, k, v, causal=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        out.astype(jnp.float32), ref.astype(jnp.float32), atol=2e-2, rtol=2e-2
    )


def test_rejects_ragged_sequence():
    q, k, v = _rand(jax.random.PRNGKey(3), 1, 2, 2, 192, 128, jnp.float32)
    with pytest.raises(NotImplementedError):
        flash_attention(q, k, v, interpret=True, block_q=128)


def test_sum_probabilities_one():
    """Degenerate v = ones ⇒ output rows are exactly 1 (softmax sums)."""
    b, nh, nkv, s, d = 1, 2, 2, 128, 128
    q, k, _ = _rand(jax.random.PRNGKey(4), b, nh, nkv, s, d, jnp.float32)
    v = jnp.ones((b, nkv, s, d), jnp.float32)
    out = flash_attention(q, k, v, causal=True, interpret=True, block_q=128)
    np.testing.assert_allclose(out, jnp.ones_like(out), atol=1e-5)
