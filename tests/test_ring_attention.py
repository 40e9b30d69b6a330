"""Ring attention vs single-device reference on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from bitorch_engine_tpu.parallel.ring_attention import ring_attention


def _ref_attention(q, k, v, causal=True):
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(float(d))
    if causal:
        L = q.shape[2]
        mask = jnp.tril(jnp.ones((L, L), bool))
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("n_dev", [4, 8])
def test_ring_attention_matches_reference(n_dev):
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), axis_names=("sp",))
    rng = np.random.default_rng(0)
    b, h, L, d = 2, 4, 8 * n_dev, 32
    q = jnp.asarray(rng.standard_normal((b, h, L, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, L, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, L, d)).astype(np.float32))
    out = ring_attention(q, k, v, mesh)
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_ring_attention_jit_under_mesh():
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("sp",))
    b, h, L, d = 1, 2, 32, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, L, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, L, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, L, d))
    f = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))
    out = f(q, k, v)
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("n_dev", [4, 8])
def test_ulysses_attention_matches_reference(n_dev):
    from bitorch_engine_tpu.parallel.ulysses import ulysses_attention

    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), axis_names=("sp",))
    rng = np.random.default_rng(3)
    b, h, L, d = 2, 8, 8 * n_dev, 32
    q = jnp.asarray(rng.standard_normal((b, h, L, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, L, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, L, d)).astype(np.float32))
    out = ulysses_attention(q, k, v, mesh)
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_ulysses_vs_ring_agree():
    from bitorch_engine_tpu.parallel.ulysses import ulysses_attention

    mesh = Mesh(np.asarray(jax.devices()), axis_names=("sp",))
    rng = np.random.default_rng(4)
    b, h, L, d = 1, 8, 64, 16
    q = jnp.asarray(rng.standard_normal((b, h, L, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, L, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, L, d)).astype(np.float32))
    o1 = ulysses_attention(q, k, v, mesh)
    o2 = ring_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-4, atol=2e-5)
