"""Pipeline parallelism (GPipe schedule over the 'pp' mesh axis).

Greenfield vs the reference (SURVEY §2.3: no PP anywhere); equivalence is
against the sequential stage application, per the repo's differential test
convention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from bitorch_engine_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_stages,
    stage_shardings,
)


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs >= {n} devices")
    return Mesh(np.asarray(devs[:n]).reshape(n), axis_names=("pp",))


def test_pipeline_matches_sequential():
    mesh = _mesh(4)
    rng = np.random.default_rng(0)
    stages = [
        {"w": jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32) * 0.3),
         "b": jnp.asarray(rng.standard_normal(16).astype(np.float32))}
        for _ in range(4)
    ]

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    x = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    ref = x
    for p in stages:
        ref = stage_fn(p, ref)

    stacked = stack_stages(stages)
    stacked = jax.device_put(stacked, stage_shardings(mesh, stacked))
    with mesh:
        got = jax.jit(
            lambda sp, x: pipeline_apply(stage_fn, sp, x, mesh, num_microbatches=4)
        )(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6, rtol=1e-6)


def test_pipeline_gradients_match_sequential():
    mesh = _mesh(4)
    rng = np.random.default_rng(1)
    stages = [
        {"w": jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32) * 0.3)}
        for _ in range(4)
    ]

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"])

    x = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
    stacked = stack_stages(stages)

    def loss_pipe(sp):
        return jnp.mean(pipeline_apply(stage_fn, sp, x, mesh, num_microbatches=2) ** 2)

    def loss_seq(sp):
        h = x
        for i in range(4):
            h = stage_fn(jax.tree_util.tree_map(lambda a: a[i], sp), h)
        return jnp.mean(h**2)

    with mesh:
        g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(g_pipe), jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_pipeline_quantized_stages():
    """PP composes with packed QTensor stage params (the engine's point)."""
    from bitorch_engine_tpu.ops.mpq_linear import mpq_linear
    from bitorch_engine_tpu.ops.quant import quantize_mpq

    mesh = _mesh(4)
    rng = np.random.default_rng(2)
    stages = [
        quantize_mpq(
            jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32) * 0.2),
            w_bit=4,
            group_size=32,
        )
        for _ in range(4)
    ]

    def stage_fn(qt, x):
        return jax.nn.gelu(mpq_linear(x, qt))

    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    ref = x
    for qt in stages:
        ref = stage_fn(qt, ref)
    stacked = stack_stages(stages)
    with mesh:
        got = jax.jit(
            lambda sp, x: pipeline_apply(stage_fn, sp, x, mesh, num_microbatches=4)
        )(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)
