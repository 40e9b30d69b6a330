"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Greenfield coverage the reference lacks entirely (SURVEY.md §2.3): sharded
quantized matmul numerics, column/row-parallel specs, sharded training step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from bitorch_engine_tpu.ops import quant
from bitorch_engine_tpu.ops.mpq_linear import mpq_linear
from bitorch_engine_tpu.parallel import (
    make_mesh,
    make_sharding_rules,
    mpq_row_parallel_spec,
    partition_specs,
    shard_params,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, jax.devices()
    return make_mesh(dp=2, tp=4)


def _mk_qt(k=256, n=256, gs=64, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.02)
    return quant.quantize_mpq(w, w_bit=4, group_size=gs)


def test_column_parallel_matmul_matches(mesh):
    qt = _mk_qt()
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 256)).astype(np.float32))
    expected = np.asarray(mpq_linear(x, qt))
    sharded = shard_params({"q": qt}, mesh)
    out = jax.jit(mpq_linear)(x, sharded["q"])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)
    assert sharded["q"].packed.sharding.spec == P(None, "tp")


def test_row_parallel_matmul_matches(mesh):
    qt = _mk_qt()
    spec = mpq_row_parallel_spec(qt, "tp", n_shards=4)
    shardings = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), spec)
    qt_sharded = jax.device_put(qt, shardings)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((8, 256)).astype(np.float32))
    expected = np.asarray(mpq_linear(x, qt))
    out = jax.jit(mpq_linear)(x, qt_sharded)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_row_parallel_rejects_unalignable():
    qt = _mk_qt(k=256, n=256, gs=64)  # 32 packed rows, 4 groups
    with pytest.raises(ValueError):
        mpq_row_parallel_spec(qt, "tp", n_shards=8)  # 4 groups % 8 != 0


def test_rule_based_specs():
    qt = _mk_qt()
    params = {"layer_0": {"o_proj": {"qweight": qt}, "q_proj": {"qweight": qt}}}
    rules = make_sharding_rules({r"o_proj": "row", r"q_proj": "column"})
    specs = partition_specs(params, rules)
    assert specs["layer_0"]["o_proj"]["qweight"].packed == P("tp", None)
    assert specs["layer_0"]["q_proj"]["qweight"].packed == P(None, "tp")


def test_sharded_train_step_runs(mesh):
    """A DiodeMix step on a tp-sharded MPQ param produces the same packed
    update as the unsharded step."""
    from bitorch_engine_tpu.optim import DiodeHyperParams, diode_init, diode_update
    from bitorch_engine_tpu.qtensor import with_grad_shadow

    qt = with_grad_shadow(_mk_qt(k=128, n=256, gs=32))
    x = jnp.asarray(np.random.default_rng(3).standard_normal((16, 128)).astype(np.float32))
    y = jnp.asarray(np.random.default_rng(4).standard_normal((16, 256)).astype(np.float32))
    hp = DiodeHyperParams(lr=1e-3)

    def step(params, opt_state):
        def loss_fn(p):
            return jnp.mean((mpq_linear(x, p["q"]) - y) ** 2)

        grads = jax.grad(loss_fn, allow_int=True)(params)
        return diode_update(grads, opt_state, params, hp)

    params = {"q": qt}
    state = diode_init(params, hp=hp)
    ref_params, _ = jax.jit(step)(params, state)

    sharded = shard_params(params, mesh)
    with mesh:
        out_params, _ = jax.jit(step)(sharded, state)
    np.testing.assert_array_equal(
        np.asarray(ref_params["q"].packed), np.asarray(out_params["q"].packed)
    )


def test_optimizer_state_sharding(mesh):
    """FSDP-style optimizer-moment sharding: sharded step == unsharded step."""
    from jax.sharding import NamedSharding
    from bitorch_engine_tpu.optim import DiodeHyperParams, diode_init, diode_update
    from bitorch_engine_tpu.parallel.sharding import optimizer_partition_specs
    from bitorch_engine_tpu.qtensor import with_grad_shadow

    qt = with_grad_shadow(_mk_qt(k=128, n=256, gs=32))
    params = {"q": qt}
    hp = DiodeHyperParams(lr=1e-3)
    state = diode_init(params, hp=hp)

    specs = optimizer_partition_specs(state, params, fsdp_axis=None)
    shardings = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)
    state_sharded = jax.device_put(state, shardings)

    x = jnp.asarray(np.random.default_rng(7).standard_normal((8, 128)).astype(np.float32))
    y = jnp.asarray(np.random.default_rng(8).standard_normal((8, 256)).astype(np.float32))

    def step(params, opt_state):
        def loss_fn(p):
            return jnp.mean((mpq_linear(x, p["q"]) - y) ** 2)

        grads = jax.grad(loss_fn, allow_int=True)(params)
        return diode_update(grads, opt_state, params, hp)

    ref_p, _ = jax.jit(step)(params, state)
    with mesh:
        out_p, out_s = jax.jit(step)(shard_params(params, mesh), state_sharded)
    np.testing.assert_array_equal(
        np.asarray(ref_p["q"].packed), np.asarray(out_p["q"].packed)
    )
