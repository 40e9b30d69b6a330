"""Ring-overlap dequant matmul (collective/compute overlap, north star).

8-device CPU mesh; the ring reduce-scatter + all-gather construction must
reproduce the plain dequant matmul.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.ops import quant
from bitorch_engine_tpu.ops.mpq_linear import mpq_linear
from bitorch_engine_tpu.parallel.mesh import make_mesh
from bitorch_engine_tpu.parallel.overlap import ring_row_parallel_mpq


@pytest.mark.parametrize("w_bit,tp", [(4, 8), (2, 4), (8, 8)])
def test_ring_row_parallel_matches_dense(w_bit, tp):
    k, n, gs, m = 1024, 512, 32, 4
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.02)
    qt = quant.quantize_mpq(w, w_bit=w_bit, group_size=gs)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))

    ref = mpq_linear(x, qt)
    mesh = make_mesh(dp=8 // tp, tp=tp)
    out = ring_row_parallel_mpq(x, qt, mesh, axis="tp")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_ring_rejects_bad_split():
    k, n, gs = 256, 128, 64  # K=256 over 8 devices breaks whole-group rows
    w = jnp.ones((k, n), jnp.float32)
    qt = quant.quantize_mpq(w, w_bit=4, group_size=gs)
    x = jnp.ones((2, k), jnp.float32)
    mesh = make_mesh(tp=8)
    with pytest.raises(ValueError):
        ring_row_parallel_mpq(x, qt, mesh, axis="tp")


def test_ring_comm_is_independent_of_next_chunk_compute():
    """The overlap property, proven at the jaxpr level.

    ICI timing is impossible in a 1-chip environment, but the property that
    LETS XLA's latency-hiding scheduler overlap the ring's communication
    with the dequant hot loop is structural: each ``ppermute`` (accumulator
    rotation) must be data-independent of the next chunk's dequant matmul
    (the ``lax.switch``/``cond`` selecting the column chunk).  If a cond ever
    consumed a ppermute output, the schedule would serialize.  This pins the
    D-step ring shape (D conds, D-1 ppermutes, 1 all-gather) and that no
    cond input is produced by a ppermute.
    """
    k, n, gs, m, d = 1024, 512, 32, 4, 8
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.02)
    qt = quant.quantize_mpq(w, w_bit=4, group_size=gs)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    mesh = make_mesh(tp=d)

    jaxpr = jax.make_jaxpr(lambda x: ring_row_parallel_mpq(x, qt, mesh, axis="tp"))(x)

    def eqns_of(jx):
        for eqn in jx.eqns:
            yield eqn
            for v in eqn.params.values():
                for sub in v if isinstance(v, (tuple, list)) else [v]:
                    inner = getattr(sub, "jaxpr", sub)
                    if hasattr(inner, "eqns"):
                        yield from eqns_of(inner)

    body = next(
        e for e in jaxpr.jaxpr.eqns if e.primitive.name == "shard_map"
    ).params["jaxpr"]
    if hasattr(body, "jaxpr"):  # ClosedJaxpr
        body = body.jaxpr
    eqns = list(eqns_of(body))
    perms = [e for e in eqns if e.primitive.name == "ppermute"]
    conds = [e for e in eqns if e.primitive.name == "cond"]
    assert len(perms) == d - 1
    assert len(conds) == d
    assert sum(e.primitive.name == "all_gather" for e in eqns) == 1
    perm_outs = {id(v) for e in perms for v in e.outvars}
    for c in conds:
        assert not any(id(v) in perm_outs for v in c.invars), (
            "a chunk's dequant matmul consumes a ppermute output — the ring "
            "communication could not overlap compute"
        )


def test_slice_concat_roundtrip():
    """slice_mpq_n is the inverse of concat_mpq (column-chunk roundtrip)."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((256, 384)).astype(np.float32))
    qt = quant.quantize_mpq(w, w_bit=4, group_size=64)
    parts = tuple(quant.slice_mpq_n(qt, i * 128, 128) for i in range(3))
    back = quant.concat_mpq(parts)
    np.testing.assert_array_equal(np.asarray(back.packed), np.asarray(qt.packed))
    np.testing.assert_array_equal(np.asarray(back.scales), np.asarray(qt.scales))
    d1 = quant.dequantize_mpq(parts[1], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(d1),
        np.asarray(quant.dequantize_mpq(qt, jnp.float32))[:, 128:256],
        rtol=0,
        atol=0,
    )
