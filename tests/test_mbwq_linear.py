"""MBWQ (mixed-bit) linear tests.

Reference patterns: mixed-bit strategy fixtures
(``test_nbit_linear_mixbits.py:26-29``), MPQ-vs-MBWQ consistency
(``test_nbit_linear.py:367-404``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.ops import quant
from bitorch_engine_tpu.ops.mbwq_linear import (
    average_bits,
    dequantize_mbwq,
    mbwq_linear,
    quantize_mbwq,
)
from bitorch_engine_tpu.ops.mpq_linear import mpq_linear
from bitorch_engine_tpu.qtensor import with_grad_shadow

STRATEGY = {"bits": [4, 2], "bits_prop": [0.75, 0.25], "group_size": {"4": 32, "2": 32}}


def _mk(k=256, n=64, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    return jnp.asarray(w)


def test_average_bits_and_segments():
    w = _mk()
    qt = quantize_mbwq(w, STRATEGY)
    assert qt.bit_widths == (4, 2)
    assert abs(average_bits(qt) - 3.5) < 0.01
    assert qt.in_features == 256 and qt.out_features == 64


def test_forward_matches_dequant_matmul():
    w = _mk()
    qt = quantize_mbwq(w, STRATEGY)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 256)).astype(np.float32))
    out = mbwq_linear(x, qt)
    ref = x @ dequantize_mbwq(qt, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_high_energy_rows_get_more_bits():
    """Rows with large norms must land in the 4-bit segment → better recon."""
    rng = np.random.default_rng(2)
    k, n = 128, 64
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.01
    w[:32] *= 20.0  # first block much larger energy
    qt = quantize_mbwq(jnp.asarray(w), STRATEGY)
    # the 4-bit segment must contain rows 0..31
    four_bit_rows = np.asarray(qt.q_perm[: qt.segments[0].in_features])
    assert set(range(32)).issubset(set(four_bit_rows.tolist()))


def test_reconstruction_beats_uniform_2bit():
    w = _mk(seed=3)
    qt_mix = quantize_mbwq(w, STRATEGY)
    qt_2 = quant.quantize_mpq(w, w_bit=2, group_size=32)
    err_mix = float(jnp.linalg.norm(dequantize_mbwq(qt_mix) - w))
    err_2 = float(jnp.linalg.norm(quant.dequantize_mpq(qt_2, jnp.float32) - w))
    assert err_mix < err_2


def test_channel_scale_applied():
    w = _mk(seed=4)
    cs = jnp.asarray(np.random.default_rng(5).uniform(0.5, 2.0, 256).astype(np.float32))
    qt = quantize_mbwq(w, STRATEGY, channel_scale=cs)
    x = jnp.asarray(np.random.default_rng(6).standard_normal((2, 256)).astype(np.float32))
    out = mbwq_linear(x, qt)
    ref = (x * cs) @ dequantize_mbwq(qt, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_grad_flow():
    w = _mk(seed=7)
    qt = with_grad_shadow(quantize_mbwq(w, STRATEGY))
    x = jnp.asarray(np.random.default_rng(8).standard_normal((4, 256)).astype(np.float32))

    def loss(x, qt):
        return jnp.sum(mbwq_linear(x, qt) ** 2)

    gx, gqt = jax.grad(loss, argnums=(0, 1), allow_int=True)(x, qt)
    assert gqt.grad_shadow.shape == (256, 64)
    assert float(jnp.sum(jnp.abs(gqt.grad_shadow))) > 0
    # grad_x consistency vs dequant weight
    out = np.asarray(mbwq_linear(x, qt))
    w_hat = np.asarray(dequantize_mbwq(qt, dtype=jnp.float32))
    np.testing.assert_allclose(
        np.asarray(gx), (2 * out) @ w_hat.T, rtol=1e-3, atol=1e-4
    )


def test_jit():
    w = _mk(seed=9)
    qt = quantize_mbwq(w, STRATEGY)
    x = jnp.ones((2, 3, 256), jnp.float32)
    out = jax.jit(mbwq_linear)(x, qt)
    assert out.shape == (2, 3, 64)


def test_block_gather_matches_row_gather():
    """perm_block block-gather of activations is bit-identical to the
    generic lane-axis row gather (and quantize_mbwq sets perm_block)."""
    w = _mk(k=256, n=64, seed=3)
    qt = quantize_mbwq(w, STRATEGY)
    assert qt.perm_block == 32  # base group size by construction
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 256)), jnp.float32)
    out_block = mbwq_linear(x, qt)
    out_rows = mbwq_linear(x, qt.replace(perm_block=0))
    np.testing.assert_array_equal(np.asarray(out_block), np.asarray(out_rows))


def test_detect_perm_block():
    from bitorch_engine_tpu.utils.ingest import detect_perm_block

    blocks = np.random.default_rng(0).permutation(8)
    perm = (blocks[:, None] * 32 + np.arange(32)).reshape(-1)
    assert detect_perm_block(perm) == 32
    # whole-array identity is 128-block structured
    assert detect_perm_block(np.arange(256)) == 128
    # arbitrary act-order permutation: no block structure
    assert detect_perm_block(np.random.default_rng(1).permutation(256)) == 0


def test_per_bit_group_sizes():
    """Mixed per-bit group sizes: w4 at g64, w2 at g128 (the serving
    operating point whose per-group dot K matches the MXU's native 128).
    Segment group metadata and forward numerics must both be exact."""
    w = _mk(k=1024, n=128)
    strat = {"bits": [4, 2], "bits_prop": [0.25, 0.75], "group_size": {"4": 64, "2": 128}}
    qt = quantize_mbwq(w, strat)
    by_bits = {s.w_bit: s for s in qt.segments}
    assert by_bits[4].group_size == 64 and by_bits[2].group_size == 128
    # segment split is block-aligned to the larger group size
    assert by_bits[2].in_features % 128 == 0
    x = jnp.asarray(np.random.default_rng(3).standard_normal((4, 1024)).astype(np.float32))
    out = mbwq_linear(x, qt)
    ref = x @ dequantize_mbwq(qt, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_model_strategy_entry_with_group_size():
    """LlamaConfig.mbwq_strategy entries accept (bits, prop, group_size)."""
    from bitorch_engine_tpu.models.llama import LlamaModel, tiny_llama

    cfg = tiny_llama(mbwq_strategy=((4, 0.25), (2, 0.75, 128)), group_size=64)
    model = LlamaModel(cfg)
    toks = jnp.ones((2, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)
    logits, _ = model.apply(params, toks, cache_len=jnp.zeros((), jnp.int32))
    assert bool(jnp.isfinite(logits).all())
