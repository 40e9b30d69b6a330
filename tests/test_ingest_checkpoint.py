"""Checkpoint ingestion + orbax round-trip tests.

Synthesizes GPTQ / GBA-format tensors (the formats the reference consumes,
``nbit/layer.py:397-455``) and checks bit-exact ingestion; exercises
orbax save/load of a quantized params tree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bitorch_engine_tpu.ops import packing, quant
from bitorch_engine_tpu.utils import ingest
from bitorch_engine_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_mpq_from_gptq_bit_exact():
    """Round-trip: our asym quantizer's tensors → GPTQ dict → ingest →
    identical dequantized weights."""
    rng = np.random.default_rng(0)
    k, n, gs, wb = 128, 64, 32, 4
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    qt = quant.quantize_mpq(jnp.asarray(w), w_bit=wb, group_size=gs, asym=True)
    # export as a GPTQ state dict
    sd = {
        "qweight": np.asarray(qt.packed),
        "qzeros": np.asarray(qt.zeros),
        "scales": np.asarray(qt.scales),
        "g_idx": (np.arange(k) // gs).astype(np.int32),
    }
    qt2 = ingest.mpq_from_gptq(**sd)
    assert qt2.w_bit == wb and qt2.group_size == gs and qt2.asym
    assert qt2.g_idx is None  # sequential g_idx dropped for the fast path
    np.testing.assert_array_equal(
        np.asarray(quant.dequantize_mpq(qt2, jnp.float32)),
        np.asarray(quant.dequantize_mpq(qt, jnp.float32)),
    )


def test_mpq_from_gptq_act_order():
    """Non-sequential g_idx (act-order) must be preserved."""
    rng = np.random.default_rng(1)
    k, n, gs, wb = 64, 64, 32, 4
    g_idx = rng.permutation(np.arange(k) // gs).astype(np.int32)
    qweight = rng.integers(-(2**31), 2**31, (k // 32 * wb, n), dtype=np.int64).astype(np.int32)
    qzeros = rng.integers(-(2**31), 2**31, (2, n // 32 * wb), dtype=np.int64).astype(np.int32)
    scales = rng.uniform(0.01, 0.1, (2, n)).astype(np.float32)
    qt = ingest.mpq_from_gptq(qweight, qzeros, scales, g_idx)
    assert qt.g_idx is not None
    w = quant.dequantize_mpq(qt, jnp.float32)
    assert np.isfinite(np.asarray(w)).all()


def test_mpq_from_gba_sym_double_quant():
    """Synthesize a GBA sym double-quantized layer; ingestion must match the
    reference decompression math (high/low nibble split)."""
    rng = np.random.default_rng(2)
    k, n, gs, wb, dqg = 128, 64, 32, 2, 32
    g = k // gs
    qweight = rng.integers(-(2**31), 2**31, (k // 32 * wb, n), dtype=np.int64).astype(np.int32)
    qstat = rng.integers(0, 256, (g, n // dqg, dqg), dtype=np.int64).astype(np.uint8)
    tensors = {
        "qstatistic": qstat,
        "qzeros_zeros": rng.uniform(0, 2, (g, n // dqg, 1)).astype(np.float32),
        "qzeros_scales": rng.uniform(0.5, 1.5, (g, n // dqg, 1)).astype(np.float32),
        "qscales_zeros": rng.uniform(0, 2, (g, n // dqg, 1)).astype(np.float32),
        "qscales_scales": rng.uniform(0.5, 1.5, (g, n // dqg, 1)).astype(np.float32),
    }
    qt = ingest.mpq_from_gba(qweight, tensors, w_bit=wb, group_size=gs, asym=False)
    # reference math
    qs = qstat.astype(np.float32)
    exp_scales = ((qs // 16) - tensors["qscales_zeros"]) * tensors["qscales_scales"]
    exp_zeros = ((qs % 16) - tensors["qzeros_zeros"]) * tensors["qzeros_scales"]
    np.testing.assert_allclose(
        np.asarray(qt.scales), exp_scales.reshape(g, n), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(qt.zeros), exp_zeros.reshape(g, n), rtol=1e-6)


def test_orbax_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    w = rng.standard_normal((128, 64)).astype(np.float32) * 0.05
    qt = quant.quantize_mpq(jnp.asarray(w), w_bit=4, group_size=32)
    params = {"layer": {"qweight": qt, "bias": jnp.zeros((64,))}}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params)
    restored = load_checkpoint(path, params)
    np.testing.assert_array_equal(
        np.asarray(restored["layer"]["qweight"].packed), np.asarray(qt.packed)
    )
    assert restored["layer"]["qweight"].w_bit == 4
    out_a = quant.dequantize_mpq(params["layer"]["qweight"], jnp.float32)
    out_b = quant.dequantize_mpq(restored["layer"]["qweight"], jnp.float32)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
