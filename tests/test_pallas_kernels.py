"""Pallas kernel correctness (interpret mode on CPU; real TPU via bench.py).

Differential pattern per SURVEY.md §4: the fused kernel must match the
pure-XLA dequant+matmul reference in fp32 interpret mode.  Sub-byte widths
(1/2/4-bit) use the paired-lane magic-exponent unpack, which biases codes by
+128 and cancels the bias through the zeros term — that cancellation rounds
in f32, so those widths carry a small documented tolerance (~1e-4 abs here,
far below the bf16 output precision the kernel targets); 8-bit stays on the
exact shift-and-concat path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.ops import quant
from bitorch_engine_tpu.ops.pallas.dequant_matmul import (
    mpq_matmul_pallas,
    prepare_for_kernel,
)


def _tol(w_bit):
    # pair-layout widths: +128-bias cancellation rounds in f32
    return dict(rtol=2e-3, atol=5e-4) if w_bit in (1, 2, 4) else dict(rtol=1e-5, atol=1e-5)


def _mk(m, k, n, gs, w_bit, asym=False, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32), dtype)
    qt = quant.quantize_mpq(jnp.asarray(w), w_bit=w_bit, group_size=gs, asym=asym)
    return x, qt


@pytest.mark.parametrize("w_bit", [1, 2, 4, 8])
@pytest.mark.parametrize("m", [1, 8, 32])
def test_kernel_matches_xla_dequant(w_bit, m):
    k, n, gs = 512, 256, 128
    x, qt = _mk(m, k, n, gs, w_bit)
    out = mpq_matmul_pallas(x, qt, interpret=True)
    ref = jnp.dot(x, quant.dequantize_mpq(qt, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **_tol(w_bit))


def test_kernel_asym_converted():
    """asym tensors are converted to sym form; results must match the asym
    XLA dequant."""
    x, qt = _mk(4, 256, 128, 64, 4, asym=True)
    out = mpq_matmul_pallas(x, qt, interpret=True)
    ref = jnp.dot(x, quant.dequantize_mpq(qt, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **_tol(4))


def test_prepare_for_kernel_sym_equivalence():
    _, qt = _mk(1, 256, 128, 64, 4, asym=True)
    qt_sym = prepare_for_kernel(qt)
    assert not qt_sym.asym
    w_asym = np.asarray(quant.dequantize_mpq(qt, dtype=jnp.float32))
    w_sym = np.asarray(quant.dequantize_mpq(qt_sym, dtype=jnp.float32))
    np.testing.assert_allclose(w_sym, w_asym, rtol=1e-5, atol=1e-6)


def test_kernel_llm_shape_bf16():
    """bf16 activations at an LLM-ish shape (within bf16 tolerance)."""
    m, k, n, gs = 8, 1024, 512, 128
    x, qt = _mk(m, k, n, gs, 4, dtype=jnp.bfloat16)
    out = mpq_matmul_pallas(x, qt, interpret=True)
    ref = jnp.dot(
        x.astype(jnp.float32), quant.dequantize_mpq(qt, dtype=jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize(
    "w_bit,gs", [(1, 32), (2, 32), (2, 64), (2, 128), (4, 128)]
)
@pytest.mark.parametrize("m", [1, 8])
def test_kernel_a8_quad_matches_quantized_reference(w_bit, gs, m):
    """A8 regime (act_bits=8, tpu_quad layout): the int8-MXU kernel must
    match the explicit reference — quantize activations per token, matmul
    against the XLA-dequantized weight, re-apply the activation scale.
    The integer dot is exact, so the only rounding is the final f32→bf16."""
    from bitorch_engine_tpu.ops.pallas.dequant_matmul import relayout_tpu

    k, n = 512, 256
    x, qt = _mk(m, k, n, gs, w_bit, dtype=jnp.bfloat16)
    qt8 = relayout_tpu(qt, act_bits=8)
    assert qt8.layout == "tpu_quad" and qt8.act_bits == 8
    out = mpq_matmul_pallas(x, qt8, interpret=True)
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
    qx = jnp.round(xf / sx)
    ref = (qx @ quant.dequantize_mpq(qt, dtype=jnp.float32)) * sx
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=5e-3, atol=5e-4
    )


def test_kernel_a8_quality_vs_fp_activations():
    """A8 activation quantization must stay close to the fp-activation
    product (per-token int8 on smooth activations: sub-1% relative error)."""
    from bitorch_engine_tpu.ops.pallas.dequant_matmul import relayout_tpu

    x, qt = _mk(8, 512, 256, 32, 2, dtype=jnp.bfloat16)
    qt8 = relayout_tpu(qt, act_bits=8)
    out = np.asarray(mpq_matmul_pallas(x, qt8, interpret=True), np.float32)
    full = np.asarray(
        x.astype(jnp.float32) @ quant.dequantize_mpq(qt, dtype=jnp.float32)
    )
    rel = np.abs(out - full).max() / (np.abs(full).max() + 1e-9)
    assert rel < 2e-2, rel


def test_relayout_pair_to_quad_and_back():
    """Layout conversions preserve the dequantized weight exactly."""
    from bitorch_engine_tpu.ops.pallas.dequant_matmul import relayout_tpu

    _, qt = _mk(1, 256, 128, 32, 2)
    qp = relayout_tpu(qt)  # tpu_pair
    qq = relayout_tpu(qp, act_bits=8)  # pair → quad repack
    assert qp.layout == "tpu_pair" and qq.layout == "tpu_quad"
    w0 = np.asarray(quant.dequantize_mpq(qt, dtype=jnp.float32))
    wq = np.asarray(quant.dequantize_mpq(qq, dtype=jnp.float32))
    np.testing.assert_allclose(wq, w0, rtol=1e-6, atol=1e-7)


def test_kernel_q_perm_gathers_activations():
    rng = np.random.default_rng(3)
    k, n, gs = 256, 128, 64
    x, qt = _mk(2, k, n, gs, 4)
    perm = jnp.asarray(rng.permutation(k).astype(np.int32))
    qt_perm = qt.replace(q_perm=perm)
    out = mpq_matmul_pallas(x, qt_perm, interpret=True)
    ref = jnp.dot(x, quant.dequantize_mpq(qt_perm, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **_tol(4))


@pytest.mark.parametrize("m,k,n", [(8, 256, 128), (3, 100, 70)])
def test_xnor_gemm_pallas_interpret(m, k, n):
    """Pallas XNOR GEMM == sign matmul (interpret mode)."""
    from bitorch_engine_tpu.ops import packing
    from bitorch_engine_tpu.ops.pallas.binary_gemm import xnor_gemm_pallas

    rng = np.random.default_rng(11)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((n, k)).astype(np.float32)
    xp, _ = packing.pad_to_multiple(jnp.asarray(x), 1, 32, value=-1.0)
    wp, _ = packing.pad_to_multiple(jnp.asarray(w), 1, 32, value=-1.0)
    out = xnor_gemm_pallas(
        packing.pack_signs(xp), packing.pack_signs(wp), k, interpret=True
    )
    expected = np.where(x >= 0, 1.0, -1.0) @ np.where(w >= 0, 1.0, -1.0).T
    np.testing.assert_allclose(np.asarray(out), expected)


# --- fused multi-segment mixed-bit (MBWQ) kernel -----------------------------


def _mk_mbwq(m, k, n, strategy, seed=0, dtype=jnp.float32):
    from bitorch_engine_tpu.ops.mbwq_linear import quantize_mbwq

    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.02)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32), dtype)
    return x, quantize_mbwq(w, strategy)


@pytest.mark.parametrize("m", [1, 8, 32])
@pytest.mark.parametrize(
    "strategy",
    [
        {"bits": [4, 2], "bits_prop": [0.25, 0.75], "group_size": {"4": 128, "2": 128}},
        {"bits": [8, 4, 2], "bits_prop": [0.25, 0.5, 0.25], "group_size": {"8": 64, "4": 64, "2": 64}},
    ],
)
def test_mbwq_fused_kernel_matches_dequant(m, strategy):
    """ONE launch over all bit segments == XLA dequant of the MBWQTensor."""
    from bitorch_engine_tpu.ops.mbwq_linear import dequantize_mbwq
    from bitorch_engine_tpu.ops.pallas.mbwq_matmul import mbwq_matmul_pallas

    k, n = 1024, 256
    x, qt = _mk_mbwq(m, k, n, strategy)
    xp = x[:, qt.q_perm]  # caller-side activation gather
    out = mbwq_matmul_pallas(xp, qt, interpret=True)
    ref = jnp.dot(x, dequantize_mbwq(qt, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=5e-4)


def test_mbwq_fused_kernel_single_segment():
    from bitorch_engine_tpu.ops.mbwq_linear import dequantize_mbwq
    from bitorch_engine_tpu.ops.pallas.mbwq_matmul import mbwq_matmul_pallas

    strategy = {"bits": [4], "bits_prop": [1.0], "group_size": {"4": 128}}
    x, qt = _mk_mbwq(4, 512, 128, strategy)
    xp = x[:, qt.q_perm]
    out = mbwq_matmul_pallas(xp, qt, interpret=True)
    ref = jnp.dot(x, dequantize_mbwq(qt, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=5e-4)


def test_mbwq_uneven_props_group_size_fits():
    """Uneven bits_prop used to produce a group size that didn't divide the
    segment K (round-1 crash); now the group shrinks gracefully."""
    from bitorch_engine_tpu.ops.mbwq_linear import dequantize_mbwq, quantize_mbwq

    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((768, 64)).astype(np.float32))
    strategy = {"bits": [4, 2], "bits_prop": [0.3, 0.7], "group_size": {"4": 128, "2": 128}}
    qt = quantize_mbwq(w, strategy)  # 0.3*24 blocks = 7.2 → uneven split
    assert sum(s.in_features for s in qt.segments) == 768
    d = dequantize_mbwq(qt)
    assert d.shape == (768, 64)


@pytest.mark.parametrize("w_bit", [2, 4, 8])
def test_kernel_bf16_metadata(w_bit):
    """bf16-stored scales/zeros (relayout_tpu(meta_dtype=bf16)) stay within
    the metadata rounding budget: max relative error bounded by bf16's
    2^-9 ulp on the scale (plus code quantization already in both sides).

    Parity note: the reference's exl2/GPTQ formats store fp16 scales
    (``matrix_view.cuh``), so 16-bit metadata is the reference storage width
    — fp32 was this engine's own (more conservative) choice.
    """
    from bitorch_engine_tpu.ops.pallas.dequant_matmul import relayout_tpu

    m, k, n, gs = 8, 512, 256, 128
    x, qt = _mk(m, k, n, gs, w_bit)
    qt16 = relayout_tpu(qt, meta_dtype=jnp.bfloat16)
    assert qt16.scales.dtype == jnp.bfloat16
    out16 = mpq_matmul_pallas(x, qt16, interpret=True)
    ref = jnp.dot(x, quant.dequantize_mpq(qt, dtype=jnp.float32))
    # bf16 metadata rounds each group scale by <=2^-9 relative; the output
    # error is bounded by that times the per-group contribution magnitude
    # bf16 metadata rounds scales AND zeros by <=2^-9 relative; the zeros
    # term multiplies Σ_k x, so the end-to-end budget is ~1% of the output
    # range (vs the ~3%-granularity w4 code quantization both sides share)
    rng = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(ref), rtol=1e-2, atol=1e-2 * rng
    )


def test_relayout_meta_dtype_on_already_relayouted():
    """meta_dtype applies even when the packing layout is already canonical."""
    from bitorch_engine_tpu.ops.pallas.dequant_matmul import relayout_tpu

    _, qt = _mk(1, 256, 128, 64, 4)
    qt1 = relayout_tpu(qt)
    assert qt1.scales.dtype == jnp.float32
    qt2 = relayout_tpu(qt1, meta_dtype=jnp.bfloat16)
    assert qt2.scales.dtype == jnp.bfloat16 and qt2.zeros.dtype == jnp.bfloat16
    assert qt2.layout == qt1.layout


@pytest.mark.parametrize("w_bit,gs", [(4, 128), (2, 64), (8, 64)])
def test_dequant_kernel_matches_xla(w_bit, gs):
    """dequant_mpq_pallas (interpret) is bit-exact with dequantize_mpq on
    the relayouted tensor (both compute q*s - z in f32, cast at the end)."""
    from bitorch_engine_tpu.ops.pallas.dequant_matmul import (
        dequant_mpq_pallas,
        relayout_tpu,
    )

    w = jax.random.normal(jax.random.PRNGKey(0), (512, 256), jnp.float32) * 0.05
    qt = relayout_tpu(
        quant.quantize_mpq(w, w_bit=w_bit, group_size=gs), meta_dtype=jnp.bfloat16
    )
    got = dequant_mpq_pallas(qt, dtype=jnp.bfloat16, interpret=True)
    ref = quant.dequantize_mpq(qt, dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_tile_table_json_loading(tmp_path, monkeypatch):
    """Measured tile entries load from JSON ($BITORCH_TILE_TABLE) and
    override/extend the built-ins; removing the file restores built-ins.
    This is the adopt-the-sweep loop: tools/autotune_tiles.py --write
    maintains the file, the kernel reads it at import (VERDICT r4 wp8)."""
    import json

    from bitorch_engine_tpu.ops.pallas import dequant_matmul as dm

    path = tmp_path / "tiles.json"
    json.dump(
        {
            "tpu_pair": {"1234,5678,4": [1024, 512]},
            "tpu_quad": {"4096,4096,2": [4096, 2048]},
            "_meta": {"v99x:2026-01-01": "test provenance"},
        },
        path.open("w"),
    )
    monkeypatch.setenv("BITORCH_TILE_TABLE", str(path))
    try:
        loaded = dm.reload_tile_tables()
        assert loaded == {"tpu_pair": 1, "tpu_quad": 1}
        # new entry appears; file overrides the built-in quad entry
        assert dm._PAIR_TILE_TABLE[(1234, 5678, 4)] == (1024, 512)
        assert dm._QUAD_TILE_TABLE[(4096, 4096, 2)] == (4096, 2048)
        # built-ins survive the merge
        assert (4096, 4096, 4) in dm._PAIR_TILE_TABLE
    finally:
        monkeypatch.delenv("BITORCH_TILE_TABLE")
        dm.reload_tile_tables()
    # default state restored: the test entry is gone, and the quad entry is
    # whatever the checked-in default tile_tables.json (or builtin) says —
    # NOT the temp file's value
    assert (1234, 5678, 4) not in dm._PAIR_TILE_TABLE
    assert dm._QUAD_TILE_TABLE[(4096, 4096, 2)] != (4096, 2048)


@pytest.mark.parametrize("w_bit,gs", [(2, 128), (2, 64), (4, 128)])
def test_kernel_a8_quad_mid_sym_signed_codes(w_bit, gs):
    """mid_sym quantization (zeros ≡ mid·scales) routes the quad kernel
    onto SIGNED codes with no zeros correction (MPQTensor.zeros_mid) —
    must match the explicit A8 reference exactly like the unsigned path."""
    from bitorch_engine_tpu.ops.pallas.dequant_matmul import relayout_tpu

    rng = np.random.default_rng(11)
    k, n = 512, 256
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.02)
    x = jnp.asarray(rng.standard_normal((8, k)).astype(np.float32), jnp.bfloat16)
    qt = quant.quantize_mpq(w, w_bit=w_bit, group_size=gs, mid_sym=True)
    assert qt.zeros_mid
    qt8 = relayout_tpu(qt, meta_dtype=jnp.bfloat16, act_bits=8)
    assert qt8.layout == "tpu_quad" and qt8.zeros_mid
    out = mpq_matmul_pallas(x, qt8, interpret=True)
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
    qx = jnp.round(xf / sx)
    ref = (qx @ quant.dequantize_mpq(qt8, dtype=jnp.float32)) * sx
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=5e-3, atol=5e-4
    )


def test_relayout_detects_mid_zeros():
    """Concrete sym tensors whose zeros happen to equal mid·scales (e.g.
    exl2 ingests that predate the flag) are detected at relayout time."""
    from bitorch_engine_tpu.ops.pallas.dequant_matmul import relayout_tpu

    rng = np.random.default_rng(12)
    w = jnp.asarray(rng.standard_normal((512, 256)).astype(np.float32) * 0.02)
    qt = quant.quantize_mpq(w, w_bit=2, group_size=128, mid_sym=True)
    qt = qt.replace(zeros_mid=False)  # simulate a pre-flag tensor
    qt8 = relayout_tpu(qt, act_bits=8)
    assert qt8.zeros_mid
    # affine (min-max) zeros must NOT be detected
    qt_aff = quant.quantize_mpq(w, w_bit=2, group_size=128)
    assert not relayout_tpu(qt_aff, act_bits=8).zeros_mid


def test_mbwq_mid_sym_strategy():
    """strategy mid_sym=True propagates to every segment (zeros_mid) and
    the forward still matches the dequant reference."""
    from bitorch_engine_tpu.ops.mbwq_linear import (
        dequantize_mbwq,
        mbwq_linear,
        quantize_mbwq,
        strategy_dict,
    )

    rng = np.random.default_rng(13)
    w = jnp.asarray(rng.standard_normal((512, 128)).astype(np.float32) * 0.02)
    strat = strategy_dict([(4, 0.5), (2, 0.5)], 64, mid_sym=True)
    qt = quantize_mbwq(w, strat)
    assert all(s.zeros_mid for s in qt.segments)
    x = jnp.asarray(rng.standard_normal((4, 512)).astype(np.float32))
    out = mbwq_linear(x, qt)
    ref = x @ dequantize_mbwq(qt, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
