"""Bit-exact cross-validation against the reference's executable torch math.

The strongest obtainable evidence for format parity in this sandbox (no
network, no real checkpoints): the reference's pack/unpack/double-quant code
is pure torch and runs on the CPU torch installed here.  Every test in this
file synthesizes random quantized buffers, runs BOTH implementations, and
asserts bit-exact equality (fp32 ops in the same order are IEEE-identical).

Reference functions under test (all pure torch, imported via
``tests/_reference_torch.py``):

* ``unpack_qweight`` — 3 styles, ``nbit/cuda/utils.py:5-69``
* ``pack_fp_weight`` — ``nbit/cuda/utils.py:72-147``
* ``gptq_style_unpacking`` / ``gptq_style_zeros_packing`` —
  ``utils/quant_operators.py:310-368``
* ``MPQLinearCuda.prepare_params`` GBA double-quant decompression —
  ``nbit/cuda/mpq_layer.py:163-204``
* ``make_group_map`` — ``nbit/cuda/utils.py:150-187``
* ``nv_tensor_quant`` / ``q4_quantization`` / ``q8_quantization`` —
  ``quant_operators.py:7-307``

This retires the circular GPTQ ingest test (quantize-with-repo /
re-ingest-with-repo): ``test_gptq_ingest_reference_packed`` feeds buffers
packed BY THE REFERENCE into the repo ingest, and
``test_quantize_mpq_reference_readable`` feeds repo-quantized buffers into
the reference unpack.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bitorch_engine_tpu.ops import packing
from bitorch_engine_tpu.ops.quant import (
    decompress_gba_asym,
    decompress_gba_sym,
    dequantize_mpq,
    nv_tensor_quant,
    q4_quantization,
    q8_quantization,
    quantize_mpq,
    repack_mpq,
)
from bitorch_engine_tpu.qtensor import MPQTensor
from bitorch_engine_tpu.utils.ingest import exl2_group_map, mpq_from_gba, mpq_from_gptq

from _reference_torch import load_reference

REF = load_reference()
torch = REF.torch

K, N = 256, 128


def _dequant_unfused(qt):
    """dequantize_mpq with op-by-op (eager) execution.

    The sym dequant ``q * scales[g] - zeros[g]`` is an FMA candidate: under
    jit XLA fuses it into one correctly-rounded fma, while torch executes
    mul-then-sub (two roundings) — a 1-ulp representation-independent
    difference.  Eager execution matches torch's op-by-op rounding so the
    FORMAT parity assertions stay bit-exact.
    """
    with jax.disable_jit():
        return np.asarray(dequantize_mpq(qt, dtype=jnp.float32))


def _rng(seed):
    return np.random.default_rng(seed)


def _rand_packed(rng, k, n, w_bit):
    return rng.integers(-(2**31), 2**31, size=(k // 32 * w_bit, n), dtype=np.int64).astype(np.int32)


def _rand_packed_zeros(rng, g, n, w_bit):
    return rng.integers(-(2**31), 2**31, size=(g, n // 32 * w_bit), dtype=np.int64).astype(np.int32)


def _ref_qweight(packed, w_bit, asym, scales=None, zeros=None, g_idx=None, q_perm=None, group_size=64):
    """Build an MPQWeightParameter carrying the attrs unpack/pack read."""
    qw = REF.MPQWeightParameter(
        data=torch.from_numpy(np.ascontiguousarray(packed)),
        requires_grad=False,
        w_bit=w_bit,
        asym=asym,
        group_size=group_size,
    )
    qw.layer_type = 1
    qw.scales = None if scales is None else torch.from_numpy(np.ascontiguousarray(scales))
    qw.zeros = None if zeros is None else torch.from_numpy(np.ascontiguousarray(zeros))
    qw.g_idx = None if g_idx is None else torch.from_numpy(np.ascontiguousarray(g_idx))
    qw.q_perm = None if q_perm is None else torch.from_numpy(np.ascontiguousarray(q_perm))
    return qw


def _g_idx(k, group_size, shuffle_seed=None):
    g = np.arange(k, dtype=np.int32) // group_size
    if shuffle_seed is not None:
        _rng(shuffle_seed).shuffle(g)  # act-order style arbitrary row→group map
    return g


# ---------------------------------------------------------------------------
# unpack_qweight — the 3 dequant styles
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("w_bit", [2, 4, 8])
@pytest.mark.parametrize("group_size", [32, 64])
@pytest.mark.parametrize("actorder", [False, True])
def test_unpack_qweight_asym(w_bit, group_size, actorder):
    """Style 1: classical GPTQ asym, with sequential or shuffled g_idx."""
    rng = _rng(hash((w_bit, group_size, actorder)) % 2**32)
    g = K // group_size
    packed = _rand_packed(rng, K, N, w_bit)
    zeros = _rand_packed_zeros(rng, g, N, w_bit)
    scales = rng.standard_normal((g, N), dtype=np.float32) * 0.01
    g_idx = _g_idx(K, group_size, shuffle_seed=7 if actorder else None)

    ref = REF.unpack_qweight(
        _ref_qweight(packed, w_bit, True, scales, zeros, g_idx, group_size=group_size)
    ).numpy()

    qt = mpq_from_gptq(packed, zeros, scales, g_idx=g_idx, w_bit=w_bit, group_size=group_size)
    ours = np.asarray(dequantize_mpq(qt, dtype=jnp.float32))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("w_bit", [2, 4, 8])
def test_unpack_qweight_sym_gidx(w_bit):
    """Style 2: GBA sym with g_idx — w = q * scales[g] - zeros[g]."""
    rng = _rng(w_bit)
    group_size = 64
    g = K // group_size
    packed = _rand_packed(rng, K, N, w_bit)
    scales = rng.standard_normal((g, N), dtype=np.float32) * 0.01
    zeros = rng.standard_normal((g, N), dtype=np.float32) * 0.1
    g_idx = _g_idx(K, group_size, shuffle_seed=3)

    ref = REF.unpack_qweight(
        _ref_qweight(packed, w_bit, False, scales, zeros, g_idx, group_size=group_size)
    ).numpy()

    qt = MPQTensor(
        packed=jnp.asarray(packed),
        scales=jnp.asarray(scales),
        zeros=jnp.asarray(zeros),
        g_idx=jnp.asarray(g_idx),
        w_bit=w_bit,
        group_size=group_size,
        asym=False,
    )
    ours = _dequant_unfused(qt)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("w_bit", [2, 4, 8])
def test_unpack_qweight_sym_nogidx(w_bit):
    """Style 3: GBA sym without g_idx — contiguous groups, repeated metadata."""
    rng = _rng(w_bit + 100)
    group_size = 64
    g = K // group_size
    packed = _rand_packed(rng, K, N, w_bit)
    scales = rng.standard_normal((g, N), dtype=np.float32) * 0.01
    zeros = rng.standard_normal((g, N), dtype=np.float32) * 0.1

    ref = REF.unpack_qweight(
        _ref_qweight(packed, w_bit, False, scales, zeros, None, group_size=group_size)
    ).numpy()

    qt = MPQTensor(
        packed=jnp.asarray(packed),
        scales=jnp.asarray(scales),
        zeros=jnp.asarray(zeros),
        w_bit=w_bit,
        group_size=group_size,
        asym=False,
    )
    ours = _dequant_unfused(qt)
    np.testing.assert_array_equal(ours, ref)


def test_gptq_style_unpacking_qperm():
    """q_perm scatter parity vs gptq_style_unpacking (quant_operators.py:337-341)."""
    rng = _rng(42)
    w_bit, group_size = 4, 64
    g = K // group_size
    packed = _rand_packed(rng, K, N, w_bit)
    scales = rng.standard_normal((g, N), dtype=np.float32) * 0.01
    zeros = rng.standard_normal((g, N), dtype=np.float32) * 0.1
    q_perm = rng.permutation(K).astype(np.int32)

    ref, _ = REF.gptq_style_unpacking(
        _ref_qweight(packed, w_bit, False, scales, zeros, None, q_perm, group_size)
    )
    qt = MPQTensor(
        packed=jnp.asarray(packed),
        scales=jnp.asarray(scales),
        zeros=jnp.asarray(zeros),
        q_perm=jnp.asarray(q_perm),
        w_bit=w_bit,
        group_size=group_size,
        asym=False,
    )
    ours = _dequant_unfused(qt)
    np.testing.assert_array_equal(ours, ref.numpy())


# ---------------------------------------------------------------------------
# pack_fp_weight — the repack inverse (DiodeMix MPQ update path)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("w_bit", [2, 4, 8])
@pytest.mark.parametrize("actorder", [False, True])
def test_pack_fp_weight_asym(w_bit, actorder):
    rng = _rng(hash((w_bit, actorder, "pack")) % 2**32)
    group_size = 64
    g = K // group_size
    zeros = _rand_packed_zeros(rng, g, N, w_bit)
    scales = (np.abs(rng.standard_normal((g, N))) + 0.1).astype(np.float32) * 0.02
    g_idx = _g_idx(K, group_size, shuffle_seed=5 if actorder else None)
    weight = rng.standard_normal((K, N)).astype(np.float32) * 0.05

    qw = _ref_qweight(
        np.zeros((K // 32 * w_bit, N), np.int32), w_bit, True, scales, zeros, g_idx,
        group_size=group_size,
    )
    ref = REF.pack_fp_weight(torch.from_numpy(weight), qw).numpy()

    qt = mpq_from_gptq(
        np.zeros((K // 32 * w_bit, N), np.int32), zeros, scales,
        g_idx=g_idx, w_bit=w_bit, group_size=group_size,
    )
    ours = np.asarray(repack_mpq(jnp.asarray(weight), qt))
    if actorder:
        # ingest canonicalizes act-order to group-sorted rows + q_perm, so
        # the packed BUFFERS differ by that documented row sort; the codes
        # in logical row order must still bit-match the reference's
        from bitorch_engine_tpu.ops import packing as pk

        ours_codes = np.asarray(pk.unpack_rows(jnp.asarray(ours), w_bit))
        logical = np.empty_like(ours_codes)
        logical[np.asarray(qt.q_perm)] = ours_codes
        ref_codes = np.asarray(pk.unpack_rows(jnp.asarray(ref), w_bit))
        np.testing.assert_array_equal(logical, ref_codes)
    else:
        np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("gidx", [False, True])
@pytest.mark.parametrize("qperm", [False, True])
def test_pack_fp_weight_sym(gidx, qperm):
    if gidx and qperm:
        pytest.skip("reference applies q_perm only on the no-g_idx branch")
    rng = _rng(hash((gidx, qperm)) % 2**32)
    w_bit, group_size = 4, 64
    g = K // group_size
    scales = (np.abs(rng.standard_normal((g, N))) + 0.1).astype(np.float32) * 0.02
    zeros = rng.standard_normal((g, N)).astype(np.float32) * 0.1
    g_idx = _g_idx(K, group_size, shuffle_seed=9) if gidx else None
    q_perm = rng.permutation(K).astype(np.int32) if qperm else None
    weight = rng.standard_normal((K, N)).astype(np.float32) * 0.05

    qw = _ref_qweight(
        np.zeros((K // 32 * w_bit, N), np.int32), w_bit, False, scales, zeros,
        g_idx, q_perm, group_size,
    )
    ref = REF.pack_fp_weight(torch.from_numpy(weight), qw).numpy()

    qt = MPQTensor(
        packed=jnp.zeros((K // 32 * w_bit, N), jnp.int32),
        scales=jnp.asarray(scales),
        zeros=jnp.asarray(zeros),
        g_idx=None if g_idx is None else jnp.asarray(g_idx),
        q_perm=None if q_perm is None else jnp.asarray(q_perm),
        w_bit=w_bit,
        group_size=group_size,
        asym=False,
    )
    ours = np.asarray(repack_mpq(jnp.asarray(weight), qt))
    np.testing.assert_array_equal(ours, ref)


# ---------------------------------------------------------------------------
# cross-implementation round trips (replaces the circular GPTQ ingest test)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("w_bit", [2, 4, 8])
@pytest.mark.parametrize("asym", [False, True])
def test_quantize_mpq_reference_readable(w_bit, asym):
    """Repo-quantized buffers must dequantize identically through the REFERENCE."""
    rng = _rng(hash((w_bit, asym, "q")) % 2**32)
    group_size = 64
    weight = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    qt = quantize_mpq(jnp.asarray(weight), w_bit=w_bit, group_size=group_size, asym=asym)

    g_idx = _g_idx(K, group_size)
    ref = REF.unpack_qweight(
        _ref_qweight(
            np.asarray(qt.packed), w_bit, asym,
            np.asarray(qt.scales), np.asarray(qt.zeros),
            g_idx if asym else None, group_size=group_size,
        )
    ).numpy()
    ours = np.asarray(dequantize_mpq(qt, dtype=jnp.float32)) if asym else _dequant_unfused(qt)
    np.testing.assert_array_equal(ours, ref)


def test_gptq_ingest_reference_packed():
    """Buffers packed BY THE REFERENCE ingest bit-exactly (non-circular).

    fp weight → reference pack_fp_weight + gptq_style_zeros_packing →
    repo mpq_from_gptq → dequantize_mpq must equal reference unpack_qweight.
    """
    rng = _rng(1234)
    w_bit, group_size = 4, 64
    g = K // group_size
    scales = (np.abs(rng.standard_normal((g, N))) + 0.1).astype(np.float32) * 0.02
    unpacked_zeros = rng.integers(1, 2**w_bit, size=(g, N)).astype(np.int32)
    g_idx = _g_idx(K, group_size)
    weight = rng.standard_normal((K, N)).astype(np.float32) * 0.05

    packed_zeros = REF.gptq_style_zeros_packing(
        torch.from_numpy(unpacked_zeros), w_bit, N, group_size
    ).numpy()
    qw = _ref_qweight(
        np.zeros((K // 32 * w_bit, N), np.int32), w_bit, True, scales,
        packed_zeros, g_idx, group_size=group_size,
    )
    packed = REF.pack_fp_weight(
        torch.from_numpy(weight), qw,
        unpacked_zeros=torch.from_numpy(unpacked_zeros.astype(np.float32)),
    ).numpy()
    qw2 = _ref_qweight(packed, w_bit, True, scales, packed_zeros, g_idx, group_size=group_size)
    ref = REF.unpack_qweight(qw2).numpy()

    qt = mpq_from_gptq(packed, packed_zeros, scales, g_idx=g_idx, w_bit=w_bit, group_size=group_size)
    ours = np.asarray(dequantize_mpq(qt, dtype=jnp.float32))
    np.testing.assert_array_equal(ours, ref)


def test_pack_cols_matches_gptq_style_zeros_packing():
    rng = _rng(77)
    for w_bit in (2, 4, 8):
        g = 4
        zeros = rng.integers(1, 2**w_bit + 1, size=(g, N)).astype(np.int32)
        ref = REF.gptq_style_zeros_packing(torch.from_numpy(zeros), w_bit, N, 64).numpy()
        ours = np.asarray(packing.pack_cols(jnp.asarray(zeros), w_bit))
        np.testing.assert_array_equal(ours, ref)
        # and the unpack inverse restores the +1-offset zeros
        np.testing.assert_array_equal(
            np.asarray(packing.unpack_cols(jnp.asarray(ref), w_bit)), zeros
        )


# ---------------------------------------------------------------------------
# GBA double-quant decompression (MPQLinearCuda.prepare_params)
# ---------------------------------------------------------------------------


def _fill(t, rng):
    if t.dtype == torch.uint8:
        t.copy_(torch.from_numpy(rng.integers(0, 256, size=tuple(t.shape), dtype=np.uint8)))
    else:
        t.copy_(torch.from_numpy((rng.standard_normal(tuple(t.shape)) * 0.5 + 1.0).astype(np.float32)))


def test_gba_prepare_params_sym_dq2():
    """dq_mode=2 (LLaMA-2/3 GBA): registered buffer shapes, bit-exact."""
    rng = _rng(11)
    lay = REF.MPQLinearCuda(
        in_channels=K, out_channels=N, w_bit=4, group_size=64, dtype=torch.float32,
        dq_group_size=32, dq_mode=2, asym=False, requires_grad=False,
    )
    for name in ("qstatistic", "qzeros_zeros", "qzeros_scales", "qscales_zeros", "qscales_scales"):
        _fill(getattr(lay, name), rng)
    qstat = lay.qstatistic.numpy().copy()
    qzz, qzs = lay.qzeros_zeros.numpy().copy(), lay.qzeros_scales.numpy().copy()
    qsz, qss = lay.qscales_zeros.numpy().copy(), lay.qscales_scales.numpy().copy()
    lay.prepare_params()

    scales, zeros = decompress_gba_sym(
        jnp.asarray(qstat), jnp.asarray(qzz), jnp.asarray(qzs),
        jnp.asarray(qsz), jnp.asarray(qss), out_channels=N, dq_mode=2,
    )
    np.testing.assert_array_equal(np.asarray(scales), lay.scales.numpy())
    np.testing.assert_array_equal(np.asarray(zeros), lay.zeros.numpy())


def test_gba_prepare_params_sym_dq1():
    """dq_mode=1 (LLaMA-1-era GBA): per-channel scale affine.

    NOTE (measured, not assumed): with the shapes ``init_gba`` registers,
    the reference's own ``prepare_params`` raises a broadcast error for
    dq_mode=1 — v1 checkpoints must carry ``qstatistic``/zeros-affine buffers
    per channel ``(G, N, 1)`` with the scale affine ``(1, N, 1)``
    (``nbit/layer.py:445-448``).  This test pins parity on exactly the shape
    assignment under which the reference code executes.
    """
    rng = _rng(13)
    lay = REF.MPQLinearCuda(
        in_channels=K, out_channels=N, w_bit=2, group_size=64, dtype=torch.float32,
        dq_group_size=64, dq_mode=1, asym=False, requires_grad=False,
    )
    g = K // 64
    lay.qstatistic = torch.from_numpy(rng.integers(0, 256, size=(g, N, 1), dtype=np.uint8))
    lay.qzeros_zeros = torch.from_numpy((rng.standard_normal((g, N, 1)) * 0.5).astype(np.float32))
    lay.qzeros_scales = torch.from_numpy((rng.standard_normal((g, N, 1)) * 0.5 + 1).astype(np.float32))
    # qscales_zeros/scales keep their registered (1, N, 1) dq_mode=1 shape
    _fill(lay.qscales_zeros, rng)
    _fill(lay.qscales_scales, rng)
    qstat = lay.qstatistic.numpy().copy()
    qzz, qzs = lay.qzeros_zeros.numpy().copy(), lay.qzeros_scales.numpy().copy()
    qsz, qss = lay.qscales_zeros.numpy().copy(), lay.qscales_scales.numpy().copy()
    lay.prepare_params()

    scales, zeros = decompress_gba_sym(
        jnp.asarray(qstat), jnp.asarray(qzz), jnp.asarray(qzs),
        jnp.asarray(qsz), jnp.asarray(qss), out_channels=N, dq_mode=1,
    )
    np.testing.assert_array_equal(np.asarray(scales), lay.scales.numpy())
    np.testing.assert_array_equal(np.asarray(zeros), lay.zeros.numpy())


@pytest.mark.parametrize("w_bit,dq_mode", [(4, 2), (2, 1)])
def test_gba_prepare_params_asym(w_bit, dq_mode):
    """asym GBA: scales decompressed, zeros stay packed int32 (mpq_layer.py:176-177)."""
    rng = _rng(17 + w_bit + dq_mode)
    lay = REF.MPQLinearCuda(
        in_channels=K, out_channels=N, w_bit=w_bit, group_size=64, dtype=torch.float32,
        dq_group_size=32 if dq_mode == 2 else 64, dq_mode=dq_mode, asym=True,
        requires_grad=False,
    )
    _fill(lay.qscales, rng)
    _fill(lay.qscales_zeros, rng)
    _fill(lay.qscales_scales, rng)
    qsc = lay.qscales.numpy().copy()
    qsz, qss = lay.qscales_zeros.numpy().copy(), lay.qscales_scales.numpy().copy()
    lay.prepare_params()

    scales = decompress_gba_asym(
        jnp.asarray(qsc), jnp.asarray(qsz), jnp.asarray(qss),
        out_channels=N, w_bit=w_bit, dq_mode=dq_mode,
    )
    np.testing.assert_array_equal(np.asarray(scales), lay.scales.numpy())
    # zeros stay as the packed int32 qzeros buffer
    np.testing.assert_array_equal(lay.zeros.numpy(), lay.qzeros.numpy())


def test_ingest_gba_end_to_end():
    """mpq_from_gba → dequantize_mpq ≡ reference prepare_params → unpack_qweight."""
    rng = _rng(23)
    w_bit, group_size = 4, 64
    lay = REF.MPQLinearCuda(
        in_channels=K, out_channels=N, w_bit=w_bit, group_size=group_size,
        dtype=torch.float32, dq_group_size=32, dq_mode=2, asym=False, requires_grad=False,
    )
    for name in ("qstatistic", "qzeros_zeros", "qzeros_scales", "qscales_zeros", "qscales_scales"):
        _fill(getattr(lay, name), rng)
    tensors = {
        name: getattr(lay, name).numpy().copy()
        for name in ("qstatistic", "qzeros_zeros", "qzeros_scales", "qscales_zeros", "qscales_scales")
    }
    packed = _rand_packed(rng, K, N, w_bit)
    lay.set_qweight_data(torch.from_numpy(packed))
    lay.prepare_params()
    ref = REF.unpack_qweight(
        _ref_qweight(
            packed, w_bit, False, lay.scales.numpy(), lay.zeros.numpy(),
            lay.g_idx.numpy(), group_size=group_size,
        )
    ).numpy()

    qt = mpq_from_gba(packed, tensors, w_bit=w_bit, group_size=group_size, dq_mode=2)
    ours = _dequant_unfused(qt)
    np.testing.assert_array_equal(ours, ref)


# ---------------------------------------------------------------------------
# exl2 group map
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "groups",
    [
        [(8, 0), (4, 16), (2, 48)],          # mixed widths
        [(6, 0), (5, 24), (3, 64)],          # odd exl2 widths
        [(4, 0)],                            # single group
        [(2, 0), (2, 8), (8, 16), (4, 80)],  # repeated widths
    ],
)
def test_make_group_map_parity(groups):
    num_qrows = 128
    q_groups = np.asarray([x for pair in groups for x in pair], np.int16)
    ref = REF.make_group_map(torch.from_numpy(q_groups), num_qrows).numpy()
    ours = exl2_group_map(q_groups, num_qrows)
    np.testing.assert_array_equal(ours, ref)


# ---------------------------------------------------------------------------
# scalar quantizers
# ---------------------------------------------------------------------------


def test_nv_tensor_quant_parity():
    rng = _rng(31)
    x = rng.standard_normal((64, 64)).astype(np.float32)
    for num_bits in (4, 8):
        ref_q, ref_s = REF.nv_tensor_quant(torch.from_numpy(x), num_bits=num_bits)
        q, s = nv_tensor_quant(jnp.asarray(x), num_bits=num_bits)
        np.testing.assert_array_equal(np.asarray(q), ref_q.numpy())
        np.testing.assert_allclose(float(s), float(ref_s), rtol=0)
    # near-zero amax branch (reference :78-85)
    tiny = np.full((8, 8), 1e-9, np.float32)
    ref_q, ref_s = REF.nv_tensor_quant(torch.from_numpy(tiny))
    q, s = nv_tensor_quant(jnp.asarray(tiny))
    np.testing.assert_array_equal(np.asarray(q), ref_q.numpy())  # clamped ±max_bound
    assert float(s) == float(ref_s) == 1.0


def test_q4_q8_quantization_parity():
    rng = _rng(37)
    x = (rng.standard_normal((32, 128)) * 2).astype(np.float32)
    # NOTE: the reference's eps-default line is buggy (`.device(input.device)`
    # calls a torch.device); every executable reference path passes eps.
    eps = torch.tensor(1e-5)
    ref_q4, ref_s4 = REF.q4_quantization(torch.from_numpy(x), eps=eps)
    q4, s4 = q4_quantization(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(q4), ref_q4.numpy())
    np.testing.assert_allclose(float(s4), float(ref_s4), rtol=1e-6)

    ref_q8, ref_s8 = REF.q8_quantization(torch.from_numpy(x), eps=eps)
    q8, s8 = q8_quantization(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(q8), ref_q8.numpy())
    np.testing.assert_allclose(float(s8), float(ref_s8), rtol=1e-6)
