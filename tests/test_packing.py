"""Round-trip and differential tests for bit-packing primitives.

Mirrors the reference test philosophy (SURVEY.md §4): round-trip invariants
(``pack(unpack(q)) == q``, reference ``test_nbit_linear.py:382-395``) and
differential checks against an independent pure-Python/NumPy packing
implementation (reference ``test_binary_linear.py:292-310``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bitorch_engine_tpu.ops import packing


@pytest.mark.parametrize("w_bit", [1, 2, 4, 8])
@pytest.mark.parametrize("k,n", [(64, 16), (256, 128)])
def test_pack_unpack_rows_roundtrip(w_bit, k, n):
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2**w_bit, size=(k, n), dtype=np.int32)
    packed = packing.pack_rows(jnp.asarray(vals), w_bit)
    assert packed.shape == (k // 32 * w_bit, n)
    assert packed.dtype == jnp.int32
    unpacked = packing.unpack_rows(packed, w_bit)
    np.testing.assert_array_equal(np.asarray(unpacked), vals)


@pytest.mark.parametrize("w_bit", [2, 4, 8])
def test_pack_rows_bit_layout_matches_gptq(w_bit):
    """Differential vs an independent NumPy implementation of GPTQ packing."""
    rng = np.random.default_rng(1)
    k, n = 64, 8
    vals = rng.integers(0, 2**w_bit, size=(k, n), dtype=np.int64)
    ppw = 32 // w_bit
    ref = np.zeros((k // ppw, n), dtype=np.int64)
    for kk in range(k):
        ref[kk // ppw] |= vals[kk] << ((kk % ppw) * w_bit)
    ref = ref.astype(np.uint32).astype(np.int64)
    packed = np.asarray(packing.pack_rows(jnp.asarray(vals, jnp.int32), w_bit))
    np.testing.assert_array_equal(packed.astype(np.uint32).astype(np.int64), ref)


@pytest.mark.parametrize("w_bit", [2, 4, 8])
def test_pack_unpack_cols_roundtrip(w_bit):
    rng = np.random.default_rng(2)
    g, n = 4, 64
    zeros = rng.integers(1, 2**w_bit + 1, size=(g, n), dtype=np.int32)
    packed = packing.pack_cols(jnp.asarray(zeros), w_bit)
    assert packed.shape == (g, n // 32 * w_bit)
    unpacked = packing.unpack_cols(packed, w_bit)
    np.testing.assert_array_equal(np.asarray(unpacked), zeros)


def test_pack_cols_matches_torch_reference_semantics():
    """zeros are stored as (zero - 1) & mask, unpack re-adds 1 — the GPTQ
    convention from quant_operators.py:348-368."""
    w_bit = 4
    zeros = np.full((1, 32), 8, dtype=np.int32)
    packed = np.asarray(packing.pack_cols(jnp.asarray(zeros), w_bit))
    # every nibble should hold 7 → word = 0x77777777
    assert np.all(packed.astype(np.uint32) == 0x77777777)


def test_pack_unpack_signs_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 128)).astype(np.float32)
    packed = packing.pack_signs(jnp.asarray(x))
    assert packed.shape == (5, 4)
    assert packed.dtype == jnp.uint32
    signs = np.asarray(packing.unpack_signs(packed))
    expected = np.where(x >= 0, 1.0, -1.0)
    np.testing.assert_array_equal(signs, expected)


def test_pack_signs_bit_order():
    """LSB-first bit order, matching reference get_binary_row
    (quant_operators.py:143-151)."""
    x = -np.ones((1, 32), dtype=np.float32)
    x[0, 0] = 1.0  # only element 0 non-negative → word == 1
    packed = np.asarray(packing.pack_signs(jnp.asarray(x)))
    assert packed[0, 0] == 1


def test_pad_to_multiple():
    x = jnp.ones((3, 100))
    padded, pad = packing.pad_to_multiple(x, 1, 128)
    assert padded.shape == (3, 128) and pad == 28
    same, pad0 = packing.pad_to_multiple(padded, 1, 128)
    assert same.shape == (3, 128) and pad0 == 0


@pytest.mark.parametrize("w_bit", [1, 2, 4])
def test_pack_rows_tpu_pair_roundtrip(w_bit):
    rng = np.random.default_rng(17)
    k, n, gs = 256, 96, 64
    q = rng.integers(0, 2**w_bit, size=(k, n)).astype(np.int32)
    packed = packing.pack_rows_tpu_pair(jnp.asarray(q), w_bit, gs)
    assert packed.shape == (k * w_bit // 32, n)
    back = np.asarray(packing.unpack_rows_tpu_pair(packed, w_bit, gs))
    np.testing.assert_array_equal(back, q)


def test_pack_rows_tpu_pair_halves_layout():
    """Word bit layout: code of logical row (tile j, word r, half h) lives at
    bits [16h + w_bit*j, ...) — the order pltpu.bitcast(u32→bf16) unpacks
    (row 2r = low half, 2r+1 = high half)."""
    w_bit, gs = 4, 64  # ppw=8, bkp=8: tile j covers rows [16j, 16j+16)
    q = np.zeros((64, 1), dtype=np.int32)
    q[0, 0] = 0xA  # tile 0, word 0, half 0 → bits [0:4)
    q[1, 0] = 0xB  # tile 0, word 0, half 1 → bits [16:20)
    q[16, 0] = 0xC  # tile 1, word 0, half 0 → bits [4:8)
    packed = np.asarray(packing.pack_rows_tpu_pair(jnp.asarray(q), w_bit, gs))
    w0 = packed[0, 0].astype(np.uint32)
    assert w0 & 0xF == 0xA
    assert (w0 >> 16) & 0xF == 0xB
    assert (w0 >> 4) & 0xF == 0xC


def test_pack_rows_layout_dispatch():
    rng = np.random.default_rng(5)
    q = rng.integers(0, 16, size=(128, 32)).astype(np.int32)
    for layout in ("gptq", "tpu_tiled", "tpu_pair", "tpu_quad"):
        p = packing.pack_rows_layout(jnp.asarray(q), 4, 64, layout)
        back = np.asarray(packing.unpack_rows_layout(p, 4, 64, layout))
        np.testing.assert_array_equal(back, q)


@pytest.mark.parametrize("w_bit", [1, 2, 4])
def test_pack_rows_tpu_quad_roundtrip(w_bit):
    rng = np.random.default_rng(23)
    k, n, gs = 512, 96, 32  # group count 16: divisible by every superblock
    q = rng.integers(0, 2**w_bit, size=(k, n)).astype(np.int32)
    packed = packing.pack_rows_tpu_quad(jnp.asarray(q), w_bit, gs)
    assert packed.shape == (k * w_bit // 32, n)
    back = np.asarray(packing.unpack_rows_tpu_quad(packed, w_bit, gs))
    np.testing.assert_array_equal(back, q)


def test_pack_rows_tpu_quad_rejects_partial_superblock():
    q = jnp.zeros((64, 32), jnp.int32)  # 2 groups of 32 < superblock of 4
    with pytest.raises(ValueError):
        packing.pack_rows_tpu_quad(q, 2, 32)


def test_pack_rows_tpu_quad_byte_layout():
    """Word bit layout: code of logical row (tile j, word r, byte h) within a
    superblock lives at bits [8h + w_bit*j, ...) of word r — the order
    pltpu.bitcast(u32→i8) unpacks (word row i → int8 rows 4i + h,
    little-endian)."""
    w_bit, gs = 2, 32  # S=4 groups/superblock, bkp=2 → R=8 words, 128 rows
    q = np.zeros((128, 1), dtype=np.int32)
    q[0, 0] = 0x1  # tile 0, word 0, byte 0 → word 0 bits [0:2)
    q[1, 0] = 0x2  # tile 0, word 0, byte 1 → word 0 bits [8:10)
    q[3, 0] = 0x3  # tile 0, word 0, byte 3 → word 0 bits [24:26)
    q[4, 0] = 0x1  # tile 0, word 1, byte 0 → word 1 bits [0:2)
    q[32, 0] = 0x2  # tile 1 (rows 32+), word 0, byte 0 → word 0 bits [2:4)
    packed = np.asarray(packing.pack_rows_tpu_quad(jnp.asarray(q), w_bit, gs))
    w0 = packed[0, 0].astype(np.uint32)
    w1 = packed[1, 0].astype(np.uint32)
    assert w0 & 0x3 == 0x1
    assert (w0 >> 8) & 0x3 == 0x2
    assert (w0 >> 24) & 0x3 == 0x3
    assert (w0 >> 2) & 0x3 == 0x2
    assert w1 & 0x3 == 0x1
