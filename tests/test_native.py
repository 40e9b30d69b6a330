"""Native C++ bitpack library: differential tests vs the JAX implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from bitorch_engine_tpu import native
from bitorch_engine_tpu.ops import packing

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native bitpack lib unavailable"
)


@pytest.mark.parametrize("w_bit", [2, 4, 8])
def test_repack_matches_jax(w_bit):
    rng = np.random.default_rng(0)
    k, n, gs = 256, 64, 64
    codes = rng.integers(0, 2**w_bit, (k, n), dtype=np.int64).astype(np.int32)
    gptq = np.asarray(packing.pack_rows(jnp.asarray(codes), w_bit))
    expected = np.asarray(
        packing.pack_rows_tpu_tiled(jnp.asarray(codes), w_bit, gs)
    )
    got = native.repack_gptq_to_tpu_tiled(gptq, w_bit, gs)
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("w_bit", [2, 4, 8])
def test_unpack_pack_roundtrip(w_bit):
    rng = np.random.default_rng(1)
    k, n = 128, 32
    codes = rng.integers(0, 2**w_bit, (k, n), dtype=np.int64).astype(np.uint8)
    packed = native.pack_gptq_codes(codes, w_bit)
    np.testing.assert_array_equal(
        packed, np.asarray(packing.pack_rows(jnp.asarray(codes, jnp.int32), w_bit))
    )
    unpacked = native.unpack_gptq_codes(packed, w_bit)
    np.testing.assert_array_equal(unpacked, codes)


def test_pack_signs_matches_jax():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 128)).astype(np.float32)
    got = native.pack_signs(x)
    expected = np.asarray(packing.pack_signs(jnp.asarray(x)))
    np.testing.assert_array_equal(got, expected)
