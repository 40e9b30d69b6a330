"""Differential tests for quantization math vs the reference's torch code.

The reference's quantizers (quant_operators.py) are re-run here through torch
(CPU build is available in the image) to check bit-exact / tolerance parity of
our JAX implementations — the same differential-testing pattern the reference
uses against bitorch (SURVEY.md §4.1).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from bitorch_engine_tpu.ops import packing, quant
from bitorch_engine_tpu.qtensor import MPQTensor


def _torch_nv_tensor_quant(inputs, num_bits=8, narrow_range=True):
    """Reference re-implementation of nv_tensor_quant (quant_operators.py:7-90)."""
    amax = torch.amax(inputs, keepdim=True)
    max_bound = torch.tensor((2.0 ** (num_bits - 1)) - 1.0)
    min_bound = -max_bound if narrow_range else -max_bound - 1
    scale = max_bound / amax
    outputs = torch.clamp((inputs * scale).round_(), min_bound, max_bound)
    return outputs, scale


@pytest.mark.parametrize("num_bits", [2, 4, 8])
def test_nv_tensor_quant_matches_reference(num_bits):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 32)).astype(np.float32)
    q_ref, s_ref = _torch_nv_tensor_quant(torch.from_numpy(x.copy()), num_bits)
    q, s = quant.nv_tensor_quant(jnp.asarray(x), num_bits=num_bits)
    np.testing.assert_array_equal(np.asarray(q), q_ref.numpy())
    np.testing.assert_allclose(np.asarray(s), s_ref.numpy().reshape(()), rtol=1e-6)


def test_q4_q8_quantization_ranges():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32))
    q4, s4 = quant.q4_quantization(x)
    assert float(jnp.min(q4)) >= -8 and float(jnp.max(q4)) <= 7
    q8, s8 = quant.q8_quantization(x)
    assert float(jnp.min(q8)) >= -128 and float(jnp.max(q8)) <= 127
    # explicit-scale path returns only the quantized tensor
    q4b = quant.q4_quantization(x, scale_a=s4)
    np.testing.assert_array_equal(np.asarray(q4), np.asarray(q4b))


def test_init_binary_weight_sign_preserved():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((32, 64)).astype(np.float32)
    qt = quant.init_binary_weight(jnp.asarray(w))
    assert qt.data.dtype == jnp.int8
    assert not np.any(np.asarray(qt.data) == 0)  # zeros replaced by signs
    np.testing.assert_allclose(
        float(qt.scale_w), np.abs(w).sum() / w.size, rtol=1e-6
    )
    # signs follow the centered weight
    centered = w - w.mean()
    np.testing.assert_array_equal(
        np.sign(np.asarray(qt.data, np.float32)), np.sign(centered)
    )


def _torch_gptq_unpack(qweight, scales, qzeros, g_idx, w_bit):
    """Reference asym unpack (nbit/cuda/utils.py:30-43) re-run in torch."""
    wf = torch.tensor(list(range(0, 32, w_bit)), dtype=torch.int32).unsqueeze(0)
    weight = torch.bitwise_right_shift(
        torch.unsqueeze(qweight, 1).expand(-1, 32 // w_bit, -1), wf.unsqueeze(-1)
    ).to(torch.int16 if w_bit == 8 else torch.int8)
    weight = weight.view(-1, qweight.size(-1))
    weight = torch.bitwise_and(weight, (2**w_bit) - 1)
    zeros_unpack = torch.bitwise_right_shift(
        torch.unsqueeze(qzeros, 2).expand(-1, -1, 32 // w_bit), wf.unsqueeze(0)
    ).to(torch.int16 if w_bit == 8 else torch.int8)
    zeros_unpack = torch.bitwise_and(zeros_unpack, (2**w_bit) - 1) + 1
    zeros = zeros_unpack.reshape(-1, qweight.size(-1))
    return scales[g_idx.long()] * (weight - zeros[g_idx.long()])


@pytest.mark.parametrize("w_bit", [2, 4, 8])
def test_dequantize_mpq_asym_matches_torch_reference(w_bit):
    """Bit-exact parity of the asym (classical GPTQ) dequant vs the torch math."""
    rng = np.random.default_rng(3)
    k, n, gs = 128, 64, 32
    g = k // gs
    qweight = rng.integers(-(2**31), 2**31, size=(k // 32 * w_bit, n), dtype=np.int64).astype(np.int32)
    scales = rng.uniform(0.01, 0.1, size=(g, n)).astype(np.float32)
    qzeros = rng.integers(-(2**31), 2**31, size=(g, n // 32 * w_bit), dtype=np.int64).astype(np.int32)
    g_idx = (np.arange(k) // gs).astype(np.int32)

    ref = _torch_gptq_unpack(
        torch.from_numpy(qweight),
        torch.from_numpy(scales),
        torch.from_numpy(qzeros),
        torch.from_numpy(g_idx),
        w_bit,
    ).numpy()

    qt = MPQTensor(
        packed=jnp.asarray(qweight),
        scales=jnp.asarray(scales),
        zeros=jnp.asarray(qzeros),
        g_idx=jnp.asarray(g_idx),
        w_bit=w_bit,
        group_size=gs,
        asym=True,
    )
    out = np.asarray(quant.dequantize_mpq(qt, dtype=jnp.float32))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("w_bit", [2, 4, 8])
@pytest.mark.parametrize("asym", [False, True])
def test_quantize_dequantize_mpq_roundtrip(w_bit, asym):
    """RTN quantize → dequantize reconstructs within one quantization step."""
    rng = np.random.default_rng(4)
    k, n, gs = 256, 64, 64
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
    qt = quant.quantize_mpq(jnp.asarray(w), w_bit=w_bit, group_size=gs, asym=asym)
    w_hat = np.asarray(quant.dequantize_mpq(qt, dtype=jnp.float32))
    # max error bounded by the per-group scale
    scales = np.asarray(qt.scales)
    step = np.repeat(scales, gs, axis=0)
    assert np.all(np.abs(w_hat - w) <= step * 0.5 + 1e-6)


@pytest.mark.parametrize("w_bit", [2, 4])
@pytest.mark.parametrize("asym", [False, True])
def test_repack_mpq_roundtrip(w_bit, asym):
    """pack_fp_weight(unpack_qweight(q)) == q (reference test_nbit_linear.py:382-395)."""
    rng = np.random.default_rng(5)
    k, n, gs = 128, 64, 32
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    qt = quant.quantize_mpq(jnp.asarray(w), w_bit=w_bit, group_size=gs, asym=asym)
    w_hat = quant.dequantize_mpq(qt, dtype=jnp.float32)
    repacked = quant.repack_mpq(w_hat, qt)
    np.testing.assert_array_equal(np.asarray(repacked), np.asarray(qt.packed))


def test_dequantize_mpq_sym_q_perm_scatter():
    """sym/no-g_idx path applies the q_perm scatter (quant_operators.py:337-341):
    stored row i lands at logical row q_perm[i]."""
    rng = np.random.default_rng(6)
    k, n, gs = 64, 32, 32
    w = rng.standard_normal((k, n)).astype(np.float32)
    qt = quant.quantize_mpq(jnp.asarray(w), w_bit=4, group_size=gs, asym=False)
    w_stored = np.asarray(quant.dequantize_mpq(qt, dtype=jnp.float32))
    perm = rng.permutation(k).astype(np.int32)
    qt_perm = qt.replace(q_perm=jnp.asarray(perm))
    w_scattered = np.asarray(quant.dequantize_mpq(qt_perm, dtype=jnp.float32))
    np.testing.assert_allclose(w_scattered[perm], w_stored, atol=1e-6)


def test_decompress_gba_sym_nibble_split():
    """High nibble = qscales, low nibble = qzeros (mpq_layer.py:179-183)."""
    g, n, dqg = 2, 8, 4
    qstat = np.full((g, n // dqg, dqg), (0xA << 4) | 0x3, dtype=np.uint8)
    scales, zeros = quant.decompress_gba_sym(
        jnp.asarray(qstat),
        qzeros_zeros=jnp.full((g, n // dqg, 1), 1.0),
        qzeros_scales=jnp.full((g, n // dqg, 1), 0.5),
        qscales_zeros=jnp.full((g, n // dqg, 1), 2.0),
        qscales_scales=jnp.full((g, n // dqg, 1), 0.25),
        out_channels=n,
    )
    np.testing.assert_allclose(np.asarray(scales), (0xA - 2.0) * 0.25)
    np.testing.assert_allclose(np.asarray(zeros), (0x3 - 1.0) * 0.5)
    assert scales.shape == (g, n) and zeros.shape == (g, n)


def test_quantize_params_path_pattern():
    """utils.convert.quantize_params converts only matching 2-D kernels."""
    from bitorch_engine_tpu.qtensor import MPQTensor
    from bitorch_engine_tpu.utils import quantize_params

    params = {
        "dense1": {"kernel": jnp.ones((256, 64)), "bias": jnp.zeros((64,))},
        "norm": {"weight": jnp.ones((256,))},
    }
    out = quantize_params(params, strategy="4-128-256")
    assert isinstance(out["dense1"]["kernel"], MPQTensor)
    assert out["dense1"]["kernel"].w_bit == 4
    assert not isinstance(out["norm"]["weight"], MPQTensor)
    assert out["dense1"]["bias"].shape == (64,)
