"""Pallas XNOR-popcount binary GEMM (packed ±1 inference path).

TPU-native replacement for the reference's binary GEMM kernels
(``binary_linear_cuda_kernel.cu`` BSTC32/BTC32 and the CUTLASS
``uint1b_t`` path): both operands are sign-bit-packed uint32 words; the
contraction is ``out[m,n] = K - 2·Σ_w popc(x[m,w] ⊕ wgt[n,w])``
(domain conversion at ``:176``/``:334`` of the reference kernel).

TPU has no 1-bit MXU mode, so the packed path runs on the VPU
(`lax.population_count`) — but it reads 32× fewer weight bytes than the
MXU sign-matmul, which wins whenever the GEMV is HBM-bound (binary-net
inference).  Training keeps the MXU path (±1 in bf16 is exact).

Tiles: x (bm, Kw) ⊕ w (bn, Kw) broadcast to (bm, bn, Kw) in VMEM, popcount,
reduce over Kw.  K up to ~16k fits one block (Kw ≤ 512 ⇒ ≤ 2 MB tile at
bm=8, bn=128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

Array = jax.Array


def _kernel(x_ref, w_ref, out_ref, *, k_logical: int):
    x = x_ref[:]  # (bm, kw) uint32
    w = w_ref[:]  # (bn, kw) uint32
    xor = lax.bitwise_xor(x[:, None, :], w[None, :, :])  # (bm, bn, kw)
    pop = jnp.sum(lax.population_count(xor).astype(jnp.int32), axis=-1)
    out_ref[:] = (k_logical - 2 * pop).astype(out_ref.dtype)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("k_logical", "interpret"))
def xnor_gemm_pallas(
    x_packed: Array,
    w_packed: Array,
    k_logical: int,
    interpret: bool = False,
) -> Array:
    """±1-domain GEMM over packed signs: (M, Kw) × (N, Kw) → fp32 (M, N).

    Padding bits (beyond ``k_logical``) must be equal in both operands (the
    packers pad with -1); their popc contribution is corrected by using the
    padded K then subtracting the pad count, handled by the caller via
    ``k_logical``... here we use total bits and let the caller subtract.
    """
    m, kw = x_packed.shape
    n = w_packed.shape[0]
    bm = max(8, min(128, _round_up(m, 8)))
    bn = 128 if n % 128 == 0 else (n if n <= 128 else None)
    if bn is None:
        raise NotImplementedError(f"N={n} not tileable")
    m_pad = _round_up(m, bm)
    n_pad = _round_up(n, bn)
    if m_pad != m:
        x_packed = jnp.pad(x_packed, ((0, m_pad - m), (0, 0)))
    if n_pad != n:
        w_packed = jnp.pad(w_packed, ((0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, k_logical=kw * 32),
        grid=(m_pad // bm, n_pad // bn),
        in_specs=[
            pl.BlockSpec((bm, kw), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, kw), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(x_packed, w_packed)
    out = out[:m, :n]
    # padding bits are equal in both operands → contribute +1 each
    pad_bits = kw * 32 - k_logical
    if pad_bits:
        out = out - pad_bits
    return out
