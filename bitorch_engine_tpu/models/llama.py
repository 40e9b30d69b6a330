"""Llama model family with weight-only quantized (MPQ/MBWQ) projections.

This is the engine's flagship integration (BASELINE.json configs[2]/[3]):
the reference provides the quantized linear layers consumed by the external
green-bit-llm projects (reference README.md:18-19); here the model itself is
part of the framework, TPU-native:

* all seven projections per block are :class:`~bitorch_engine_tpu.layers.linear.MPQLinear`
  (or fp Dense for baseline comparison),
* RoPE / RMSNorm / SwiGLU in bf16, fp32 softmax,
* KV-cache decode step designed for ``jit``: static shapes, position index
  carried in the cache, causal masking via ``broadcasted_iota``,
* tensor-parallel sharding: qkv/gate/up column-sharded (heads split over
  'tp'), o/down row-sharded — the activation pattern keeps collectives to one
  ``psum`` per block, riding ICI (see ``parallel/sharding.py``).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from flax import linen as nn
from flax import struct

from ..layers.linear import MPQLinear

Array = jax.Array


@struct.dataclass
class LlamaConfig:
    vocab_size: int = struct.field(pytree_node=False, default=128256)
    hidden_size: int = struct.field(pytree_node=False, default=4096)
    intermediate_size: int = struct.field(pytree_node=False, default=14336)
    num_layers: int = struct.field(pytree_node=False, default=32)
    num_heads: int = struct.field(pytree_node=False, default=32)
    num_kv_heads: int = struct.field(pytree_node=False, default=8)
    max_seq_len: int = struct.field(pytree_node=False, default=4096)
    rope_theta: float = struct.field(pytree_node=False, default=500000.0)
    rms_eps: float = struct.field(pytree_node=False, default=1e-5)
    # quantization
    w_bit: int = struct.field(pytree_node=False, default=4)
    group_size: int = struct.field(pytree_node=False, default=128)
    asym: bool = struct.field(pytree_node=False, default=False)
    quantized: bool = struct.field(pytree_node=False, default=True)
    # GreenBit channel-mixed-bit mode: a strategy tuple like
    # ((2, 0.75), (4, 0.25)) → MBWQLinear projections (configs[3] path)
    mbwq_strategy: Any = struct.field(pytree_node=False, default=None)
    # per-bit storage-container override for MBWQ segments, e.g. {2: 4}
    # stores the 2-bit codes in 4-bit containers (identical quantization
    # values; see ops/mbwq_linear.py::quantize_mbwq for the v5e trade)
    mbwq_container_bits: Any = struct.field(pytree_node=False, default=None)
    # exl2-style symmetric-midpoint quantization for all projections
    # (zeros ≡ mid·scales): the A8 quad kernel then runs signed codes and
    # the zeros correction disappears (~185 µs/step of XLA reduces on the
    # uniform-w2 8B step, round-5 trace).  Quality-gated: ppl proxy
    # rel_delta_w2g128_midsym vs the affine form.
    quant_mid_sym: bool = struct.field(pytree_node=False, default=False)
    # Pallas flash attention for prefill (TPU only; decode keeps the
    # KV-cache einsum path). Greenfield vs the reference's O(L²) BMHA
    # softmax (SURVEY.md §5 long-context row).
    use_flash_attention: bool = struct.field(pytree_node=False, default=True)
    # Rematerialize each decoder block on the backward pass (training only;
    # ignored when kv_caches are passed).  Activation memory per block drops
    # from O(seq·hidden + seq²·heads) to the block boundary tensors — the
    # standard TPU memory-for-FLOPs trade for long-sequence fine-tuning
    # (recompute costs ~1/3 extra forward FLOPs).
    remat: bool = struct.field(pytree_node=False, default=False)
    # Sequence parallelism for cache-less (training / full-prefill) attention:
    # 'ring' (ppermute KV rotation, parallel/ring_attention.py) or 'ulysses'
    # (all-to-all head redistribution, parallel/ulysses.py), with the
    # sequence axis sharded over mesh axis ``sp_axis`` of ``sp_mesh``.
    # Greenfield vs the reference (SURVEY §5: no long-context support).
    sequence_parallel: Optional[str] = struct.field(pytree_node=False, default=None)
    sp_mesh: Any = struct.field(pytree_node=False, default=None)
    sp_axis: str = struct.field(pytree_node=False, default="sp")
    # Mixture-of-experts MLP (Mixtral-style): > 0 replaces every block's
    # dense SwiGLU with moe_num_experts quantized experts + top-k routing
    # (ops/moe.py).  The load-balance aux loss is sowed to the 'losses'
    # collection: apply with ``mutable=['losses']`` during training and add
    # it to the objective.  Greenfield — the reference is dense-only.
    moe_num_experts: int = struct.field(pytree_node=False, default=0)
    moe_top_k: int = struct.field(pytree_node=False, default=2)
    # None = drop-free capacity (C = T; the serving/inference setting where
    # routed outputs equal the dense Mixtral forward); a float = Switch-style
    # static capacity with overflow drops (the training trade).
    moe_capacity_factor: Optional[float] = struct.field(pytree_node=False, default=None)
    # True = Mixtral semantics (top-k gates renormalized to sum to 1);
    # False = raw full-softmax gate weights (Switch/GShard style).
    moe_renormalize: bool = struct.field(pytree_node=False, default=True)
    # 'bf16' or 'int8': int8 halves the per-step cache stream and doubles
    # capacity; per-position scales factor out of both attention
    # contractions so the int8 payload feeds the MXU directly (greenfield —
    # the reference has no KV cache at all).
    kv_cache_dtype: str = struct.field(pytree_node=False, default="bf16")
    # int8 embed/lm_head: the tied table is read whole every decode step for
    # the logits matmul; per-row scales factor out of the hidden contraction
    # (logits[v] = s_v * (x @ E8_v)), halving that stream.
    quantize_embed: bool = struct.field(pytree_node=False, default=False)
    # Untied group-quantized lm_head (exl2-style head quantization): when set
    # (e.g. 4), the logits matmul runs through the fused MPQ kernel instead
    # of the tied int8/bf16 embedding table, reading w_bit/8 of the int8
    # bytes.  Embedding lookup stays on the (int8 or bf16) table.
    head_w_bit: Optional[int] = struct.field(pytree_node=False, default=None)
    # Pad the untied quantized lm_head's output features up to a multiple of
    # this (0 = off): vocab sizes like 128256 only admit 256-wide kernel
    # N-blocks; padding to 131072 unlocks 1024+ blocks for ~1% extra bytes.
    # Logits are sliced back to vocab_size.
    head_pad_to: int = struct.field(pytree_node=False, default=0)
    # Pad quantized projection out-features up to a multiple of this
    # (0 = off), slicing outputs back to the logical width — the
    # projection-level analogue of head_pad_to.  N with few 2-power factors
    # (llama2 gate|up: 11008 / fused 22016 = 512·43) only admits 256/512-
    # wide kernel N-blocks, which stream at ~240 GB/s vs ~420 for 2048-wide
    # (v5e round-4 probe); +2.3% pad bytes buys the wide blocks.
    proj_pad_to: int = struct.field(pytree_node=False, default=0)
    # Fused projections: one packed tensor (and one kernel launch) for
    # q|k|v and for gate|up.  Small-N matmuls waste bandwidth (k/v at
    # N=1024 stream ~336 GB/s vs ~615 at N≥4096 on v5e), so fusing is the
    # natural TPU layout; group metadata concatenates along N
    # (ops/quant.py::concat_mpq).  Off by default: tensor-parallel sharding
    # splits heads per projection, so the sharded paths keep them separate.
    fuse_qkv: bool = struct.field(pytree_node=False, default=False)
    fuse_gate_up: bool = struct.field(pytree_node=False, default=False)
    # Qwen2-style attention: q/k/v projections carry a bias (o does not).
    attn_qkv_bias: bool = struct.field(pytree_node=False, default=False)
    dtype: Any = struct.field(pytree_node=False, default=jnp.bfloat16)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def llama3_8b(**overrides) -> LlamaConfig:
    return LlamaConfig(**overrides)


def llama2_7b(**overrides) -> LlamaConfig:
    defaults = dict(
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=11008,
        num_layers=32,
        num_heads=32,
        num_kv_heads=32,
        rope_theta=10000.0,
        rms_eps=1e-5,
    )
    defaults.update(overrides)
    return LlamaConfig(**defaults)


def mistral_7b(**overrides) -> LlamaConfig:
    """Mistral-7B-v0.x: llama architecture with 8-head GQA, 14336 MLP.

    (The original v0.1 sliding-window attention is superseded by full
    attention in v0.2+, which is what this config models.)
    """
    defaults = dict(
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=14336,
        num_layers=32,
        num_heads=32,
        num_kv_heads=8,
        rope_theta=1000000.0,
        rms_eps=1e-5,
    )
    defaults.update(overrides)
    return LlamaConfig(**defaults)


def qwen2_7b(**overrides) -> LlamaConfig:
    """Qwen2/Qwen2.5-7B: llama-style blocks with q/k/v projection biases
    (``attn_qkv_bias``), 4-head GQA and a 152k vocabulary."""
    defaults = dict(
        vocab_size=152064,
        hidden_size=3584,
        intermediate_size=18944,
        num_layers=28,
        num_heads=28,
        num_kv_heads=4,
        rope_theta=1000000.0,
        rms_eps=1e-6,
        attn_qkv_bias=True,
    )
    defaults.update(overrides)
    return LlamaConfig(**defaults)


def mixtral_8x7b(**overrides) -> LlamaConfig:
    """Mixtral-8x7B: llama architecture + 8-expert top-2 MoE MLPs."""
    defaults = dict(
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=14336,
        num_layers=32,
        num_heads=32,
        num_kv_heads=8,
        rope_theta=1e6,
        moe_num_experts=8,
        moe_top_k=2,
    )
    defaults.update(overrides)
    return LlamaConfig(**defaults)


def tiny_llama(**overrides) -> LlamaConfig:
    """Small config for tests / CPU dry runs."""
    defaults = dict(
        vocab_size=256,
        hidden_size=256,
        intermediate_size=512,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        max_seq_len=128,
        group_size=64,
    )
    defaults.update(overrides)
    return LlamaConfig(**defaults)


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param("weight", lambda key: jnp.ones((x.shape[-1],), jnp.float32))
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        return (x32 * jax.lax.rsqrt(var + self.eps) * w).astype(self.dtype)


def _paged_kernel_mode() -> str:
    """'auto' (default: in-place paged-attention kernel on TPU), '0' (off:
    always the XLA gather path), 'interpret' (force the kernel in Pallas
    interpret mode — CPU equivalence tests)."""
    import os

    return os.environ.get("BITORCH_PAGED_KERNEL", "auto")


def _rope(pos: Array, head_dim: int, theta: float) -> Tuple[Array, Array]:
    """cos/sin tables for positions ``pos`` (any shape) → (..., head_dim/2)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = pos.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def _apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """x: (b, s, h, d) with cos/sin (b, s, d/2) — rotate-half convention."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def dataclasses_replace_pad(cfg: LlamaConfig) -> LlamaConfig:
    """cfg with proj_pad_to cleared (prevents infinite recursion in _proj)."""
    return cfg.replace(proj_pad_to=0)


def _proj(cfg: LlamaConfig, out_features: int, name: str, use_bias: bool = False):
    if (
        cfg.quantized
        and cfg.proj_pad_to
        and out_features % cfg.proj_pad_to
        and not use_bias
    ):
        n_pad = -(-out_features // cfg.proj_pad_to) * cfg.proj_pad_to
        inner = _proj(
            dataclasses_replace_pad(cfg), n_pad, name, use_bias=False
        )
        return lambda x: inner(x)[..., :out_features]
    if cfg.quantized and cfg.mbwq_strategy is not None:
        from ..layers.linear import MBWQLinear

        if use_bias:
            raise NotImplementedError("MBWQ projections do not support bias")
        from ..ops.mbwq_linear import strategy_dict

        # strategy entries are (bits, proportion[, group_size]) — see
        # ops/mbwq_linear.py::strategy_dict
        strategy = strategy_dict(
            cfg.mbwq_strategy, cfg.group_size, cfg.mbwq_container_bits,
            mid_sym=cfg.quant_mid_sym,
        )
        return MBWQLinear(out_features, strategy=strategy, dtype=cfg.dtype, name=name)
    if cfg.quantized:
        return MPQLinear(
            out_features,
            w_bit=cfg.w_bit,
            group_size=cfg.group_size,
            asym=cfg.asym,
            use_bias=use_bias,
            mid_sym=cfg.quant_mid_sym,
            dtype=cfg.dtype,
            name=name,
        )
    return nn.Dense(out_features, use_bias=use_bias, dtype=cfg.dtype, name=name)


class LlamaAttention(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(
        self,
        x: Array,
        positions: Array,
        kv_cache: Optional[Tuple[Array, Array]] = None,
        cache_len: Optional[Array] = None,
        attn_window: Optional[int] = None,
    ):
        """``attn_window``: static prefix length of the KV cache to attend
        over (a power-of-2 "bucket" chosen by the caller per step).  Decode
        at position p only needs cached positions < p; reading the whole
        ``max_seq_len`` cache wastes the dominant share of attention HBM
        traffic early in a sequence.  This step's own k/v never round-trip
        through the cache — they form an explicit second score block — so
        the CALLER CONTRACT is ``attn_window >= max(cache_len)``; cached
        positions at or beyond the window are silently dropped.  Writes
        always land in the full cache: the window only affects reads."""
        cfg = self.cfg
        b, s, _ = x.shape
        hd, nh, nkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads

        qkv_bias = cfg.attn_qkv_bias
        if cfg.fuse_qkv:
            qkv = _proj(cfg, (nh + 2 * nkv) * hd, "qkv_proj", use_bias=qkv_bias)(x)
            q, k, v = jnp.split(qkv, [nh * hd, (nh + nkv) * hd], axis=-1)
            q = q.reshape(b, s, nh, hd)
            k = k.reshape(b, s, nkv, hd)
            v = v.reshape(b, s, nkv, hd)
        else:
            q = _proj(cfg, nh * hd, "q_proj", use_bias=qkv_bias)(x).reshape(b, s, nh, hd)
            k = _proj(cfg, nkv * hd, "k_proj", use_bias=qkv_bias)(x).reshape(b, s, nkv, hd)
            v = _proj(cfg, nkv * hd, "v_proj", use_bias=qkv_bias)(x).reshape(b, s, nkv, hd)

        cos, sin = _rope(positions, hd, cfg.rope_theta)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)

        from .paged_kv import PagedKV, paged_write_positions

        kv_quant = cfg.kv_cache_dtype == "int8" and kv_cache is not None

        def quantize_kv(u):
            amax = jnp.max(jnp.abs(u.astype(jnp.float32)), axis=-1)
            scale = jnp.maximum(amax, 1e-6) / 127.0
            q8 = jnp.clip(
                jnp.round(u.astype(jnp.float32) / scale[..., None]), -127, 127
            ).astype(jnp.int8)
            return q8, scale.astype(jnp.float32)

        def write(cache, update, positions_):
            if jnp.ndim(positions_) == 0:
                return jax.lax.dynamic_update_slice_in_dim(
                    cache, update.astype(cache.dtype), positions_, axis=1
                )
            # per-slot positions (continuous batching): each batch row
            # writes its new KV at its own cache position
            return jax.vmap(
                lambda c, u, p: jax.lax.dynamic_update_slice_in_dim(
                    c, u.astype(c.dtype), p, axis=0
                )
            )(cache, update, positions_)

        # Three read regimes, each the measured optimum (BENCH_NOTES r2):
        #
        # * full read (no window / window >= allocation): attend over the
        #   POST-update cache in one pass.  The dus aliases the donated
        #   buffer in place and the whole-buffer read adds no layout or
        #   copy hazards.
        # * partial window (0 < w < allocation): slicing the post-update
        #   pool re-lays-out the whole pool every step (8B GQA +3.8 ms),
        #   and writing tokens into a pre-update slice makes XLA copy the
        #   pool to break the anti-dependency (7B MHA +7 ms) — so attention
        #   runs two-part: [pre-update prefix slice] ++ [this step's k/v as
        #   their own causal score block], one softmax over the concat.
        # * window == 0 (prefill-from-empty): no cache read at all; pure
        #   causal attention over the new tokens (flash kernel on TPU).
        k_pre = v_pre = ks_pre = vs_pre = None
        k_all = v_all = ks_all = vs_all = None
        ks_new = vs_new = None
        prefix_len = 0
        full_read = False
        kernel_wb = False
        if isinstance(kv_cache, PagedKV):
            import os as _os

            want_full = attn_window is None or attn_window >= kv_cache.view_len
            # decode steps are Pallas-kernel eligible; a full-allocation
            # window then runs through the kernel with window = view_len
            # (round-5: the whole-window gather materialized + re-read the
            # entire KV view every step — the kernel reads pages once)
            kernel_ok = (
                s == 1
                and hd % 128 == 0
                and _paged_kernel_mode() != "0"
                and (
                    jax.default_backend() == "tpu"
                    or _paged_kernel_mode() == "interpret"
                )
                and _os.environ.get("BITORCH_PAGED_WRITEBACK", "1") != "0"
            )
            full_read = want_full and not kernel_ok
            eff_window = (
                kv_cache.view_len if (want_full and kernel_ok) else attn_window
            )
            page, off = paged_write_positions(kv_cache, cache_len, b, s)
            tbl = kv_cache.page_table
            ps = kv_cache.page_size
            if not full_read:
                # read only the pages covering the window (writes use the
                # full table); window 0 = prefill-from-empty, no gather
                tbl = tbl[:, : max(0 if eff_window == 0 else 1, -(-eff_window // ps))]
            prefix_len = tbl.shape[1] * ps

            # decode steps on the Pallas paged path fuse the cache WRITE
            # into the kernel (in-place page writeback via
            # input_output_aliases) — every XLA-side pool write form has a
            # measured pathology at some batch size (BENCH_NOTES r3).
            # Contract: attn_window > max(cache_len) puts the write page
            # inside the window's table slice.
            kernel_wb = kernel_ok and not full_read and prefix_len > 0

            def gather(pool):
                # rank-3 KV pool (pages, ps, nkv·hd) → (b, P·ps, nkv, hd)
                g = jnp.take(pool, tbl, axis=0)  # (b, P, ps, nkv·hd)
                return g.reshape(b, prefix_len, nkv, hd)

            def pool_write(pool, update):
                """Write ``update`` (b, s, F) at (page, off) — F is the
                flattened nkv·hd token payload (or nkv for scale pools).

                Decode (s == 1): one contiguous ``(1, 1, F)`` dus per
                slot.  This form is the measured fixed point (device
                traces, BENCH_NOTES r3): a token write STRIDED over heads
                (head-major pools) flips XLA layout assignment into
                whole-pool layout-change copies every step (3.4 ms/step
                on 8B); a fori_loop of the same writes adds 2.8 ms of
                while-loop overhead; an advanced-index scatter lowers to
                XLA's scatter-while machinery (4.8 ms/step).  Unrolled
                contiguous dus ops have none of those pathologies, and
                duplicate page-0 writes from inactive lock-step slots
                resolve sequentially into the inert null page.  Prefill
                (s > 1, once per request) keeps the scatter — its page/off
                indices are adjacent, the layout-benign scatter form."""
                upd = update.astype(pool.dtype)
                # the unrolled dus chain is serial in b: past ~16 slots
                # its per-op cost overtakes the (batched, layout-benign
                # because indices are adjacent) scatter form
                unroll = s == 1 and b <= 16
                if not unroll:
                    return pool.at[page, off].set(upd)
                for i in range(b):
                    pool = lax.dynamic_update_slice(
                        pool, upd[i][None], (page[i, 0], off[i, 0], 0)
                    )
                return pool

            if kv_quant:
                k_new, ks_new = quantize_kv(k)
                v_new, vs_new = quantize_kv(v)
                # KV scales live in DENSE per-slot caches (slots, L, nkv)
                # — slots own disjoint pages, so per-(slot, position)
                # scales are isomorphic to paged ones, and the write is
                # the dense cache's single dus instead of a per-slot dus
                # chain over the scale pools (512 ops / 418 µs/step on the
                # b8 8B config, round-4 device trace).
                ksp = write(kv_cache.k_scale, ks_new, cache_len)
                vsp = write(kv_cache.v_scale, vs_new, cache_len)
                if kernel_wb:
                    # KV pools are written in-kernel (a scale row is below
                    # HBM tile granularity, so the kernel cannot DMA it —
                    # Mosaic 8-sublane slice rule); the kernel reads the
                    # post-update scale caches (bit-identical to
                    # pre-update under the pos < cache_len mask).
                    kv_cache = kv_cache.replace(k_scale=ksp, v_scale=vsp)
                    new_cache = None  # KV pools built by the kernel below
                else:
                    kp = pool_write(kv_cache.k_pool, k_new.reshape(b, s, nkv * hd))
                    vp = pool_write(kv_cache.v_pool, v_new.reshape(b, s, nkv * hd))
                    new_cache = kv_cache.replace(
                        k_pool=kp, v_pool=vp, k_scale=ksp, v_scale=vsp
                    )
                if full_read:
                    k_all, v_all = gather(kp), gather(vp)
                    ks_all = ksp[:, :prefix_len]
                    vs_all = vsp[:, :prefix_len]
                elif prefix_len and not kernel_wb:
                    ks_pre = kv_cache.k_scale[:, :prefix_len]
                    vs_pre = kv_cache.v_scale[:, :prefix_len]
            else:
                k_new = k.astype(kv_cache.k_pool.dtype)
                v_new = v.astype(kv_cache.v_pool.dtype)
                if kernel_wb:
                    new_cache = None
                else:
                    kp = pool_write(kv_cache.k_pool, k_new.reshape(b, s, nkv * hd))
                    vp = pool_write(kv_cache.v_pool, v_new.reshape(b, s, nkv * hd))
                    new_cache = kv_cache.replace(k_pool=kp, v_pool=vp)
                if full_read:
                    k_all, v_all = gather(kp), gather(vp)
            if not full_read and prefix_len and not kernel_wb:
                k_pre, v_pre = gather(kv_cache.k_pool), gather(kv_cache.v_pool)
            kv_len = prefix_len
        elif kv_cache is not None:
            total_len = (kv_cache[0]).shape[1]
            full_read = attn_window is None or attn_window >= total_len
            if kv_quant:
                # int8 pools (b,L,nkv,hd) + ONE merged scale cache
                # (b,L,2·nkv) = [k-scales | v-scales] halves — see
                # init_kv_caches; one dus writes both scale rows, and the
                # reads are plain lane slices that fuse into the score/
                # prob multiplies (an interleaved pair layout instead
                # needed a minor-dim-2 reshape XLA materialized as a
                # 71 µs/step relayout — round-5 forensics trace)
                ck0, cv0, ckvs0 = kv_cache
                k_new, ks_new = quantize_kv(k)
                v_new, vs_new = quantize_kv(v)
                kvs_new = jnp.concatenate([ks_new, vs_new], axis=-1)
                new_cache = (
                    write(ck0, k_new, cache_len),
                    write(cv0, v_new, cache_len),
                    write(ckvs0, kvs_new, cache_len),
                )

                def split_scales(kvs):
                    return kvs[..., :nkv], kvs[..., nkv:]

                if full_read:
                    k_all, v_all, kvs_all = new_cache
                    ks_all, vs_all = split_scales(kvs_all)
                else:
                    prefix_len = attn_window
                    if prefix_len:
                        k_pre, v_pre = ck0[:, :prefix_len], cv0[:, :prefix_len]
                        ks_pre, vs_pre = split_scales(ckvs0[:, :prefix_len])
            else:
                ck0, cv0 = kv_cache  # (b, max_len, nkv, hd)
                k_new = k.astype(ck0.dtype)
                v_new = v.astype(cv0.dtype)
                new_cache = (write(ck0, k_new, cache_len), write(cv0, v_new, cache_len))
                if full_read:
                    k_all, v_all = new_cache
                else:
                    prefix_len = attn_window
                    if prefix_len:
                        k_pre, v_pre = ck0[:, :prefix_len], cv0[:, :prefix_len]
            kv_len = total_len if full_read else prefix_len
        else:
            k_all, v_all = k, v
            kv_len = s
            new_cache = None

        rep = nh // nkv

        if cfg.sequence_parallel is not None and kv_cache is None and s > 1:
            # sequence-parallel exact attention: seq axis sharded over
            # cfg.sp_axis; KV heads repeated to full heads (ring/ulysses
            # operate per-head).  Positions are the global arange — the
            # standard full-sequence training layout.
            qh = q.transpose(0, 2, 1, 3).astype(cfg.dtype)  # (b, nh, s, d)
            kh = jnp.repeat(k, rep, axis=2).transpose(0, 2, 1, 3).astype(cfg.dtype)
            vh = jnp.repeat(v, rep, axis=2).transpose(0, 2, 1, 3).astype(cfg.dtype)
            if cfg.sequence_parallel == "ring":
                from ..parallel.ring_attention import ring_attention

                ctx = ring_attention(qh, kh, vh, mesh=cfg.sp_mesh, axis=cfg.sp_axis)
            elif cfg.sequence_parallel == "ulysses":
                from ..parallel.ulysses import ulysses_attention

                ctx = ulysses_attention(qh, kh, vh, mesh=cfg.sp_mesh, axis=cfg.sp_axis)
            else:
                raise ValueError(
                    f"unknown sequence_parallel {cfg.sequence_parallel!r}"
                )
            ctx = ctx.transpose(0, 2, 1, 3).astype(cfg.dtype).reshape(b, s, nh * hd)
            out = _proj(cfg, cfg.hidden_size, "o_proj")(ctx)
            return out, new_cache

        use_flash = (
            cfg.use_flash_attention
            and kv_cache is None
            and s > 1
            and jax.default_backend() == "tpu"
            and s % 128 == 0
        )
        if use_flash:
            # In-house kernel (ops/pallas/flash_attention.py): GQA-native
            # (KV consumed at nkv width — no jnp.repeat materialization) and
            # differentiable via custom_vjp backward kernels, so TRAINING
            # graphs take this path too: no s² score tensor exists in either
            # pass, and long-seq fine-tuning no longer needs remat to fit.
            # bf16 operands: softmax statistics stay f32 inside the kernel.
            from ..ops.pallas.flash_attention import flash_attention

            ctx = flash_attention(
                q.transpose(0, 2, 1, 3).astype(cfg.dtype),
                k_all.transpose(0, 2, 1, 3).astype(cfg.dtype),
                v_all.transpose(0, 2, 1, 3).astype(cfg.dtype),
                causal=True,
                sm_scale=1.0 / math.sqrt(hd),
            ).transpose(0, 2, 1, 3).astype(cfg.dtype)
            ctx = ctx.reshape(b, s, nh * hd)
            out = _proj(cfg, cfg.hidden_size, "o_proj")(ctx)
            return out, new_cache

        # GQA without materializing repeated KV: group the query heads
        # (b, s, nkv, rep, hd) against the shared KV heads — avoids rep×
        # extra HBM traffic on the cache, the decode hot path's second-
        # largest stream after the packed weights.
        qg = q.reshape(b, s, nkv, rep, hd)
        neg = jnp.finfo(jnp.float32).min
        if kv_cache is None or full_read:
            scores = jnp.einsum(
                "bqgrd,bkgd->bgrqk",
                qg,
                k_all.astype(qg.dtype),
                preferred_element_type=jnp.float32,
            ) / math.sqrt(hd)
            if kv_quant:
                # per-position scales factor out of the head_dim contraction
                scores = scores * ks_all.transpose(0, 2, 1)[:, :, None, None, :]
            # causal mask in absolute positions (works for prefill & decode)
            kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, s, kv_len), 4)
            q_pos = positions[:, None, None, :, None]
            mask = kv_pos <= q_pos
            if kv_cache is not None:
                valid = (
                    cache_len + s
                    if jnp.ndim(cache_len) == 0
                    else (cache_len + s)[:, None, None, None, None]
                )
                mask = jnp.logical_and(mask, kv_pos < valid)
            scores = jnp.where(mask, scores, neg)
            probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
            if kv_quant:
                probs = probs * vs_all.transpose(0, 2, 1)[:, :, None, None, :].astype(
                    probs.dtype
                )
            ctx = jnp.einsum("bgrqk,bkgd->bqgrd", probs, v_all.astype(probs.dtype))
            ctx = ctx.reshape(b, s, nh * hd)
            out = _proj(cfg, cfg.hidden_size, "o_proj")(ctx)
            return out, new_cache

        # caller-contract guard (attn_window >= max(cache_len)): cached
        # positions at/beyond the window would otherwise be silently dropped
        # and corrupt generation — poison the scores with NaN so a violation
        # surfaces in any finiteness check instead (scalar compare + select,
        # fused into the masking; no measurable cost on the decode path)
        if cache_len is None:
            _viol = jnp.float32(0.0)
        else:
            _viol = jnp.where(
                jnp.any(jnp.asarray(cache_len) > prefix_len), jnp.nan, 0.0
            ).astype(jnp.float32)

        if prefix_len == 0:
            # prefill-from-empty (attn_window == 0): pure causal attention
            # over this step's tokens.  Uses the (de)quantized k/v so the
            # logits match what a later cache read would produce.
            if kv_quant:
                kd = (k_new.astype(jnp.float32) * ks_new[..., None]).astype(cfg.dtype)
                vd = (v_new.astype(jnp.float32) * vs_new[..., None]).astype(cfg.dtype)
            else:
                kd, vd = k_new.astype(cfg.dtype), v_new.astype(cfg.dtype)
            if (
                cfg.use_flash_attention
                and s > 1
                and jax.default_backend() == "tpu"
                and s % 128 == 0
            ):
                from ..ops.pallas.flash_attention import flash_attention

                ctx = flash_attention(
                    q.transpose(0, 2, 1, 3).astype(cfg.dtype),
                    kd.transpose(0, 2, 1, 3),
                    vd.transpose(0, 2, 1, 3),
                    causal=True,
                    sm_scale=1.0 / math.sqrt(hd),
                ).transpose(0, 2, 1, 3).astype(cfg.dtype)
            else:
                # same math as the two-part sc_n block (codes in the dot,
                # scales factored out) so window=0 is bit-identical to a
                # covering window over an empty cache
                sc = jnp.einsum(
                    "bqgrd,bkgd->bgrqk",
                    qg,
                    k_new.astype(qg.dtype),
                    preferred_element_type=jnp.float32,
                ) / math.sqrt(hd)
                if kv_quant:
                    sc = sc * ks_new.transpose(0, 2, 1)[:, :, None, None, :]
                iq = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, s, s), 3)
                ik = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, s, s), 4)
                sc = jnp.where(ik <= iq, sc, neg)
                probs = jax.nn.softmax(sc, axis=-1).astype(cfg.dtype)
                if kv_quant:
                    probs = probs * vs_new.transpose(0, 2, 1)[
                        :, :, None, None, :
                    ].astype(probs.dtype)
                ctx = jnp.einsum(
                    "bgrqk,bkgd->bqgrd", probs, v_new.astype(probs.dtype)
                )
            ctx = (ctx.astype(jnp.float32) + _viol).astype(cfg.dtype)
            ctx = ctx.reshape(b, s, nh * hd)
            out = _proj(cfg, cfg.hidden_size, "o_proj")(ctx)
            return out, new_cache

        # In-place paged-attention kernel path: score the window's pages
        # straight from the (pre-update) pools via the page table — the
        # gather that materializes a dense window view (and its extra
        # write+read of the whole window) never happens.  The kernel
        # returns streaming-softmax state over the prefix; this step's own
        # tokens are a tiny causal XLA block merged in with a two-way
        # softmax combine (ops/pallas/paged_attention.py).
        if (
            isinstance(kv_cache, PagedKV)
            and hd % 128 == 0
            and _paged_kernel_mode() != "0"
            and (
                jax.default_backend() == "tpu"
                or _paged_kernel_mode() == "interpret"
            )
        ):
            from ..ops.pallas.paged_attention import (
                merge_attention_parts,
                paged_prefix_attention,
            )

            rs = rep * s
            qk2 = (
                q.reshape(b, s, nkv, rep, hd)
                .transpose(0, 2, 3, 1, 4)
                .reshape(b, nkv, rs, hd)
            )
            if kernel_wb:
                from ..ops.pallas.paged_attention import (
                    paged_prefix_attention_update,
                )

                acc_p, m_p, l_p, kp2, vp2 = paged_prefix_attention_update(
                    qk2,
                    kv_cache.k_pool,
                    kv_cache.v_pool,
                    kv_cache.k_scale,
                    kv_cache.v_scale,
                    tbl,
                    cache_len,
                    k_new.reshape(b, nkv * hd),
                    v_new.reshape(b, nkv * hd),
                    sm_scale=1.0 / math.sqrt(hd),
                    interpret=_paged_kernel_mode() == "interpret",
                )
                if kv_quant:
                    # post-update dense per-slot scale caches (dus above);
                    # the kernel reads these post-update caches — bit-
                    # identical to pre-update under its pos < cache_len mask
                    new_cache = kv_cache.replace(
                        k_pool=kp2, v_pool=vp2, k_scale=ksp, v_scale=vsp
                    )
                else:
                    new_cache = kv_cache.replace(k_pool=kp2, v_pool=vp2)
            else:
                acc_p, m_p, l_p = paged_prefix_attention(
                    qk2,
                    kv_cache.k_pool,
                    kv_cache.v_pool,
                    kv_cache.k_scale,
                    kv_cache.v_scale,
                    tbl,
                    cache_len,
                    sm_scale=1.0 / math.sqrt(hd),
                    interpret=_paged_kernel_mode() == "interpret",
                )
            if kv_quant:
                kd2 = (k_new.astype(jnp.float32) * ks_new[..., None]).astype(
                    qk2.dtype
                )
                vd2 = (v_new.astype(jnp.float32) * vs_new[..., None]).astype(
                    qk2.dtype
                )
            else:
                kd2 = k_new.astype(qk2.dtype)
                vd2 = v_new.astype(qk2.dtype)
            sc_n2 = jnp.einsum(
                "bgrd,bkgd->bgrk", qk2, kd2, preferred_element_type=jnp.float32
            ) / math.sqrt(hd)
            iq2 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, rs, s), 2) % s
            ik2 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, rs, s), 3)
            sc_n2 = jnp.where(ik2 <= iq2, sc_n2, neg)
            m_n = jnp.max(sc_n2, axis=-1, keepdims=True)
            p_n = jnp.exp(sc_n2 - m_n)
            l_n = jnp.sum(p_n, axis=-1, keepdims=True)
            acc_n = jnp.einsum(
                "bgrk,bkgd->bgrd", p_n, vd2.astype(jnp.float32)
            )
            ctx = merge_attention_parts(acc_p, m_p, l_p, acc_n, m_n, l_n)
            ctx = (ctx + _viol).astype(cfg.dtype)
            ctx = ctx.reshape(b, nkv, rep, s, hd).transpose(0, 3, 1, 2, 4)
            ctx = ctx.reshape(b, s, nh * hd)
            out = _proj(cfg, cfg.hidden_size, "o_proj")(ctx)
            return out, new_cache

        # Two-part scores: [prefix (positions < cache_len)] ++ [this step's
        # s tokens, causal among themselves].  Prefix entries are all
        # strictly older than every query position, so causality there
        # reduces to the cache_len validity mask.
        sc_p = jnp.einsum(
            "bqgrd,bkgd->bgrqk",
            qg,
            k_pre.astype(qg.dtype),
            preferred_element_type=jnp.float32,
        ) / math.sqrt(hd)
        if kv_quant:
            # per-position scales factor out of the head_dim contraction
            sc_p = sc_p * ks_pre.transpose(0, 2, 1)[:, :, None, None, :]
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, prefix_len), 4)
        cl = cache_len if jnp.ndim(cache_len) == 0 else cache_len[:, None, None, None, None]
        sc_p = jnp.where(kv_pos < cl, sc_p, neg) + _viol

        sc_n = jnp.einsum(
            "bqgrd,bkgd->bgrqk",
            qg,
            k_new.astype(qg.dtype),
            preferred_element_type=jnp.float32,
        ) / math.sqrt(hd)
        if kv_quant:
            sc_n = sc_n * ks_new.transpose(0, 2, 1)[:, :, None, None, :]
        iq = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, s, s), 3)
        ik = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, s, s), 4)
        sc_n = jnp.where(ik <= iq, sc_n, neg)

        probs = jax.nn.softmax(
            jnp.concatenate([sc_p, sc_n], axis=-1), axis=-1
        ).astype(cfg.dtype)
        pp, pn = probs[..., :prefix_len], probs[..., prefix_len:]
        if kv_quant:
            # fold per-position V scales into the probabilities
            pp = pp * vs_pre.transpose(0, 2, 1)[:, :, None, None, :].astype(pp.dtype)
            pn = pn * vs_new.transpose(0, 2, 1)[:, :, None, None, :].astype(pn.dtype)
        ctx = jnp.einsum(
            "bgrqk,bkgd->bqgrd", pp, v_pre.astype(pp.dtype)
        ) + jnp.einsum("bgrqk,bkgd->bqgrd", pn, v_new.astype(pn.dtype))
        ctx = ctx.reshape(b, s, nh * hd)
        out = _proj(cfg, cfg.hidden_size, "o_proj")(ctx)
        return out, new_cache


class LlamaMLP(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        if cfg.fuse_gate_up:
            gu = _proj(cfg, 2 * cfg.intermediate_size, "gate_up_proj")(x)
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = _proj(cfg, cfg.intermediate_size, "gate_proj")(x)
            up = _proj(cfg, cfg.intermediate_size, "up_proj")(x)
        h = jax.nn.silu(gate.astype(jnp.float32)).astype(cfg.dtype) * up
        return _proj(cfg, cfg.hidden_size, "down_proj")(h)


class QuantMoEMLP(nn.Module):
    """Mixtral-style MoE MLP: quantized SwiGLU experts + top-k router."""

    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ..ops.moe import init_moe_experts, moe_mlp

        cfg = self.cfg
        router = self.param(
            "router",
            nn.initializers.normal(0.02),
            (cfg.hidden_size, cfg.moe_num_experts),
            jnp.float32,
        )
        experts = self.param(
            "experts",
            lambda key: init_moe_experts(
                key,
                cfg.moe_num_experts,
                cfg.hidden_size,
                cfg.intermediate_size,
                w_bit=cfg.w_bit,
                group_size=cfg.group_size,
                stack=False,  # tuple form: relayout/checkpoint see plain MPQTensors
            ),
        )
        y, aux, dropped = moe_mlp(
            x,
            router,
            experts,
            top_k=cfg.moe_top_k,
            capacity_factor=cfg.moe_capacity_factor,
            renormalize=cfg.moe_renormalize,
        )
        # keep-last reduce: flax's compact double-trace would otherwise
        # append the (identical) value twice per apply
        self.sow(
            "losses",
            "moe_aux",
            aux,
            reduce_fn=lambda a, b: b,
            init_fn=lambda: jnp.zeros((), jnp.float32),
        )
        # observability for capacity-dropped routes (0 when drop-free)
        self.sow(
            "losses",
            "moe_dropped",
            dropped,
            reduce_fn=lambda a, b: b,
            init_fn=lambda: jnp.zeros((), jnp.float32),
        )
        return y


class LlamaBlock(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, positions, kv_cache=None, cache_len=None, attn_window=None):
        cfg = self.cfg
        h, new_cache = LlamaAttention(cfg, name="attn")(
            RMSNorm(cfg.rms_eps, cfg.dtype, name="input_norm")(x),
            positions,
            kv_cache,
            cache_len,
            attn_window,
        )
        x = x + h
        mlp_cls = QuantMoEMLP if cfg.moe_num_experts else LlamaMLP
        x = x + mlp_cls(cfg, name="mlp")(
            RMSNorm(cfg.rms_eps, cfg.dtype, name="post_attn_norm")(x)
        )
        return x, new_cache


class LlamaModel(nn.Module):
    """Decoder-only Llama; call with token ids.

    ``kv_caches``: optional list of per-layer (k, v) for incremental decode;
    returns (logits, new_caches).
    """

    cfg: LlamaConfig

    @nn.compact
    def __call__(
        self,
        tokens: Array,
        positions: Optional[Array] = None,
        kv_caches=None,
        cache_len: Optional[Array] = None,
        attn_window: Optional[int] = None,
    ):
        cfg = self.cfg
        b, s = tokens.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))

        # embed stored in compute dtype: the tied lm_head reads the whole
        # table every decode step, so an fp32 master would double that
        # stream AND force a 2 GB cast per step (fp32 masters for training
        # live in the optimizer state, not the params)
        if cfg.quantize_embed:

            def init_embed(key):
                e = (
                    jax.random.normal(
                        key, (cfg.vocab_size, cfg.hidden_size), jnp.float32
                    )
                    * 0.02
                )
                scale = jnp.maximum(jnp.max(jnp.abs(e), axis=1), 1e-6) / 127.0
                q = jnp.clip(jnp.round(e / scale[:, None]), -127, 127).astype(
                    jnp.int8
                )
                return {"data": q, "scale": scale.astype(jnp.float32)}

            embed_q = self.param("embed", init_embed)
            e8, e_scale = embed_q["data"], embed_q["scale"]
            x = (
                e8[tokens].astype(cfg.dtype)
                * e_scale[tokens][..., None].astype(cfg.dtype)
            )
        else:
            embed = self.param(
                "embed",
                lambda key: (
                    jax.random.normal(
                        key, (cfg.vocab_size, cfg.hidden_size), jnp.float32
                    )
                    * 0.02
                ).astype(cfg.dtype),
            )
            x = embed[tokens].astype(cfg.dtype)

        block_cls = LlamaBlock
        if cfg.remat and kv_caches is None:
            # rematerialized blocks for training: flax.linen.remat wraps the
            # module so the backward pass recomputes block activations
            # (kv_cache/cache_len/attn_window are None here — empty pytrees,
            # no static marking needed)
            block_cls = nn.remat(LlamaBlock)
        new_caches = []
        for i in range(cfg.num_layers):
            cache_i = kv_caches[i] if kv_caches is not None else None
            x, nc = block_cls(cfg, name=f"layer_{i}")(
                x, positions, cache_i, cache_len, attn_window
            )
            new_caches.append(nc)

        x = RMSNorm(cfg.rms_eps, cfg.dtype, name="final_norm")(x)
        if cfg.head_w_bit is not None:
            n_head = cfg.vocab_size
            if cfg.head_pad_to:
                pad = cfg.head_pad_to
                n_head = (cfg.vocab_size + pad - 1) // pad * pad
            logits = MPQLinear(
                out_features=n_head,
                w_bit=cfg.head_w_bit,
                group_size=128,
                dtype=cfg.dtype,
                name="lm_head",
            )(x)[..., : cfg.vocab_size].astype(jnp.float32)
        elif cfg.quantize_embed:
            # per-row scale factors out of the hidden contraction
            logits = (
                jnp.dot(
                    x, e8.T.astype(cfg.dtype), preferred_element_type=jnp.float32
                )
                * e_scale[None, None, :]
            )
        else:
            logits = jnp.dot(
                x, embed.T.astype(cfg.dtype), preferred_element_type=jnp.float32
            )
        return logits, (new_caches if kv_caches is not None else None)


def fuse_llama_params(params, fuse_qkv: bool = True, fuse_gate_up: bool = True):
    """Rewrite an unfused param tree for ``fuse_qkv``/``fuse_gate_up`` configs.

    q|k|v (and gate|up) projections concatenate along the output-feature
    axis — for MPQTensors via :func:`~bitorch_engine_tpu.ops.quant.concat_mpq`
    (group metadata concatenates with the codes), for fp Dense kernels via
    plain ``concatenate`` on the N axis.  Output-column independence of the
    matmul makes the fused model's logits identical to the unfused model's.
    """
    from ..ops.quant import concat_mpq
    from ..qtensor import MPQTensor

    def fuse_group(mod: dict, names, fused_name):
        if not all(n in mod for n in names):
            return mod
        parts = [mod[n] for n in names]
        mod = {k: v for k, v in mod.items() if k not in names}
        if all("qweight" in p for p in parts):
            assert all(isinstance(p["qweight"], MPQTensor) for p in parts)
            fused = {"qweight": concat_mpq(tuple(p["qweight"] for p in parts))}
        else:
            fused = {
                "kernel": jnp.concatenate([p["kernel"] for p in parts], axis=1)
            }
        if all("bias" in p for p in parts):
            fused["bias"] = jnp.concatenate([p["bias"] for p in parts], axis=0)
        mod[fused_name] = fused
        return mod

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if (
                fuse_qkv
                and isinstance(v, dict)
                and {"q_proj", "k_proj", "v_proj"} <= set(v)
            ):
                v = fuse_group(v, ("q_proj", "k_proj", "v_proj"), "qkv_proj")
            if (
                fuse_gate_up
                and isinstance(v, dict)
                and {"gate_proj", "up_proj"} <= set(v)
            ):
                v = fuse_group(v, ("gate_proj", "up_proj"), "gate_up_proj")
            out[k] = walk(v)
        return out

    return walk(params)


def init_kv_caches(cfg: LlamaConfig, batch: int, max_len: Optional[int] = None):
    """Allocate empty per-layer KV caches.

    bf16: per layer ``(k, v)`` of (b, max_len, kv_heads, head_dim).
    int8: per layer ``(k_int8, k_scales, v_int8, v_scales)`` with fp32
    per-position scales (b, max_len, kv_heads).
    """
    max_len = max_len or cfg.max_seq_len
    shape = (batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    if cfg.kv_cache_dtype == "int8":
        # k and v per-position scales share ONE merged cache
        # (b, L, 2·kv_heads) = [k-scales | v-scales] halves: a decode
        # step then writes one dus instead of two (standalone small-op
        # latency ~1.9 µs each, ×64/step on the 8B serving config —
        # round-5 trace), reads are fusible lane slices, and the
        # lane-padded physical footprint halves.  Under tp the cache is
        # replicated over heads (512 KB/layer of f32 — see
        # kv_cache_shardings).
        sshape = (batch, max_len, 2 * cfg.num_kv_heads)
        return [
            (
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(sshape, jnp.float32),
            )
            for _ in range(cfg.num_layers)
        ]
    return [
        (jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype))
        for _ in range(cfg.num_layers)
    ]


def decode_step(model: LlamaModel, params, tokens, kv_caches, cache_len):
    """One decode step: tokens (b, 1) → (next_logits, new_caches).

    Designed to be ``jit``-ed once and reused for every generated token.
    """
    positions = jnp.broadcast_to(cache_len, (tokens.shape[0], 1)).astype(jnp.int32)
    logits, new_caches = model.apply(
        params, tokens, positions=positions, kv_caches=kv_caches, cache_len=cache_len
    )
    return logits[:, -1], new_caches


def prefill(model: LlamaModel, params, tokens, kv_caches):
    """Prefill the cache with a full prompt; returns (logits, caches).

    ``attn_window=0``: the (empty) cached prefix is skipped entirely and
    the flash-attention kernel engages on TPU."""
    return model.apply(
        params,
        tokens,
        kv_caches=kv_caches,
        cache_len=jnp.zeros((), jnp.int32),
        attn_window=0,
    )
