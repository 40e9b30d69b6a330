"""Generation & serving: sampling loop and continuous-batching decode driver.

Greenfield per BASELINE.json's north star ("continuous batching across
hosts") — the reference has no serving loop at all (SURVEY.md §0).  This is
the single-host core; multi-host request routing rides on top of the same
slot engine with dp-sharded slots.

Design (TPU-first):
* one jitted ``_decode_step`` reused for every token — static shapes, the
  KV cache is a fixed ``(slots, max_len, ...)`` ring per layer;
* **slot-based continuous batching**: a fixed number of batch slots, each
  with its own ``cache_len``; finished sequences free their slot and a
  pending prompt is prefilled into it while other slots keep decoding —
  the decode step is never blocked by stragglers;
* per-slot position/active masks are device arrays, so admission control is
  the only host-side work per token.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaModel, init_kv_caches
from .paged_kv import PageAllocator, init_paged_kv_caches

Array = jax.Array


def sample_token(logits: Array, key, temperature: float = 0.0, top_k: int = 0) -> Array:
    """Greedy (temperature 0) or top-k temperature sampling; logits (b, V)."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)


def generate(
    model: LlamaModel,
    params,
    prompt: Array,
    max_new_tokens: int = 32,
    temperature: float = 0.0,
    eos_id: Optional[int] = None,
    seed: int = 0,
    max_len: Optional[int] = None,
) -> Array:
    """Simple batched generation: prefill the prompt then decode greedily.

    ``prompt``: int32 ``(batch, prompt_len)``; returns ``(batch,
    prompt_len + max_new_tokens)`` (sequences past EOS repeat EOS).
    """
    cfg = model.cfg
    b, plen = prompt.shape
    max_len = max_len or min(cfg.max_seq_len, plen + max_new_tokens)
    caches = init_kv_caches(cfg, b, max_len)

    @jax.jit
    def prefill_step(params, tokens, caches):
        logits, caches = model.apply(
            params, tokens, kv_caches=caches, cache_len=jnp.zeros((), jnp.int32)
        )
        return logits[:, -1], caches

    @jax.jit
    def decode_one(params, tok, caches, pos, key):
        positions = jnp.broadcast_to(pos, (tok.shape[0], 1)).astype(jnp.int32)
        logits, caches = model.apply(
            params, tok, positions=positions, kv_caches=caches, cache_len=pos
        )
        key, sub = jax.random.split(key)
        nxt = sample_token(logits[:, -1], sub, temperature)
        return nxt, caches, key

    logits, caches = prefill_step(params, prompt, caches)
    key = jax.random.PRNGKey(seed)
    nxt = sample_token(logits, key, temperature)
    out = [prompt, nxt[:, None]]
    finished = jnp.zeros((b,), jnp.bool_) if eos_id is not None else None
    for i in range(max_new_tokens - 1):
        pos = jnp.asarray(plen + i, jnp.int32)
        nxt, caches, key = decode_one(params, nxt[:, None], caches, pos, key)
        if eos_id is not None:
            finished = jnp.logical_or(finished, nxt == eos_id)
            nxt = jnp.where(finished, eos_id, nxt)
        out.append(nxt[:, None])
    return jnp.concatenate(out, axis=1)


# ---------------------------------------------------------------------------
# Continuous batching
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Request:
    uid: int
    prompt: np.ndarray  # (plen,) int32
    max_new_tokens: int = 64
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


class ContinuousBatcher:
    """Slot-based continuous batching engine (single host).

    ``slots`` decode in lock-step with one jitted step; each slot has its
    own position.  ``submit`` enqueues requests; ``run`` drains the queue,
    prefilling free slots between decode steps.
    """

    def __init__(
        self,
        model: LlamaModel,
        params,
        num_slots: int = 4,
        max_len: int = 512,
        eos_id: int = -1,
        temperature: float = 0.0,
        decode_chunk: int = 1,
        kv_pages: Optional[int] = None,
        kv_page_size: int = 64,
        mesh=None,
        prefill_chunk: Optional[int] = None,
    ):
        """``decode_chunk``: decode T tokens per host sync (one ``lax.scan``
        on device).  T>1 amortizes dispatch/fetch latency — essential for
        high-RTT links, and still saves ~T× host overhead locally — at the
        cost of up to T-1 wasted slot-steps after a mid-chunk EOS (the slot
        is re-prefilled on the next admit, so correctness is unaffected).

        ``prefill_chunk``: split prompts longer than this (a power of 2)
        into fixed C-token prefill chunks run sequentially through the
        mid-sequence prefill path (cache_len > 0, two-part attention).
        Bounds compile cost to ONE graph per (C, window) pair regardless
        of prompt length instead of one graph per power-of-2 bucket, and
        caps the activation footprint of very long prompts.

        ``kv_pages``: enable the paged KV cache with this many pool pages
        of ``kv_page_size`` tokens each (page 0 is reserved; usable
        capacity ``(kv_pages-1)*kv_page_size`` tokens, chosen independently
        of ``num_slots*max_len`` — the dense cache's OOM axis at large
        batch).  Admission blocks (never mid-decode) when the pool is
        exhausted; outputs are bit-identical to the dense cache.

        ``mesh``: a ``jax.sharding.Mesh`` with ('dp', ..., 'tp') axes turns
        this into the **multi-host-shaped serving engine** (BASELINE north
        star "continuous batching across hosts"): slots (and the dense
        caches' batch axis / the page table's slot axis) shard over 'dp',
        params and KV heads over 'tp', and the paged allocator hands each
        dp group pages from its own range so page gathers never cross dp
        shards.  Caller passes params already sharded (e.g. via
        ``llama_sharding.shard_llama_params``).  Outputs are bit-identical
        to the unsharded batcher (tested across mesh shapes)."""
        self.model = model
        self.params = params
        self.cfg = model.cfg
        self.num_slots = num_slots
        self.max_len = max_len
        self.eos_id = eos_id
        self.temperature = temperature
        self.decode_chunk = max(1, int(decode_chunk))
        if prefill_chunk is not None and (
            prefill_chunk < 8 or prefill_chunk & (prefill_chunk - 1)
        ):
            raise ValueError(f"prefill_chunk must be a power of 2 >= 8, got {prefill_chunk}")
        self.prefill_chunk = prefill_chunk
        self.mesh = mesh
        dp = int(mesh.shape.get("dp", 1)) if mesh is not None else 1
        if mesh is not None and num_slots % dp:
            raise ValueError(f"num_slots {num_slots} not divisible by dp {dp}")
        # Multi-process world (jax.distributed): the mesh spans processes,
        # so (a) host arrays become global arrays via
        # make_array_from_callback (device_put can't target non-addressable
        # devices), (b) sampled tokens are constrained REPLICATED so every
        # process fetches identical values and the host-side bookkeeping —
        # queue, slots, allocator — stays in deterministic lockstep (the
        # BASELINE "continuous batching across hosts" control model: each
        # host runs the same engine, data-parallel shards live where their
        # dp group is).
        self._mp = mesh is not None and jax.process_count() > 1
        self._rep = None
        if self._mp:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._rep = NamedSharding(mesh, P())
        self.paged = kv_pages is not None
        if self.paged:
            if max_len % kv_page_size:
                raise ValueError(
                    f"max_len {max_len} must be a multiple of kv_page_size {kv_page_size}"
                )
            pages_per_slot = max_len // kv_page_size
            self.allocator = PageAllocator(
                kv_pages, kv_page_size, num_slots, pages_per_slot, dp_groups=dp
            )
            self.caches = init_paged_kv_caches(
                self.cfg, kv_pages, kv_page_size, num_slots, pages_per_slot
            )
        else:
            self.caches = init_kv_caches(self.cfg, num_slots, max_len)

        self._tok_sharding = self._vec_sharding = self._table_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .llama_sharding import kv_cache_shardings, paged_kv_shardings

            cache_sh = (
                paged_kv_shardings(mesh, self.caches)
                if self.paged
                else kv_cache_shardings(
                    mesh, self.cfg.num_layers, self.cfg.kv_cache_dtype
                )
            )
            if self._mp:
                # every process constructs identical (deterministic) caches
                # and contributes its addressable shards
                self.caches = jax.tree_util.tree_map(
                    lambda a, s: jax.make_array_from_callback(
                        a.shape, s, lambda idx, a=a: np.asarray(a)[idx]
                    ),
                    self.caches,
                    cache_sh,
                )
            else:
                self.caches = jax.device_put(self.caches, cache_sh)
            self._tok_sharding = NamedSharding(mesh, P("dp", None))
            self._vec_sharding = NamedSharding(mesh, P("dp"))
            self._table_sharding = NamedSharding(mesh, P("dp", None))
        self.positions = np.zeros(num_slots, np.int32)  # next cache position
        self.active: List[Optional[Request]] = [None] * num_slots
        self.cur_tok = np.zeros((num_slots, 1), np.int32)
        self.queue: List[Request] = []
        # every request ever submitted and not yet collected by run();
        # lives here (not in run()) so submit→step()→run() sequences and
        # submissions made while a drain loop is in flight are all tracked
        self._all: List[Request] = []
        self._uid = 0

        cfg = self.cfg
        model_ = self.model
        rep_ = self._rep  # non-None only in the multi-process world

        def _rep_out(x):
            # replicate token-ish outputs across processes so every host
            # fetches identical values (one tiny all-gather; no-op when
            # rep_ is None)
            if rep_ is None:
                return x
            return jax.lax.with_sharding_constraint(x, rep_)

        # donate_argnums(caches): without donation XLA materializes a full
        # copy of every KV pool per step to produce the new caches — on a
        # 7B MHA model that is ~2.3 ms/step of s8 copies (device trace,
        # BENCH_NOTES round 2).  The batcher rebinds self.caches from the
        # result on the same line, so the donated buffers are never reused.
        @functools.partial(
            jax.jit, donate_argnums=(2,), static_argnames=("window",)
        )
        def _decode(params, toks, caches, positions, active_mask, key, window=None):
            # toks (slots, 1); positions (slots,) — per-slot cache positions.
            # ``window``: static power-of-2 attention bucket covering every
            # active slot's positions (host-computed) — reads that cache
            # prefix instead of the whole max_len (bit-identical).
            logits, caches = model_.apply(
                params,
                toks,
                positions=positions[:, None],
                kv_caches=caches,
                cache_len=positions,
                attn_window=window,
            )
            key, sub = jax.random.split(key)
            nxt = sample_token(logits[:, -1], sub, temperature)
            nxt = jnp.where(active_mask, nxt, 0)
            return _rep_out(nxt), caches, key

        self._decode = _decode
        self._key = (
            self._put(np.asarray(jax.random.PRNGKey(0)), self._rep)
            if self._mp
            else jax.random.PRNGKey(0)
        )
        max_len_ = max_len

        @functools.partial(
            jax.jit, static_argnames=("n_steps", "window"), donate_argnums=(2,)
        )
        def _decode_chunk(
            params, toks, caches, positions, active_mask, key, n_steps, window=None
        ):
            """n_steps greedy/sampled decode steps in ONE device dispatch.
            ``window`` must cover max(positions) + n_steps."""

            def body(carry, _):
                toks, caches, positions, key = carry
                logits, caches = model_.apply(
                    params,
                    toks,
                    positions=positions[:, None],
                    kv_caches=caches,
                    cache_len=positions,
                    attn_window=window,
                )
                key, sub = jax.random.split(key)
                nxt = sample_token(logits[:, -1], sub, temperature)
                nxt = jnp.where(active_mask, nxt, 0)
                positions = jnp.where(
                    active_mask,
                    jnp.minimum(positions + 1, max_len_ - 1),
                    positions,
                )
                return (nxt[:, None], caches, positions, key), nxt

            (toks, caches, positions, key), toks_seq = jax.lax.scan(
                body, (toks, caches, positions, key), None, length=n_steps
            )
            return _rep_out(toks_seq), caches, positions, key

        self._decode_chunk = _decode_chunk


        @functools.partial(jax.jit, donate_argnums=(1,))
        def _prefill_slots(params, caches, tokens, slots, true_lens):
            """Prefill n slots in ONE dispatch: ``tokens`` (n, bucket),
            ``slots`` (n,) distinct slot indices, ``true_lens`` (n,).

            The n requests run as one batched forward; per-slot caches are
            gathered with ``take`` and scattered back with ``.at[slots]``.
            """
            # window 0 = prefill-from-empty: the cached prefix is skipped
            # entirely (and the flash kernel engages on TPU)
            logits, slot_caches = model_.apply(
                params,
                tokens,
                kv_caches=[
                    tuple(jnp.take(a, slots, axis=0) for a in layer)
                    for layer in caches
                ],
                cache_len=jnp.zeros((), jnp.int32),
                attn_window=0,
            )
            new_caches = [
                tuple(
                    a.at[slots].set(sa) for a, sa in zip(layer, slayer)
                )
                for layer, slayer in zip(caches, slot_caches)
            ]
            last = jnp.take_along_axis(
                logits, (true_lens - 1)[:, None, None], axis=1
            )[:, 0]
            return _rep_out(last), new_caches

        self._prefill_slots = _prefill_slots

        def _scale_take(caches, slots):
            """Per-slot rows of the dense scale caches for this admit wave
            (KV pools are slot-agnostic — pages do the indirection — but
            scales are positional per slot; see models/paged_kv.py)."""
            return [
                c
                if c.k_scale is None
                else c.replace(
                    k_scale=jnp.take(c.k_scale, slots, axis=0),
                    v_scale=jnp.take(c.v_scale, slots, axis=0),
                )
                for c in caches
            ]

        def _scale_put(full, new_caches, slots):
            return [
                nc
                if f.k_scale is None
                else nc.replace(
                    k_scale=f.k_scale.at[slots].set(nc.k_scale),
                    v_scale=f.v_scale.at[slots].set(nc.v_scale),
                )
                for f, nc in zip(full, new_caches)
            ]

        @functools.partial(jax.jit, donate_argnums=(1,))
        def _prefill_slots_paged(
            params, caches, tokens, table_rows, slots, true_lens
        ):
            """Paged prefill: no KV slot gather/scatter — writes land
            directly in the pool pages named by this admit-wave's table
            rows.  Only the dense per-slot scale caches gather/scatter by
            ``slots`` (tiny rows)."""
            in_tables = [c.page_table for c in caches]
            wave = [
                c.replace(page_table=table_rows)
                for c in _scale_take(caches, slots)
            ]
            logits, new_caches = model_.apply(
                params,
                tokens,
                kv_caches=wave,
                cache_len=jnp.zeros((tokens.shape[0],), jnp.int32),
                attn_window=0,
            )
            new_caches = _scale_put(caches, new_caches, slots)
            # restore each layer's own table buffer: returning table_rows
            # for every layer would alias ONE output buffer across layers,
            # and the next donated call rejects duplicate donated buffers
            new_caches = [
                c.replace(page_table=t) for c, t in zip(new_caches, in_tables)
            ]
            last = jnp.take_along_axis(
                logits, (true_lens - 1)[:, None, None], axis=1
            )[:, 0]
            return _rep_out(last), new_caches

        self._prefill_slots_paged = _prefill_slots_paged

        vocab_ = self.cfg.vocab_size

        @functools.partial(
            jax.jit, donate_argnums=(1,), static_argnames=("window",)
        )
        def _prefill_chunk_slots(
            params, caches, tokens, slots, true_lens, last, base, window
        ):
            """One C-token prefill chunk at cache offset ``base`` (traced
            scalar — chunk index changes don't recompile; only the static
            ``window`` bucket does).  ``last`` carries each request's
            final-prompt-token logits across chunks."""
            n, C = tokens.shape
            positions = base + jnp.arange(C, dtype=jnp.int32)[None, :]
            positions = jnp.broadcast_to(positions, (n, C))
            logits, slot_caches = model_.apply(
                params,
                tokens,
                positions=positions,
                kv_caches=[
                    tuple(jnp.take(a, slots, axis=0) for a in layer)
                    for layer in caches
                ],
                cache_len=base.astype(jnp.int32),
                attn_window=window,
            )
            new_caches = [
                tuple(a.at[slots].set(sa) for a, sa in zip(layer, slayer))
                for layer, slayer in zip(caches, slot_caches)
            ]
            idx = jnp.clip(true_lens - 1 - base, 0, C - 1)
            picked = jnp.take_along_axis(logits, idx[:, None, None], axis=1)[:, 0]
            inrange = (true_lens - 1 >= base) & (true_lens - 1 < base + C)
            last = jnp.where(inrange[:, None], picked, last)
            return _rep_out(last), new_caches

        self._prefill_chunk_slots = _prefill_chunk_slots

        @functools.partial(
            jax.jit, donate_argnums=(1,), static_argnames=("window",)
        )
        def _prefill_chunk_paged(
            params, caches, tokens, table_rows, slots, true_lens, last, base,
            window,
        ):
            in_tables = [c.page_table for c in caches]
            wave = [
                c.replace(page_table=table_rows)
                for c in _scale_take(caches, slots)
            ]
            n, C = tokens.shape
            positions = base + jnp.arange(C, dtype=jnp.int32)[None, :]
            positions = jnp.broadcast_to(positions, (n, C))
            logits, new_caches = model_.apply(
                params,
                tokens,
                positions=positions,
                kv_caches=wave,
                cache_len=base.astype(jnp.int32),
                attn_window=window,
            )
            new_caches = _scale_put(caches, new_caches, slots)
            new_caches = [
                c.replace(page_table=t) for c, t in zip(new_caches, in_tables)
            ]
            idx = jnp.clip(true_lens - 1 - base, 0, C - 1)
            picked = jnp.take_along_axis(logits, idx[:, None, None], axis=1)[:, 0]
            inrange = (true_lens - 1 >= base) & (true_lens - 1 < base + C)
            last = jnp.where(inrange[:, None], picked, last)
            return _rep_out(last), new_caches

        self._prefill_chunk_paged = _prefill_chunk_paged

    def _put(self, arr, sharding):
        if sharding is None:
            return jnp.asarray(arr)
        a = np.asarray(arr)
        if self._mp:
            return jax.make_array_from_callback(
                a.shape, sharding, lambda idx: a[idx]
            )
        return jax.device_put(a, sharding)

    def _local(self, arr):
        """Host-fetch an output: replicated global arrays in the
        multi-process world, plain arrays otherwise."""
        if self._mp:
            return np.asarray(jax.device_get(arr.addressable_data(0)))
        return np.asarray(arr)

    def _caches_in(self):
        """Caches as passed to the jitted step: in paged mode, attach the
        allocator's current full page table (host-side replace, no copy of
        the pools).  One ``_put`` per layer: the decode step donates the
        cache pytree, and XLA rejects donating the same buffer twice, so
        each layer needs its own (tiny) table buffer."""
        if not self.paged:
            return self.caches
        return [
            c.replace(page_table=self._put(self.allocator.table, self._table_sharding))
            for c in self.caches
        ]

    def submit(self, prompt: Sequence[int], max_new_tokens: int = 64) -> int:
        self._uid += 1
        req = Request(self._uid, np.asarray(prompt, np.int32), max_new_tokens)
        self.queue.append(req)
        self._all.append(req)
        return self._uid

    def _bucket(self, plen: int) -> int:
        """Power-of-2 length bucket (min 8, capped below max_len): each
        bucket compiles one prefill graph instead of one per prompt length."""
        if plen >= self.max_len:
            raise ValueError(f"prompt length {plen} >= max_len {self.max_len}")
        bucket = 8
        while bucket < plen:
            bucket *= 2
        return min(bucket, self.max_len - 1)

    def _admit(self):
        """Fill free slots from the queue.  All queued requests sharing the
        FIFO head's length-bucket are prefilled in a single batched dispatch
        (the host sync per prefill dominates serving cost on high-latency
        links); pulling same-bucket requests from *anywhere* in the queue —
        not just the contiguous prefix — keeps one long head prompt from
        splitting the short prompts behind it into separate dispatches.
        The head is always admitted first, so FIFO priority is preserved."""
        while self.queue and any(r is None for r in self.active):
            free = [s for s in range(self.num_slots) if self.active[s] is None]
            bucket = self._bucket(len(self.queue[0].prompt))
            batch: List[Request] = []
            rest: List[Request] = []
            pool_full = False
            for req in self.queue:
                take = (
                    not pool_full
                    and len(batch) < len(free)
                    and self._bucket(len(req.prompt)) == bucket
                )
                if take and self.paged:
                    # reserve the request's worst-case pages up front so
                    # the pool can never run out mid-decode; strict FIFO —
                    # an exhausted pool blocks the whole wave rather than
                    # letting small requests starve the head
                    need = min(
                        len(req.prompt) + req.max_new_tokens, self.max_len
                    )
                    if not self.allocator.alloc(free[len(batch)], need):
                        pool_full = True
                        take = False
                if take:
                    batch.append(req)
                else:
                    rest.append(req)
            self.queue = rest
            if not batch:
                return  # pool exhausted: wait for decode to free pages
            slots = free[: len(batch)]
            padded = np.zeros((len(batch), bucket), np.int32)
            for i, req in enumerate(batch):
                padded[i, : len(req.prompt)] = req.prompt
            true_lens = np.asarray([len(r.prompt) for r in batch], np.int32)
            chunked = self.prefill_chunk is not None and bucket > self.prefill_chunk
            if chunked:
                logits = self._prefill_chunked(padded, slots, true_lens)
            elif self.paged:
                logits, self.caches = self._prefill_slots_paged(
                    self.params,
                    self.caches,
                    self._put(padded, self._rep),
                    self._put(self.allocator.table[slots], self._rep),
                    self._put(np.asarray(slots, np.int32), self._rep),
                    self._put(true_lens, self._rep),
                )
            else:
                logits, self.caches = self._prefill_slots(
                    self.params,
                    self.caches,
                    self._put(padded, self._rep),
                    self._put(np.asarray(slots, np.int32), self._rep),
                    self._put(true_lens, self._rep),
                )
            nxt_np = self._local(jnp.argmax(logits, -1))
            for i, (s, req) in enumerate(zip(slots, batch)):
                nxt = int(nxt_np[i])
                req.generated.append(nxt)
                if nxt == self.eos_id or req.max_new_tokens <= 1:
                    req.done = True
                    if self.paged:
                        self.allocator.free_slot(s)
                    continue  # slot stays free for the next admit round
                self.active[s] = req
                self.positions[s] = len(req.prompt)
                self.cur_tok[s, 0] = nxt

    def _prefill_chunked(self, padded, slots, true_lens):
        """Sequential C-token prefill chunks over one admit wave.  Chunk j
        writes positions [j·C, (j+1)·C) and attends over [pre-update prefix
        window] ++ [the chunk, causal] — the generic mid-sequence prefill.
        Returns each request's final-prompt-token logits."""
        C = self.prefill_chunk
        n, bucket = padded.shape
        tl = self._put(true_lens, self._vec_sharding)
        last = self._put(
            np.zeros((n, self.cfg.vocab_size), np.float32),
            self._rep if self._mp else self._tok_sharding,
        ) if (self._tok_sharding is not None or self._mp) else jnp.zeros(
            (n, self.cfg.vocab_size), jnp.float32
        )
        table_rows = (
            self._put(self.allocator.table[slots], self._table_sharding)
            if self.paged
            else None
        )
        slots_j = self._put(np.asarray(slots, np.int32), self._vec_sharding)
        for j in range(bucket // C):
            toks = self._put(padded[:, j * C : (j + 1) * C], self._tok_sharding)
            base = jnp.asarray(j * C, jnp.int32)
            window = 0 if j == 0 else self._window(j * C)
            if self.paged:
                last, self.caches = self._prefill_chunk_paged(
                    self.params, self._caches_in() if j == 0 else self.caches,
                    toks, table_rows, slots_j, tl, last, base, window=window,
                )
            else:
                last, self.caches = self._prefill_chunk_slots(
                    self.params, self.caches, toks, slots_j, tl, last, base,
                    window=window,
                )
        return last

    def _window(self, needed: int) -> int:
        """Smallest power-of-2 attention bucket covering ``needed`` cache
        positions, capped at max_len.  The floor bounds compile count and
        is a measured per-architecture optimum (v5e A/B, BENCH_NOTES
        round 2): GQA decode prefers 256, MHA 128."""
        cfg = self.cfg
        w = 256 if cfg.num_kv_heads < cfg.num_heads else 128
        while w < needed:
            w *= 2
        return min(w, self.max_len)

    def step(self):
        """One decode step across all active slots."""
        active_mask = self._put(
            np.asarray([r is not None for r in self.active]), self._vec_sharding
        )
        window = self._window(int(self.positions.max()) + 1)
        nxt, self.caches, self._key = self._decode(
            self.params,
            self._put(self.cur_tok, self._tok_sharding),
            self._caches_in(),
            self._put(self.positions, self._vec_sharding),
            active_mask,
            self._key,
            window=window,
        )
        nxt_np = self._local(nxt)
        for s, req in enumerate(self.active):
            if req is None:
                continue
            tok = int(nxt_np[s])
            req.generated.append(tok)
            self.positions[s] += 1
            self.cur_tok[s, 0] = tok
            if (
                tok == self.eos_id
                or len(req.generated) >= req.max_new_tokens
                or self.positions[s] >= self.max_len - 1
            ):
                req.done = True
                self.active[s] = None
                self.positions[s] = 0
                if self.paged:
                    self.allocator.free_slot(s)

    def step_chunk(self, n_steps: int):
        """``n_steps`` decode steps in one device dispatch (lax.scan), then
        one host sync to reconcile EOS / quotas / evictions."""
        active_mask = self._put(
            np.asarray([r is not None for r in self.active]), self._vec_sharding
        )
        toks_seq, self.caches, _, self._key = self._decode_chunk(
            self.params,
            self._put(self.cur_tok, self._tok_sharding),
            self._caches_in(),
            self._put(self.positions, self._vec_sharding),
            active_mask,
            self._key,
            n_steps=n_steps,
            window=self._window(int(self.positions.max()) + n_steps),
        )
        toks_np = self._local(toks_seq)  # (n_steps, slots)
        for s, req in enumerate(self.active):
            if req is None:
                continue
            for t in range(n_steps):
                tok = int(toks_np[t, s])
                req.generated.append(tok)
                self.positions[s] = min(self.positions[s] + 1, self.max_len - 1)
                if (
                    tok == self.eos_id
                    or len(req.generated) >= req.max_new_tokens
                    or self.positions[s] >= self.max_len - 1
                ):
                    # mid-chunk termination: remaining chunk tokens for this
                    # slot are discarded; the slot's cache is re-prefilled on
                    # the next admit, so the garbage continuation is inert
                    req.done = True
                    self.active[s] = None
                    self.positions[s] = 0
                    if self.paged:
                        self.allocator.free_slot(s)
                    break
            else:
                self.cur_tok[s, 0] = int(toks_np[n_steps - 1, s])

    def run(self) -> List[Request]:
        """Drain the queue; returns all requests completed during this call
        (in submit order) — including any that were already in flight from
        standalone ``step()``/``step_chunk()`` calls."""
        completed: List[Request] = []

        def collect():
            # requests detach from slots when done; _all (maintained by
            # submit) is the durable registry
            for req in list(self._all):
                if req.done:
                    completed.append(req)
                    self._all.remove(req)

        collect()  # requests already finished by standalone step() calls
        while self.queue or any(r is not None for r in self.active):
            self._admit()
            if self.queue and not any(r is not None for r in self.active):
                # nothing running and nothing admitted: the page pool is
                # too small for the queue head — fail loudly, don't spin
                head = self.queue[0]
                raise RuntimeError(
                    f"KV page pool too small for request uid={head.uid} "
                    f"(prompt {len(head.prompt)} + max_new {head.max_new_tokens} "
                    f"tokens); grow kv_pages"
                )
            if any(r is not None for r in self.active):
                if self.decode_chunk > 1:
                    # fixed chunk length: n_steps is a static jit arg, so a
                    # varying tail size would recompile the whole scan graph.
                    # Overshoot past a quota is discarded host-side.
                    self.step_chunk(self.decode_chunk)
                else:
                    self.step()
            collect()
        collect()
        completed.sort(key=lambda r: r.uid)
        return completed
