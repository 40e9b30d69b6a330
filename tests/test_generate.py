"""Generation + continuous batching tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.models.generate import ContinuousBatcher, generate
from bitorch_engine_tpu.models.llama import LlamaModel, tiny_llama


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_llama(dtype=jnp.float32)
    model = LlamaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return cfg, model, params


def test_generate_greedy_deterministic(tiny):
    cfg, model, params = tiny
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 0, cfg.vocab_size)
    out1 = generate(model, params, prompt, max_new_tokens=6)
    out2 = generate(model, params, prompt, max_new_tokens=6)
    assert out1.shape == (2, 11)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(out1[:, :5]), np.asarray(prompt))


def test_generate_temperature_runs(tiny):
    cfg, model, params = tiny
    prompt = jnp.asarray([[1, 2, 3]])
    out = generate(model, params, prompt, max_new_tokens=4, temperature=1.0)
    assert out.shape == (1, 7)


def test_continuous_batcher_matches_sequential(tiny):
    """Batched slot decoding must produce the same greedy tokens as the
    one-at-a-time generate() for each request."""
    cfg, model, params = tiny
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, cfg.vocab_size, size=l).tolist() for l in (4, 6, 3, 5, 4)]
    n_new = 5

    # sequential reference
    refs = []
    for p in prompts:
        out = generate(model, params, jnp.asarray([p], jnp.int32), max_new_tokens=n_new)
        refs.append(np.asarray(out[0, len(p):]).tolist())

    batcher = ContinuousBatcher(model, params, num_slots=2, max_len=32)
    for p in prompts:
        batcher.submit(p, max_new_tokens=n_new)
    done = batcher.run()
    assert len(done) == len(prompts)
    for req, ref in zip(done, refs):
        assert req.generated == ref, (req.uid, req.generated, ref)


def test_continuous_batcher_eos_termination(tiny):
    cfg, model, params = tiny
    # find a token the model emits greedily, then use it as EOS
    out = generate(model, params, jnp.asarray([[1, 2, 3]], jnp.int32), max_new_tokens=3)
    eos = int(out[0, 3])  # first generated token
    batcher = ContinuousBatcher(model, params, num_slots=2, max_len=32, eos_id=eos)
    batcher.submit([1, 2, 3], max_new_tokens=10)
    done = batcher.run()
    assert len(done) == 1
    # terminated at the first EOS, not the token budget
    assert done[0].generated[-1] == eos
    assert len(done[0].generated) < 10


def test_continuous_batcher_int8_kv_and_w4_head():
    """Batcher must work with the serving config's int8 KV caches (4-tuple
    per-layer caches) and the untied w4 head — regression: _prefill_slot once
    assumed bf16 (k, v) pairs."""
    from bitorch_engine_tpu.models.llama import LlamaModel, tiny_llama

    cfg = tiny_llama(
        dtype=jnp.float32, kv_cache_dtype="int8", quantize_embed=True, head_w_bit=4
    )
    model = LlamaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, size=l).tolist() for l in (4, 6, 3)]
    n_new = 4

    refs = []
    for p in prompts:
        out = generate(model, params, jnp.asarray([p], jnp.int32), max_new_tokens=n_new)
        refs.append(np.asarray(out[0, len(p):]).tolist())

    batcher = ContinuousBatcher(model, params, num_slots=2, max_len=32)
    for p in prompts:
        batcher.submit(p, max_new_tokens=n_new)
    done = batcher.run()
    assert len(done) == len(prompts)
    for req, ref in zip(done, refs):
        assert req.generated == ref, (req.uid, req.generated, ref)


def test_continuous_batcher_chunked_matches_unchunked(tiny):
    """decode_chunk>1 must produce identical greedy tokens (scan vs step)."""
    cfg, model, params = tiny
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, cfg.vocab_size, size=l).tolist() for l in (4, 6, 3, 5)]
    n_new = 7  # not a multiple of the chunk → exercises quota overshoot

    ref = ContinuousBatcher(model, params, num_slots=2, max_len=32)
    for p in prompts:
        ref.submit(p, max_new_tokens=n_new)
    ref_done = {r.uid: r.generated for r in ref.run()}

    chk = ContinuousBatcher(model, params, num_slots=2, max_len=32, decode_chunk=4)
    for p in prompts:
        chk.submit(p, max_new_tokens=n_new)
    chk_done = {r.uid: r.generated for r in chk.run()}

    assert ref_done == chk_done


def test_continuous_batcher_chunked_eos_and_int8(tiny):
    """Mid-chunk EOS terminates the request at the right token with int8 KV."""
    from bitorch_engine_tpu.models.llama import LlamaModel, tiny_llama

    cfg = tiny_llama(dtype=jnp.float32, kv_cache_dtype="int8", quantize_embed=True)
    model = LlamaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    rng = np.random.default_rng(6)
    prompts = [rng.integers(0, cfg.vocab_size, size=l).tolist() for l in (4, 5, 3)]

    ref = ContinuousBatcher(model, params, num_slots=2, max_len=32)
    for p in prompts:
        ref.submit(p, max_new_tokens=6)
    eos = ref.run()[0].generated[2]  # pick a token the first request emits

    a = ContinuousBatcher(model, params, num_slots=2, max_len=32, eos_id=eos)
    b = ContinuousBatcher(
        model, params, num_slots=2, max_len=32, eos_id=eos, decode_chunk=4
    )
    for p in prompts:
        a.submit(p, max_new_tokens=6)
        b.submit(p, max_new_tokens=6)
    ra = {r.uid: r.generated for r in a.run()}
    rb = {r.uid: r.generated for r in b.run()}
    assert ra == rb


def test_continuous_batcher_bucketed_prefill_compile_count(tiny):
    """Prompt lengths 3..6 share the 8-bucket: one prefill compile, and
    outputs identical to per-length prefill (pads are inert)."""
    cfg, model, params = tiny
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, cfg.vocab_size, size=l).tolist() for l in (3, 4, 5, 6)]

    refs = []
    for p in prompts:
        out = generate(model, params, jnp.asarray([p], jnp.int32), max_new_tokens=4)
        refs.append(np.asarray(out[0, len(p):]).tolist())

    b = ContinuousBatcher(model, params, num_slots=2, max_len=32)
    for p in prompts:
        b.submit(p, max_new_tokens=4)
    done = b.run()
    for req, ref in zip(done, refs):
        assert req.generated == ref, (req.uid, req.generated, ref)
    # all four lengths land in the same 8-bucket; admitted as one batched
    # prefill shape per (n, bucket) pair
    n_compiles = b._prefill_slots._cache_size()
    assert n_compiles <= 2, n_compiles


def test_continuous_batcher_prompt_too_long(tiny):
    cfg, model, params = tiny
    b = ContinuousBatcher(model, params, num_slots=1, max_len=8)
    b.submit(list(range(1, 10)), max_new_tokens=2)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_len"):
        b.run()


def test_continuous_batcher_step_then_run_collects_in_flight(tiny):
    """Requests driven to completion by standalone _admit/step calls must
    still be returned by a later run() — regression: the request registry
    used to be created only inside run()."""
    cfg, model, params = tiny
    rng = np.random.default_rng(8)
    p1 = rng.integers(0, cfg.vocab_size, size=4).tolist()
    p2 = rng.integers(0, cfg.vocab_size, size=5).tolist()

    ref = ContinuousBatcher(model, params, num_slots=2, max_len=32)
    ref.submit(p1, max_new_tokens=3)
    ref.submit(p2, max_new_tokens=3)
    expect = {r.uid: r.generated for r in ref.run()}

    b = ContinuousBatcher(model, params, num_slots=2, max_len=32)
    b.submit(p1, max_new_tokens=3)
    b._admit()
    b.step()  # partially decode by hand...
    b.submit(p2, max_new_tokens=3)  # ...submit mid-flight...
    done = b.run()  # ...then drain
    assert {r.uid: r.generated for r in done} == expect
    # a second run() must not re-return already-collected requests
    assert b.run() == []


def test_continuous_batcher_mixed_bucket_admission(tiny):
    """A long head prompt must not split the short prompts behind it into
    separate prefill dispatches; outputs stay equal to sequential decode."""
    cfg, model, params = tiny
    rng = np.random.default_rng(9)
    # head lands in the 16-bucket, the three behind it in the 8-bucket
    lens = (12, 3, 4, 5)
    prompts = [rng.integers(0, cfg.vocab_size, size=l).tolist() for l in lens]

    refs = []
    for p in prompts:
        out = generate(model, params, jnp.asarray([p], jnp.int32), max_new_tokens=4)
        refs.append(np.asarray(out[0, len(p):]).tolist())

    b = ContinuousBatcher(model, params, num_slots=4, max_len=32)
    calls = {"n": 0}
    inner = b._prefill_slots

    def counting(*a, **k):
        calls["n"] += 1
        return inner(*a, **k)

    b._prefill_slots = counting
    for p in prompts:
        b.submit(p, max_new_tokens=4)
    done = b.run()
    for req, ref in zip(done, refs):
        assert req.generated == ref, (req.uid, req.generated, ref)
    # one dispatch for the 16-bucket head + one for the three 8-bucket
    # prompts pulled together from behind it
    assert calls["n"] == 2, calls["n"]


@pytest.mark.parametrize("paged", [False, True])
def test_chunked_prefill_matches_whole(tiny, paged):
    """prefill_chunk=8: long prompts prefilled in sequential 8-token chunks
    produce the same greedy outputs as whole-bucket prefill (regimes differ
    only in f32 reduction-order ulps)."""
    cfg, model, params = tiny
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, cfg.vocab_size, n).tolist() for n in (21, 5, 17, 12)]
    kw = dict(num_slots=2, max_len=64)
    if paged:
        kw.update(kv_pages=1 + 2 * 8, kv_page_size=8)

    ref = ContinuousBatcher(model, params, **kw)
    chk = ContinuousBatcher(model, params, prefill_chunk=8, **kw)
    for b in (ref, chk):
        for p in prompts:
            b.submit(p, max_new_tokens=6)
    out_ref = {r.uid: r.generated for r in ref.run()}
    out_chk = {r.uid: r.generated for r in chk.run()}
    assert out_ref == out_chk
