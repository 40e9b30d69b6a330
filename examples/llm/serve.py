"""Continuous-batching serving demo: the engine's full serving stack.

Drives :class:`~bitorch_engine_tpu.models.generate.ContinuousBatcher` with
every serving feature on a self-contained random-weight model: 4-bit fused
projections, int8 KV, paged KV pool, chunked multi-step decode, bucketed
attention windows, chunked prefill, and (optionally) a dp×tp mesh.

    python examples/llm/serve.py --demo                 # tiny model, CPU
    python examples/llm/serve.py --demo --mesh 2,2      # sharded, 4 virtual devices
    python examples/llm/serve.py --model llama3_8b      # real scale, TPU

The reference has no serving system at all (SURVEY.md §0); this is the
north-star capability ("continuous batching across hosts") end to end.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--demo", action="store_true", help="tiny model on local CPU")
    p.add_argument("--model", default="tiny_llama",
                   choices=["tiny_llama", "llama3_8b", "llama2_7b", "mistral_7b"])
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--max-len", type=int, default=256)
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--prompt-len", type=int, default=48)
    p.add_argument("--new-tokens", type=int, default=32)
    p.add_argument("--decode-chunk", type=int, default=16)
    p.add_argument("--prefill-chunk", type=int, default=None)
    p.add_argument("--page-size", type=int, default=None,
                   help="enable the paged KV pool with this page size")
    p.add_argument("--mesh", help="dp,tp — shards serving over virtual devices")
    args = p.parse_args()

    if args.mesh:
        dp, tp = (int(v) for v in args.mesh.split(","))
        os.environ.setdefault(
            "XLA_FLAGS", f"--xla_force_host_platform_device_count={dp * tp}"
        )
    import jax

    if args.demo or args.mesh:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bitorch_engine_tpu.models import generate as gen
    from bitorch_engine_tpu.models import llama as llama_mod
    from bitorch_engine_tpu.utils.convert import relayout_params_for_tpu

    on_tpu = jax.default_backend() == "tpu"
    cfg_fn = getattr(llama_mod, args.model)
    cfg = cfg_fn(
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        max_seq_len=args.max_len,
        kv_cache_dtype="int8",
        quantize_embed=on_tpu,
        head_w_bit=4 if on_tpu else None,
        fuse_qkv=on_tpu,
        fuse_gate_up=on_tpu,
    )
    model = llama_mod.LlamaModel(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
    )
    if on_tpu:
        params = relayout_params_for_tpu(params, meta_dtype=jnp.bfloat16)

    kw = dict(
        num_slots=args.slots,
        max_len=args.max_len,
        eos_id=-1,
        decode_chunk=args.decode_chunk,
        prefill_chunk=args.prefill_chunk,
    )
    if args.page_size:
        kw.update(
            kv_pages=1 + args.slots * (args.max_len // args.page_size),
            kv_page_size=args.page_size,
        )
    mesh = None
    if args.mesh:
        from bitorch_engine_tpu.models.llama_sharding import shard_llama_params
        from bitorch_engine_tpu.parallel.mesh import make_mesh

        dp, tp = (int(v) for v in args.mesh.split(","))
        mesh = make_mesh(dp=dp, tp=tp)
        params = shard_llama_params(params, mesh)
        kw["mesh"] = mesh

    b = gen.ContinuousBatcher(model, params, **kw)
    rng = np.random.default_rng(0)
    for _ in range(args.requests):
        plen = int(rng.integers(4, args.prompt_len + 1))
        b.submit(rng.integers(1, cfg.vocab_size, plen).tolist(),
                 max_new_tokens=args.new_tokens)
    t0 = time.time()
    done = b.run()
    dt = time.time() - t0
    gen_toks = sum(len(r.generated) for r in done)
    print(f"served {len(done)} requests in {dt:.2f}s "
          f"({gen_toks} generated tokens, {gen_toks/dt:.1f} tok/s incl. compile)")
    print("first request output ids:", done[0].generated[:16])


if __name__ == "__main__":
    main()
