"""Quantize an LLM checkpoint and generate text — the green-bit-llm-style flow.

Pipeline (mirrors the reference's external green-bit-llm usage,
README.md:18-19, but self-contained):

1. load a safetensors checkpoint (HF Llama layout, or GPTQ via --gptq)
2. build the quantized params tree (MPQ w4g128 by default, or a mixed-bit
   strategy JSON for the GreenBit 2-bit path)
3. run batched greedy generation with the KV-cache decode loop

With no checkpoint available it builds a tiny random model end-to-end so the
example is always runnable:

    python examples/llm/quantize_and_generate.py --demo
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", help="safetensors file (HF Llama keys)")
    p.add_argument("--gptq", action="store_true", help="checkpoint is GPTQ-format")
    p.add_argument("--strategy", default="4-128-256")
    p.add_argument("--mbwq", help='mixed-bit JSON, e.g. \'{"bits":[4,2],"bits_prop":[0.75,0.25],"group_size":{"4":64,"2":64}}\'')
    p.add_argument("--prompt-ids", default="1,2,3,4", help="comma-separated token ids")
    p.add_argument("--max-new-tokens", type=int, default=16)
    p.add_argument("--demo", action="store_true", help="tiny random model demo")
    p.add_argument("--cpu", action="store_true")
    p.add_argument(
        "--config", default="tiny", choices=("tiny", "llama2-7b", "llama3-8b"),
        help="model architecture the checkpoint matches",
    )
    p.add_argument("--head-bits", type=int, default=0,
                   help="untie lm_head at this bit width (0 = tied)")
    p.add_argument("--int8-embed", action="store_true",
                   help="int8 per-row embedding (+tied head)")
    p.add_argument("--int8-kv", action="store_true", help="int8 KV cache")
    args = p.parse_args()

    import jax

    if args.cpu or args.demo:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bitorch_engine_tpu.models.generate import generate
    from bitorch_engine_tpu.models.llama import LlamaModel, tiny_llama, llama3_8b

    if args.demo:
        cfg = tiny_llama(dtype=jnp.float32)
        if args.mbwq:
            strat = json.loads(args.mbwq)
            cfg = tiny_llama(
                dtype=jnp.float32,
                mbwq_strategy=tuple(zip(strat["bits"], strat["bits_prop"])),
                group_size=min(int(v) for v in strat["group_size"].values()),
            )
        model = LlamaModel(cfg)
        prompt = jnp.asarray([[int(t) for t in args.prompt_ids.split(",")]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), prompt)
        out = generate(model, params, prompt, max_new_tokens=args.max_new_tokens)
        print("generated ids:", out[0].tolist())
        return

    # real-checkpoint path: HF-layout safetensors → quantized params → generate
    if not args.checkpoint:
        raise SystemExit("need --checkpoint FILE or --demo")
    from bitorch_engine_tpu.models.llama import llama2_7b
    from bitorch_engine_tpu.models.llama_loader import load_llama_from_safetensors
    from bitorch_engine_tpu.utils.convert import get_mpq_config
    from bitorch_engine_tpu.utils import relayout_params_for_tpu

    mpq = get_mpq_config(args.strategy)
    mk = {"tiny": tiny_llama, "llama2-7b": llama2_7b, "llama3-8b": llama3_8b}[
        args.config
    ]
    cfg = mk(
        w_bit=mpq["w_bit"],
        group_size=mpq["group_size"],
        quantize_embed=args.int8_embed,
        head_w_bit=args.head_bits or None,
        kv_cache_dtype="int8" if args.int8_kv else "bf16",
        dtype=jnp.float32 if args.cpu else jnp.bfloat16,
    )
    model = LlamaModel(cfg)
    params = load_llama_from_safetensors(args.checkpoint, cfg, cfg.dtype)
    params = relayout_params_for_tpu(params)  # kernel-ready layouts, once
    prompt = jnp.asarray([[int(t) for t in args.prompt_ids.split(",")]], jnp.int32)
    out = generate(model, params, prompt, max_new_tokens=args.max_new_tokens)
    print("generated ids:", out[0].tolist())


if __name__ == "__main__":
    main()
