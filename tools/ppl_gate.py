#!/usr/bin/env python
"""Run the full perplexity gate (fp vs w4/w2/MBWQ-2.5bit on the trained
byte LM); prints JSON and asserts the BASELINE bounds.

Full-size config (hidden 512, 4 layers, 800 steps — picked by the round-3
scale sweep: big enough that the fp model is stable and the quantization
deltas rise above training noise):
  rel_delta_w4g64   < 0.05   (the "no significant loss" production bar)
  ordering           w4 < mbwq(2.5) < w2  (damage orders by bit budget)

CPU ~16 min; pass --chip to run on the default backend (TPU under axon).
Recorded runs live in BENCH_NOTES.md.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

p = argparse.ArgumentParser()
p.add_argument("--chip", action="store_true", help="run on the default (TPU) backend")
p.add_argument("--hidden", type=int, default=512)
p.add_argument("--layers", type=int, default=4)
p.add_argument("--steps", type=int, default=800)
args = p.parse_args()

if not args.chip:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bitorch_engine_tpu.models.eval import run_ppl_gate

out = run_ppl_gate(hidden=args.hidden, layers=args.layers, steps=args.steps)
print(json.dumps(out, indent=1))
assert out["rel_delta_w4g64"] < 0.05, f"w4 gate FAILED: {out['rel_delta_w4g64']}"
assert (
    0.0
    < out["rel_delta_w4g64"]
    < out["rel_delta_mbwq_2p5"]
    < out["rel_delta_w2g32"]
), "bit-budget ordering FAILED"
print("PPL GATE PASSED: w4 delta "
      f"{100*out['rel_delta_w4g64']:.2f}% < 5%, ordering w4 < mbwq2.5 < w2")
