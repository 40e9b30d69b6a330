#!/usr/bin/env python
"""Run the full perplexity gate (fp vs w4/w2/MBWQ-2.5bit on the trained
byte LM); prints JSON.  CPU, ~4 min.  Results recorded in BENCH_NOTES.md."""
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
from bitorch_engine_tpu.models.eval import run_ppl_gate

if __name__ == "__main__":
    print(json.dumps(run_ppl_gate(steps=600), indent=1))
