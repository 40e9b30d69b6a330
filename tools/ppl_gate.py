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
# bit-budget ordering: w4 must beat BOTH low-bit configs strictly; between
# mbwq-2.5 and w2 the deltas at this scale are ~1.3-1.7% and their gap sits
# inside run-to-run training noise (measured: CPU run orders mbwq < w2,
# the on-chip run orders w2 < mbwq, both at < 0.5% gap), so that pair is
# asserted only up to a 1% noise band.  The strict three-way ordering is
# pinned by the CI test at a scale where the margins are large
# (tests/test_ppl_gate.py: +8% / +48% / +65%).
assert (
    0.0 < out["rel_delta_w4g64"] < out["rel_delta_mbwq_2p5"]
), "w4 !< mbwq2.5"
assert out["rel_delta_w4g64"] < out["rel_delta_w2g32"], "w4 !< w2"
assert (
    out["rel_delta_mbwq_2p5"] < out["rel_delta_w2g32"] + 0.01
), "mbwq2.5 exceeds w2 beyond the noise band"
# A8 regime: per-token int8 activations must cost at most a 1% noise band
# over the A16 variant of the same weights (it is the default serving path
# for w2 segments — bench.py BENCH_MBWQ_A8)
assert (
    out["rel_delta_mbwq_2p5_a8"] < out["rel_delta_mbwq_2p5"] + 0.01
), "A8 activations exceed the noise band over A16 (mbwq2.5)"
assert (
    out["rel_delta_w2g32_a8"] < out["rel_delta_w2g32"] + 0.01
), "A8 activations exceed the noise band over A16 (w2g32)"
# the gs-64 serving operating point (bench MBWQ arm): coarser groups cost
# quality — bound it at the w2g32 level + noise so the perf config never
# silently drifts past the uniform-2-bit damage
assert (
    out["rel_delta_mbwq_2p5g64_a8"] < out["rel_delta_w2g32"] + 0.01
), "mbwq-2.5 gs64 exceeds the uniform-w2g32 damage band"
# uniform-w2 serving points (bench w2_decode arm candidates): coarser
# groups cost real quality without MBWQ's w4 protection of the sensitive
# rows — measured g32 +1.72% / g64 +2.6% / g128 +4.3% on this proxy.
# Bands: g64 within w2g32+1.5%, g128 within w2g32+3%; A8 variants within
# the usual 1% noise band of A16.  The bench arm cites its config's
# measured delta (BENCH_NOTES round 5).
assert (
    out["rel_delta_w2g64"] < out["rel_delta_w2g32"] + 0.015
), "uniform w2g64 exceeds the w2g32+1.5% damage band"
assert (
    out["rel_delta_w2g128"] < out["rel_delta_w2g32"] + 0.03
), "uniform w2g128 exceeds the w2g32+3% damage band"
assert (
    out["rel_delta_w2g64_a8"] < out["rel_delta_w2g64"] + 0.01
), "A8 activations exceed the noise band over A16 (w2g64)"
assert (
    out["rel_delta_w2g128_a8"] < out["rel_delta_w2g128"] + 0.01
), "A8 activations exceed the noise band over A16 (w2g128)"
print("PPL GATE PASSED: w4 delta "
      f"{100*out['rel_delta_w4g64']:.2f}% < 5%; w4 < mbwq2.5 ~ w2; "
      f"A8 delta +{100*(out['rel_delta_mbwq_2p5_a8']-out['rel_delta_mbwq_2p5']):.2f}% vs A16")
