#!/usr/bin/env python
"""Regenerate `_PAIR_TILE_TABLE`-style kernel tile entries for this chip.

The TPU analogue of the reference's offline CUTLASS kernel calibration
(`kernel_selection.h:10-413` per-GPU tables + the `kernel_eval` export,
`binary_linear_cutlass.cpp:206-210`): sweeps (k_step_rows, block_n) for the
fused dequant kernel on a set of projection shapes, same-process on-device
A/B per CLAUDE.md rule 9 (differential loops via utils/benchmark.time_op;
single-op tunnel readings lie), and prints ready-to-paste
`ops/pallas/dequant_matmul.py` table entries annotated with provenance.

Usage (on the chip):
  python tools/autotune_tiles.py                        # llama3-8B w4 set
  python tools/autotune_tiles.py --shapes 4096x11008x2x32,8192x4096x2x32
  python tools/autotune_tiles.py --layout quad          # A8 tpu_quad table
  python tools/autotune_tiles.py --m 8 --iters 800

New chips (v5p/v6e) or new shapes (e.g. MBWQ segment pairs) run this once
and paste the winners; without an entry the kernel falls back to the
generic heuristic in `_pick_tiles` (measured 200-750 GB/s depending on how
lucky the heuristic gets — BENCH_NOTES rounds 2-4).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

# llama3-8B w4 serving projections + fused variants + llama2-7B MBWQ w2/w4
# segment shapes (the round-3 trace showed o/down segment pairs running at
# 200-300 GB/s for lack of entries)
DEFAULT_SHAPES = [
    (4096, 4096, 4, 128),
    (4096, 14336, 4, 128),
    (14336, 4096, 4, 128),
    (4096, 6144, 4, 128),     # fused qkv
    (4096, 28672, 4, 128),    # fused gate|up
    (1024, 4096, 4, 32),      # 7B MBWQ w4 segment (o/qkv K-side)
    (2816, 4096, 4, 32),      # 7B MBWQ w4 down segment
    (3072, 4096, 2, 32),      # 7B MBWQ w2 segments
    (3072, 12288, 2, 32),
    (3072, 22016, 2, 32),
    (8192, 4096, 2, 32),
]

KS_CANDS = (512, 1024, 1536, 2048, 3072, 3584, 4096, 7168, 8192, 14336)
BN_CANDS = (256, 512, 1024, 1536, 2048, 3072, 4096, 7168)


def sweep(shapes, layout, m, iters, reps):
    from bitorch_engine_tpu.ops import quant
    from bitorch_engine_tpu.ops.pallas.dequant_matmul import (
        mpq_matmul_pallas,
        relayout_tpu,
    )
    from bitorch_engine_tpu.utils.benchmark import time_op
    from bitorch_engine_tpu.utils.profiling import CHIP_SPECS, detect_chip

    chip = detect_chip()
    stamp = time.strftime("%Y-%m-%d")
    # physicality guard: a differential-loop reading implying more than
    # ~1.05x the chip's HBM bandwidth is a collapsed slope (tunnel-jitter
    # artifact; time_op floors at 1e-9 s) — retry once, then discard the
    # candidate rather than adopt a fiction into the table
    peak_gbps = CHIP_SPECS.get(chip, CHIP_SPECS["v5e"])["hbm_gbps"]

    def timed_valid(f, x, qt, wbytes, iters, reps):
        floor = wbytes / (1.05 * peak_gbps * 1e9)
        for _ in range(2):
            t = time_op(f, x, qt, iters=iters, reps=reps)
            if t >= floor:
                return t
        return None

    entries = []
    for (k, n, wb, gs) in shapes:
        w = jax.random.normal(jax.random.PRNGKey(0), (k, n), jnp.float32) * 0.02
        qt = quant.quantize_mpq(w, w_bit=wb, group_size=gs, asym=False)
        qt = relayout_tpu(
            qt, meta_dtype=jnp.bfloat16, act_bits=8 if layout == "quad" else None
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.bfloat16)
        wbytes = k * n * wb / 8 + 2 * (k // gs) * n * 2
        best = (None, None, float("inf"))
        f0 = lambda x, qt: mpq_matmul_pallas(x, qt)
        try:
            np.asarray(f0(x, qt))
            t0 = timed_valid(f0, x, qt, wbytes, iters, reps) or float("inf")
        except Exception as e:
            print(f"# {k}x{n} w{wb} g{gs}: default FAILED {type(e).__name__}", flush=True)
            t0 = float("inf")
        print(
            f"# {k}x{n} w{wb} g{gs} [{qt.layout}]: default "
            f"{t0*1e6:.1f}us ({wbytes/t0/1e9:.0f} GB/s)",
            flush=True,
        )
        for ks in KS_CANDS:
            if ks > k or k % ks:
                continue
            for bn in BN_CANDS:
                if n % bn:
                    continue
                f = lambda x, qt, ks=ks, bn=bn: mpq_matmul_pallas(
                    x, qt, k_step_rows=ks, block_n=bn
                )
                try:
                    np.asarray(f(x, qt))
                    t = timed_valid(f, x, qt, wbytes, iters, reps)
                except Exception:
                    continue
                if t is None:
                    print(f"#   ks{ks:<5d} bn{bn:<5d}: discarded (non-physical reading)", flush=True)
                    continue
                mark = ""
                if t < best[2]:
                    best = (ks, bn, t)
                    mark = "  <-- best"
                print(
                    f"#   ks{ks:<5d} bn{bn:<5d}: {t*1e6:7.1f}us "
                    f"({wbytes/t/1e9:4.0f} GB/s){mark}",
                    flush=True,
                )
        ks, bn, t = best
        if ks is not None and t < t0 * 0.98:  # only keep real wins
            entries.append(
                {
                    "k": k, "n": n, "w_bit": wb, "ks": ks, "bn": bn,
                    "gbs": round(wbytes / t / 1e9),
                    "gbs_default": round(wbytes / t0 / 1e9)
                    if t0 != float("inf") else None,
                    "layout": qt.layout,
                }
            )
        else:
            print(f"# {k}x{n}: default tiles already best — no entry", flush=True)
    return chip, stamp, entries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", help="comma list of KxNxWBITxGS")
    ap.add_argument("--layout", choices=["pair", "quad"], default="pair")
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--write",
        nargs="?",
        const="",
        default=None,
        help="merge winners into the tile-table JSON the kernel loads at "
        "import (default path: ops/pallas/tile_tables.json, or "
        "$BITORCH_TILE_TABLE; pass a path to override)",
    )
    args = ap.parse_args()
    shapes = DEFAULT_SHAPES
    if args.shapes:
        shapes = [
            tuple(int(v) for v in s.split("x")) for s in args.shapes.split(",")
        ]
    chip, stamp, entries = sweep(shapes, args.layout, args.m, args.iters, args.reps)
    print(f"\n# winners ({chip}, {stamp}, m={args.m}):")
    for e in entries:
        print(
            f"#   ({e['k']}, {e['n']}, {e['w_bit']}) [{e['layout']}]: "
            f"({e['ks']}, {e['bn']})  # {e['gbs']} GB/s"
            f" (vs {e['gbs_default']} default)"
        )
    if args.write is not None and entries:
        import json

        from bitorch_engine_tpu.ops.pallas import dequant_matmul as dm

        path = args.write or dm.tile_table_path()
        data = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
        for e in entries:
            tbl = data.setdefault(e["layout"], {})
            tbl[f"{e['k']},{e['n']},{e['w_bit']}"] = [e["ks"], e["bn"]]
        meta = data.setdefault("_meta", {})
        meta[f"{chip}:{stamp}"] = (
            f"autotune_tiles --layout {args.layout} --m {args.m}, "
            f"{len(entries)} entries"
        )
        with open(path, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        print(f"# wrote {len(entries)} entries -> {path}")


if __name__ == "__main__":
    main()
