"""Command-line tools: quantize / inspect safetensors checkpoints.

Usage:
    python -m bitorch_engine_tpu.tools.cli quantize \
        --input model.safetensors --output q.safetensors \
        --strategy 4-128-256 [--asym]
    python -m bitorch_engine_tpu.tools.cli inspect --input q.safetensors

The reference has no CLI (examples only); this wraps the engine's
quantizer/ingestion for checkpoint preparation on a host machine.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _cpu_jax():
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def cmd_quantize(args) -> int:
    jax = _cpu_jax()
    import jax.numpy as jnp
    from safetensors.numpy import load_file, save_file

    from ..ops.quant import quantize_mpq
    from ..utils.convert import get_mpq_config

    cfg = get_mpq_config(args.strategy)
    tensors = load_file(args.input)
    out = {}
    n_quant = 0
    for name, arr in tensors.items():
        is_weight = (
            arr.ndim == 2
            and name.endswith(args.weight_suffix)
            and arr.shape[0] % cfg["group_size"] == 0
        )
        if not is_weight:
            out[name] = arr
            continue
        qt = quantize_mpq(
            jnp.asarray(arr.astype(np.float32)),
            w_bit=cfg["w_bit"],
            group_size=cfg["group_size"],
            asym=args.asym,
        )
        base = name[: -len(args.weight_suffix)] + "."
        out[base + "qweight"] = np.asarray(qt.packed)
        out[base + "scales"] = np.asarray(qt.scales)
        out[base + ("qzeros" if args.asym else "zeros")] = np.asarray(qt.zeros)
        n_quant += 1
    save_file(out, args.output)
    print(f"quantized {n_quant} weights -> {args.output} ({args.strategy})")
    return 0


def cmd_inspect(args) -> int:
    from safetensors.numpy import load_file

    tensors = load_file(args.input)
    total = 0
    for name, arr in sorted(tensors.items()):
        total += arr.nbytes
        print(f"{name:60s} {str(arr.dtype):8s} {arr.shape}")
    print(f"total: {total/1e6:.1f} MB, {len(tensors)} tensors")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="bitorch_engine_tpu.tools.cli")
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("quantize", help="RTN-quantize fp weights in a safetensors file")
    q.add_argument("--input", required=True)
    q.add_argument("--output", required=True)
    q.add_argument("--strategy", default="4-128-256")
    q.add_argument("--asym", action="store_true")
    q.add_argument("--weight-suffix", default=".weight")
    q.set_defaults(fn=cmd_quantize)

    i = sub.add_parser("inspect", help="list tensors in a safetensors file")
    i.add_argument("--input", required=True)
    i.set_defaults(fn=cmd_inspect)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
