"""Profiling / tracing / roofline reporting.

The reference has no built-in profiling (SURVEY.md §5 — ad-hoc
``torch.cuda.Event`` timing inside tests only).  Here tracing is a
first-class subsystem:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard/Perfetto trace directory;
* :func:`annotate` — named ``TraceAnnotation`` scopes for host-side phases;
* :class:`RooflineReport` — per-op achieved-vs-peak bandwidth/FLOPs
  accounting used by ``bench.py`` and kernel tests.

Chip peak numbers are tabulated for the TPU generations the engine targets;
override via ``CHIP_SPECS``.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
from typing import Dict, Iterator, List, Optional

import jax

# (HBM GB/s, bf16 TFLOPs, int8 TOPs) per chip generation
CHIP_SPECS: Dict[str, Dict[str, float]] = {
    "v4": {"hbm_gbps": 1228.0, "bf16_tflops": 275.0, "int8_tops": 275.0},
    "v5e": {"hbm_gbps": 819.0, "bf16_tflops": 197.0, "int8_tops": 394.0},
    "v5p": {"hbm_gbps": 2765.0, "bf16_tflops": 459.0, "int8_tops": 918.0},
    "v6e": {"hbm_gbps": 1640.0, "bf16_tflops": 918.0, "int8_tops": 1836.0},
    "cpu": {"hbm_gbps": 50.0, "bf16_tflops": 1.0, "int8_tops": 2.0},
}


def detect_chip() -> str:
    """Best-effort chip generation from the local device kind."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return "cpu"
    for gen in ("v6e", "v5p", "v5e", "v4"):
        if gen in kind:
            return gen
    if "v5 lite" in kind or "v5lite" in kind:
        return "v5e"
    if "tpu" in kind:
        return "v5e"
    return "cpu"


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace scope (host-side phase annotation)."""
    return jax.profiler.TraceAnnotation(name)


@dataclasses.dataclass
class OpRecord:
    name: str
    seconds: float
    bytes_accessed: int = 0
    flops: int = 0

    def bandwidth_gbps(self) -> float:
        return self.bytes_accessed / self.seconds / 1e9 if self.seconds else 0.0

    def tflops(self) -> float:
        return self.flops / self.seconds / 1e12 if self.seconds else 0.0


@dataclasses.dataclass
class RooflineReport:
    """Accumulates measured ops and reports % of chip roofline."""

    chip: str = dataclasses.field(default_factory=detect_chip)
    records: List[OpRecord] = dataclasses.field(default_factory=list)

    def add(self, name: str, seconds: float, bytes_accessed: int = 0, flops: int = 0):
        self.records.append(OpRecord(name, seconds, bytes_accessed, flops))

    def summary(self) -> List[Dict]:
        spec = CHIP_SPECS.get(self.chip, CHIP_SPECS["cpu"])
        out = []
        for r in self.records:
            mem_roof = r.bytes_accessed / (spec["hbm_gbps"] * 1e9)
            flop_roof = r.flops / (spec["bf16_tflops"] * 1e12)
            bound = "memory" if mem_roof >= flop_roof else "compute"
            roof = max(mem_roof, flop_roof)
            out.append(
                {
                    "name": r.name,
                    "us": round(r.seconds * 1e6, 1),
                    "achieved_gbps": round(r.bandwidth_gbps(), 1),
                    "achieved_tflops": round(r.tflops(), 2),
                    "bound": bound,
                    "pct_of_roofline": round(100 * roof / r.seconds, 1)
                    if r.seconds
                    else 0.0,
                }
            )
        return out

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps({"chip": self.chip, "ops": self.summary()}, indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s


def device_op_table(logdir: str, top: int = 20) -> List[Dict]:
    """Aggregate a :func:`trace` directory into a per-op-category device
    time table (the analysis loop behind every BENCH_NOTES device trace).

    Parses the Perfetto ``*.trace.json.gz`` files, keeps only events on TPU
    device tracks (host rows would double-count), strips trailing
    ``.<digits>`` so HLO instances group by op category, and keys by
    ``category -> output type/shape`` from the HLO long name.  Returns rows
    ``{key, us, count, example}`` sorted by total device time.
    """
    import collections
    import glob
    import gzip
    import re

    files = glob.glob(logdir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        raise FileNotFoundError(f"no trace files under {logdir}")
    dev_pids = set()
    all_events = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        evs = data.get("traceEvents", [])
        for ev in evs:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                if "TPU" in (ev.get("args") or {}).get("name", ""):
                    dev_pids.add(ev["pid"])
        all_events.append(evs)
    by = collections.Counter()
    cnt = collections.Counter()
    example: Dict[str, str] = {}
    for evs in all_events:
        for ev in evs:
            if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
                continue
            name = ev.get("name", "")
            if name.startswith("jit_"):  # umbrella module event
                continue
            long_name = (ev.get("args") or {}).get("long_name", "")
            cat = re.sub(r"[.\d]+$", "", name)
            m = re.match(r"%\S+ = (\S+?)\{", long_name)
            key = cat + (" -> " + m.group(1) if m else "")
            by[key] += ev.get("dur", 0)
            cnt[key] += 1
            example.setdefault(key, long_name[:160])
    return [
        {"key": k, "us": us, "count": cnt[k], "example": example[k]}
        for k, us in by.most_common(top)
    ]
