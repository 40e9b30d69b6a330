"""Roofline report + trace wrapper smoke tests."""

import json

import jax
import jax.numpy as jnp

from bitorch_engine_tpu.utils.profiling import (
    CHIP_SPECS,
    RooflineReport,
    annotate,
    detect_chip,
)


def test_roofline_accounting():
    r = RooflineReport(chip="v5e")
    # 33.5 MB in 47.4 us → ~707 GB/s, memory-bound, ~86% of 819 peak
    r.add("bf16_gemv", 47.4e-6, bytes_accessed=4096 * 4096 * 2, flops=2 * 8 * 4096 * 4096)
    s = r.summary()[0]
    assert s["bound"] == "memory"
    assert 600 < s["achieved_gbps"] < 800
    assert 80 < s["pct_of_roofline"] < 95
    out = json.loads(r.dump())
    assert out["chip"] == "v5e"


def test_compute_bound_case():
    r = RooflineReport(chip="v5e")
    # big matmul: flops dominate
    r.add("mm", 150e-6, bytes_accessed=50e6, flops=17.2e9)
    s = r.summary()[0]
    assert s["bound"] == "compute"


def test_detect_chip_and_annotate():
    chip = detect_chip()
    assert chip in CHIP_SPECS
    with annotate("test_phase"):
        jnp.sum(jnp.ones(8)).block_until_ready()
