"""CLI round-trip: quantize a safetensors file, ingest it back, verify numerics."""

import numpy as np
import jax.numpy as jnp
from safetensors.numpy import load_file, save_file

from bitorch_engine_tpu.ops import quant
from bitorch_engine_tpu.tools.cli import main
from bitorch_engine_tpu.utils import ingest


def test_quantize_inspect_roundtrip(tmp_path, capsys):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 128)).astype(np.float32) * 0.05
    src = str(tmp_path / "in.safetensors")
    dst = str(tmp_path / "out.safetensors")
    save_file({"blk.w.weight": w, "blk.norm.weight": np.ones(128, np.float32)}, src)

    assert main(["quantize", "--input", src, "--output", dst]) == 0
    out = load_file(dst)
    assert set(out) == {"blk.w.qweight", "blk.w.scales", "blk.w.zeros", "blk.norm.weight"}

    qt = ingest.mpq_from_gba(
        out["blk.w.qweight"],
        {"scales": out["blk.w.scales"], "zeros": out["blk.w.zeros"]},
        w_bit=4,
        group_size=128,
    )
    w_hat = np.asarray(quant.dequantize_mpq(qt, jnp.float32))
    rel = np.linalg.norm(w_hat - w) / np.linalg.norm(w)
    assert rel < 0.15, rel

    assert main(["inspect", "--input", dst]) == 0
    captured = capsys.readouterr().out
    assert "blk.w.qweight" in captured
