"""True multi-process distributed execution.

Everything else "multichip" in this suite runs in ONE process over 8 virtual
devices; these tests spawn REAL separate processes coordinated through
``jax.distributed.initialize`` (localhost gRPC) so GSPMD's collectives
actually cross process boundaries — the closest achievable proxy in this
sandbox for the BASELINE multi-host target (greenfield; the reference has no
distributed runtime at all, SURVEY.md §2.3).

Assertions: every process of the 2-process world produces results
bit-identical to each other AND to a single-process run of the same payload
over the same logical 8-device (dp=2, tp=4) mesh.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from bitorch_engine_tpu.parallel.multiprocess import (
    launch_workers,
    multiprocess_payload,
)


def _single_process_reference():
    devs = np.asarray(jax.devices()[:8])
    mesh = Mesh(devs.reshape(2, 4), axis_names=("dp", "tp"))
    return multiprocess_payload(mesh)


def test_payload_self_consistent_single_process():
    """The payload's internal reference checks hold in-process (fast guard
    so multi-process failures isolate the coordination layer)."""
    out = _single_process_reference()
    np.testing.assert_array_equal(out["mpq_y"], out["mpq_ref"].astype(out["mpq_y"].dtype))
    assert np.isfinite(out["train_losses"]).all()
    assert out["train_losses"][-1] < out["train_losses"][0]
    assert np.isfinite(out["llama_logits"]).all()
    assert out["serving_ids"].shape == (6, 5)


def test_payload_serving_matches_unsharded_batcher():
    """The payload's dp×tp paged ContinuousBatcher run must be
    token-identical to a plain single-device batcher on the same model."""
    import jax.numpy as jnp

    from bitorch_engine_tpu.models.generate import ContinuousBatcher
    from bitorch_engine_tpu.models.llama import LlamaModel, tiny_llama

    out = _single_process_reference()
    # burn the payload's earlier rng draws so the prompts regenerate exactly
    rng = np.random.default_rng(0)
    rng.standard_normal((256, 128)).astype(np.float32)
    rng.standard_normal((8, 256)).astype(np.float32)
    rng.standard_normal((64, 32)).astype(np.float32)
    cfg = tiny_llama(dtype=jnp.float32)
    rng.integers(0, cfg.vocab_size, (2, 8))
    cfg_s = tiny_llama(dtype=jnp.float32, kv_cache_dtype="int8")
    prompts = [
        rng.integers(0, cfg_s.vocab_size, size=l).tolist()
        for l in (4, 6, 3, 5, 7, 4)
    ]
    model_s = LlamaModel(cfg_s)
    sp = model_s.init(jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32))
    b = ContinuousBatcher(model_s, sp, num_slots=4, max_len=32)
    for p in prompts:
        b.submit(p, max_new_tokens=5)
    ids = {r.uid: r.generated for r in b.run()}
    ref = np.asarray([ids[uid] for uid in sorted(ids)], np.int32)
    np.testing.assert_array_equal(out["serving_ids"], ref)


@pytest.mark.slow
def test_two_process_world_matches_single_process():
    """2 processes × 4 local devices: cross-process dp collectives execute;
    results identical across processes and vs the single-process mesh."""
    results = launch_workers(n_processes=2, n_local_devices=4, timeout=600)
    assert len(results) == 2
    ref = _single_process_reference()
    for key in ("mpq_y", "train_losses", "llama_logits", "serving_ids"):
        np.testing.assert_array_equal(
            results[0][key], results[1][key],
            err_msg=f"{key} differs between processes",
        )
        np.testing.assert_allclose(
            results[0][key], ref[key], rtol=1e-6, atol=1e-6,
            err_msg=f"{key} differs from single-process reference",
        )
