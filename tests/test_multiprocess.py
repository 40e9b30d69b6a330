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


@pytest.mark.slow
def test_two_process_world_matches_single_process():
    """2 processes × 4 local devices: cross-process dp collectives execute;
    results identical across processes and vs the single-process mesh."""
    results = launch_workers(n_processes=2, n_local_devices=4, timeout=600)
    assert len(results) == 2
    ref = _single_process_reference()
    for key in ("mpq_y", "train_losses", "llama_logits"):
        np.testing.assert_array_equal(
            results[0][key], results[1][key],
            err_msg=f"{key} differs between processes",
        )
        np.testing.assert_allclose(
            results[0][key], ref[key], rtol=1e-6, atol=1e-6,
            err_msg=f"{key} differs from single-process reference",
        )
