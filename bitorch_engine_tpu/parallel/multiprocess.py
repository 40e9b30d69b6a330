"""True multi-process distributed execution (local gRPC coordination).

The reference has no distributed runtime at all (SURVEY.md §2.3) and this
sandbox has one TPU chip, so cross-host DCN scaling can't be measured — but
cross-PROCESS execution can: ``jax.distributed.initialize`` coordinates
N local CPU processes (each contributing ``--xla_force_host_platform_device_
count`` virtual devices) through a localhost gRPC service, and GSPMD inserts
REAL cross-process collectives for dp/tp shardings that span processes.
This is the closest achievable proxy for the BASELINE multi-host target and
the execution path a real 2-host deployment takes (swap the coordinator
address and the device platform).

Pieces:

* :func:`global_put` — multiprocess-safe sharding of host-replicated pytrees
  (``jax.make_array_from_callback``; plain ``device_put`` can't target
  non-addressable devices).
* :func:`multiprocess_payload` — a deterministic battery (tp-sharded fused
  MPQ linear, dp-data-parallel DiodeMix training with cross-process psum
  grads, tp-sharded tiny-llama forward) whose outputs are bit-comparable
  across worlds: every process of an N-process run AND a single-process run
  over the same 8-device mesh must produce identical results.
* :func:`run_worker` / ``python -m bitorch_engine_tpu.parallel.multiprocess``
  — one process of the distributed world.
* :func:`launch_workers` — spawn + collect a local N-process world.

Used by ``tests/test_multiprocess.py`` and ``__graft_entry__.dryrun_multichip``
(GRAFT_MULTIPROCESS=0 opts out).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import tempfile
from typing import Dict, Optional

import numpy as np

__all__ = [
    "global_put",
    "multiprocess_payload",
    "run_worker",
    "launch_workers",
    "free_port",
]


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def global_put(tree, mesh, specs=None):
    """Shard a host-replicated pytree onto a (possibly multi-process) mesh.

    Every process must hold the same host values (deterministic
    construction); each contributes only its addressable shards
    (``make_array_from_callback`` — plain ``device_put`` can't target
    non-addressable devices).  ``specs``: a matching pytree of
    PartitionSpecs (e.g. from ``parallel.sharding.partition_specs``, whose
    QTensor positions hold QTensor-shaped spec subtrees), a single spec for
    every array leaf, or None = fully replicated.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    if specs is None:
        specs = PartitionSpec()

    def put(a, spec):
        a = np.asarray(a)
        s = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(a.shape, s, lambda idx: a[idx])

    if isinstance(specs, PartitionSpec):
        return jax.tree_util.tree_map(lambda a: put(a, specs), tree)
    return jax.tree_util.tree_map(put, tree, specs)


def multiprocess_payload(mesh) -> Dict[str, np.ndarray]:
    """Deterministic cross-process battery; outputs identical in any world.

    1. **tp-sharded fused MPQ linear** (packed/scales/zeros ``P(None,'tp')``
       per ``parallel/sharding.py`` rules): output must equal the host
       dequant matmul exactly (XLA path).
    2. **dp-data-parallel DiodeMix QAT** (batch ``P('dp')``, replicated
       params): grads psum across the dp axis — across PROCESSES when the
       mesh spans them.  3 training losses recorded.
    3. **tp-sharded tiny-llama forward** (``llama_partition_specs``):
       prefill logits recorded.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models import QuantMLP
    from ..models.llama import LlamaModel, tiny_llama
    from ..models.llama_sharding import llama_partition_specs
    from ..ops.mpq_linear import mpq_linear
    from ..ops.quant import dequantize_mpq, quantize_mpq
    from ..optim.diode import DiodeHyperParams
    from ..parallel.sharding import partition_specs
    from ..training import create_train_state, cross_entropy_loss, make_train_step

    rng = np.random.default_rng(0)
    out: Dict[str, np.ndarray] = {}
    repl = NamedSharding(mesh, P())

    # --- 1: tp-sharded MPQ linear -----------------------------------------
    w = (rng.standard_normal((256, 128)) * 0.02).astype(np.float32)
    x = rng.standard_normal((8, 256)).astype(np.float32)
    qt = quantize_mpq(jnp.asarray(w), w_bit=4, group_size=64)
    qt_host = jax.tree_util.tree_map(np.asarray, qt)
    qt_sh = global_put(qt_host, mesh, partition_specs(qt_host))
    x_g = global_put(x, mesh)
    y = jax.jit(mpq_linear, out_shardings=repl)(x_g, qt_sh)
    out["mpq_y"] = np.asarray(jax.device_get(y.addressable_data(0)))
    out["mpq_ref"] = np.asarray(
        x @ np.asarray(dequantize_mpq(qt, jnp.float32))
    )

    # --- 2: dp-data-parallel DiodeMix training -----------------------------
    X = rng.standard_normal((64, 32)).astype(np.float32)
    Y = (np.argmax(X[:, :10], -1)).astype(np.int32)
    from ..utils.convert import prepare_for_training

    mlp = QuantMLP(hidden=32, n_classes=10, bits=1)
    params = prepare_for_training(mlp.init(jax.random.PRNGKey(0), jnp.asarray(X[:1])))
    hp = DiodeHyperParams(lr=1e-2)
    state = create_train_state(params, hp)
    state = global_put(jax.tree_util.tree_map(np.asarray, state), mesh)
    batch_spec = P("dp")
    Xg = global_put(X, mesh, batch_spec)
    Yg = global_put(Y, mesh, batch_spec)
    step = make_train_step(
        lambda p, b: cross_entropy_loss(mlp.apply(p, b[0]), b[1]), hp
    )
    losses = []
    for _ in range(3):
        state, metrics = step(state, (Xg, Yg))
        losses.append(float(jax.device_get(metrics["loss"].addressable_data(0))))
    out["train_losses"] = np.asarray(losses, np.float64)

    # --- 3: tp-sharded tiny-llama forward ----------------------------------
    cfg = tiny_llama(dtype=jnp.float32)
    model = LlamaModel(cfg)
    toks = (rng.integers(0, cfg.vocab_size, (2, 8))).astype(np.int32)
    lp = model.init(jax.random.PRNGKey(1), jnp.asarray(toks))
    lp_host = jax.tree_util.tree_map(np.asarray, lp)
    lp_sh = global_put(lp_host, mesh, llama_partition_specs(lp_host))
    toks_g = global_put(toks, mesh)
    logits, _ = jax.jit(
        lambda p, t: model.apply(p, t), out_shardings=(repl, None)
    )(lp_sh, toks_g)
    out["llama_logits"] = np.asarray(jax.device_get(logits.addressable_data(0)))

    # --- 4: the SERVING stack across the world ------------------------------
    # ContinuousBatcher with dp×tp-sharded params + paged KV, the closest
    # achievable approximation of the north star's "continuous batching
    # across hosts" in a 1-host env: every process runs the same engine in
    # lockstep; tokens replicate back; page allocation stays per-dp-group.
    # Output ids must be identical across processes AND to a single-process
    # world (asserted by tests/test_multiprocess.py).
    from ..models.generate import ContinuousBatcher
    from ..models.llama_sharding import shard_llama_params

    cfg_s = tiny_llama(dtype=jnp.float32, kv_cache_dtype="int8")
    model_s = LlamaModel(cfg_s)
    sp = model_s.init(jax.random.PRNGKey(2), jnp.zeros((1, 4), jnp.int32))
    sp_host = jax.tree_util.tree_map(np.asarray, sp)
    sp_sh = global_put(sp_host, mesh, llama_partition_specs(sp_host))
    prompts = [
        rng.integers(0, cfg_s.vocab_size, size=l).tolist()
        for l in (4, 6, 3, 5, 7, 4)
    ]
    batcher = ContinuousBatcher(
        model_s, sp_sh, num_slots=4, max_len=32, mesh=mesh,
        kv_pages=17, kv_page_size=8,
    )
    for p in prompts:
        batcher.submit(p, max_new_tokens=5)
    ids = {r.uid: r.generated for r in batcher.run()}
    out["serving_ids"] = np.asarray(
        [ids[uid] for uid in sorted(ids)], np.int32
    )
    return out


def run_worker(
    coordinator: str,
    num_processes: int,
    process_id: int,
    out_path: str,
    dp: Optional[int] = None,
) -> None:
    """One process of the distributed world: init, mesh, payload, save.

    Must run in a fresh process whose env set JAX_PLATFORMS=cpu and
    ``--xla_force_host_platform_device_count`` BEFORE importing jax
    (:func:`launch_workers` arranges this).
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    from .mesh import multihost_initialize

    multihost_initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, (
        f"process_count {jax.process_count()} != {num_processes}"
    )
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())
    dp = dp or num_processes
    mesh = Mesh(devs.reshape(dp, len(devs) // dp), axis_names=("dp", "tp"))
    results = multiprocess_payload(mesh)
    np.savez(out_path, **results)
    jax.distributed.shutdown()


def launch_workers(
    n_processes: int = 2,
    n_local_devices: int = 4,
    timeout: int = 600,
) -> list:
    """Spawn a local N-process world; returns each worker's payload dict.

    Raises RuntimeError (with worker logs) if any worker fails.
    """
    port = free_port()
    coordinator = f"127.0.0.1:{port}"
    tmp = tempfile.mkdtemp(prefix="bitorch_mp_")
    procs = []
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    for pid in range(n_processes):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_local_devices}"
        )
        # isolate from any inherited distributed/cache state
        env.pop("JAX_COORDINATOR_ADDRESS", None)
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        out_path = os.path.join(tmp, f"worker{pid}.npz")
        logf = open(os.path.join(tmp, f"worker{pid}.log"), "w")
        procs.append(
            (
                subprocess.Popen(
                    [
                        sys.executable,
                        "-m",
                        "bitorch_engine_tpu.parallel.multiprocess",
                        "--coordinator",
                        coordinator,
                        "--num-processes",
                        str(n_processes),
                        "--process-id",
                        str(pid),
                        "--out",
                        out_path,
                    ],
                    env=env,
                    stdout=logf,
                    stderr=subprocess.STDOUT,
                ),
                out_path,
                logf,
            )
        )
    results = []
    failed = []
    for pid, (p, out_path, logf) in enumerate(procs):
        try:
            rc = p.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            rc = -9
        logf.close()
        if rc != 0:
            with open(logf.name) as f:
                failed.append(f"worker {pid} rc={rc}:\n{f.read()[-4000:]}")
        else:
            results.append(dict(np.load(out_path)))
    if failed:
        raise RuntimeError("multiprocess workers failed:\n" + "\n".join(failed))
    return results


def _main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    run_worker(args.coordinator, args.num_processes, args.process_id, args.out)


if __name__ == "__main__":
    _main()
