"""Multi-backend metrics logging (reference parity: the Lightning example's
CSVLogger+WandbLogger wiring, examples/mnist-lightning/main.py:162-163)."""

import csv
import json

from bitorch_engine_tpu.utils.metrics import (
    CSVLogger,
    JSONLLogger,
    MetricsLogger,
    StdoutLogger,
)


def test_csv_logger_union_header(tmp_path):
    lg = CSVLogger(str(tmp_path))
    lg.log({"loss": 1.5}, step=0)
    lg.log({"loss": 1.2, "acc": 0.7}, step=1)  # header grows
    with open(lg.path) as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["loss"] == "1.5" and rows[0]["acc"] == ""
    assert rows[1]["acc"] == "0.7" and rows[1]["step"] == "1"


def test_jsonl_and_multiplex(tmp_path, capsys):
    ml = MetricsLogger(
        [JSONLLogger(str(tmp_path)), CSVLogger(str(tmp_path)), StdoutLogger(every=2)]
    )
    with ml:
        ml.log({"loss": 2.0}, step=0)
        ml.log({"loss": 1.0}, step=1)
    recs = [json.loads(l) for l in open(str(tmp_path / "metrics.jsonl"))]
    assert recs == [{"step": 0, "loss": 2.0}, {"step": 1, "loss": 1.0}]
    with open(str(tmp_path / "metrics.csv")) as f:
        assert len(list(csv.DictReader(f))) == 2


def test_device_scalars_logged(tmp_path):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    lg = JSONLLogger(str(tmp_path))
    lg.log({"loss": jnp.asarray(0.25)}, step=3)
    lg.finalize()
    rec = json.loads(open(lg.path).read())
    assert rec == {"step": 3, "loss": 0.25}


def test_device_op_table(tmp_path):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from bitorch_engine_tpu.utils import profiling

    logdir = str(tmp_path / "tr")
    f = jax.jit(lambda a, b: (a @ b).sum())
    x = jnp.ones((128, 128))
    f(x, x).block_until_ready()
    with profiling.trace(logdir):
        f(x, x).block_until_ready()
    try:
        rows = profiling.device_op_table(logdir)
    except FileNotFoundError:
        return  # CPU runs may not emit a device trace; the TPU path is the target
    assert isinstance(rows, list)
    for r in rows:
        assert {"key", "us", "count", "example"} <= set(r)
