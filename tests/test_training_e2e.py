"""End-to-end QAT training: the minimum slice (SURVEY.md §7 stage 3).

A synthetic 10-class classification task stands in for MNIST (no dataset
download in the sandbox); the gate is *learning*: the 1-bit QuantMLP trained
with DiodeMix must reach high train accuracy, exercising
layers→custom_vjp→grad_shadow→DiodeMix end to end, all jitted.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.models import QuantMLP
from bitorch_engine_tpu.optim import DiodeHyperParams
from bitorch_engine_tpu.training import (
    accuracy,
    create_train_state,
    cross_entropy_loss,
    make_train_step,
)
from bitorch_engine_tpu.utils import prepare_for_training


def _synthetic_task(n=512, d=64, classes=10, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((classes, d)).astype(np.float32) * 2.0
    labels = rng.integers(0, classes, size=n)
    x = centers[labels] + rng.standard_normal((n, d)).astype(np.float32) * 0.5
    return jnp.asarray(x), jnp.asarray(labels)


@pytest.mark.parametrize("bits", [1, 4, 8])
def test_quant_mlp_learns(bits):
    x, y = _synthetic_task()
    model = QuantMLP(hidden=128, bits=bits)
    params = model.init(jax.random.PRNGKey(0), x[:8])
    params = prepare_for_training(params)

    def loss_fn(params, batch):
        bx, by = batch
        logits = model.apply(params, bx)
        return cross_entropy_loss(logits, by), accuracy(logits, by)

    lr = 1e-3 if bits == 1 else 5e-3
    step = make_train_step(loss_fn, DiodeHyperParams(lr=lr))
    state = create_train_state(params, DiodeHyperParams(lr=lr))

    accs = []
    for epoch in range(30):
        state, metrics = step(state, (x, y))
        accs.append(float(metrics["aux"]))
    assert accs[-1] > 0.8, f"bits={bits}: acc trajectory {accs[-5:]}"
