"""Training-step helpers wiring models + DiodeMix into one jitted update.

The reference's training loop lives in its examples
(``examples/mnist/train_mnist.py:85-99``); here the engine provides the loop
primitive itself: a pure ``train_step`` that computes grads (int leaves
allowed — QTensor payloads get float0 cotangents, real gradients ride in
``grad_shadow``) and applies the DiodeMix update, all inside one ``jit``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .optim import DiodeHyperParams, DiodeState, diode_init, diode_update


class TrainState(NamedTuple):
    params: Any
    opt_state: DiodeState
    step: jax.Array


def create_train_state(params, hp: Optional[DiodeHyperParams] = None, seed: int = 0):
    return TrainState(
        params=params,
        opt_state=diode_init(params, seed=seed, hp=hp),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    loss_fn: Callable,
    hp: Optional[DiodeHyperParams] = None,
) -> Callable:
    """Build a jitted ``(state, batch) -> (state, metrics)`` update.

    ``loss_fn(params, batch) -> scalar loss`` (or ``(loss, aux)`` with
    ``has_aux`` handled by returning a tuple).
    """
    hp = hp or DiodeHyperParams()

    @jax.jit
    def train_step(state: TrainState, batch):
        def wrapped(params):
            out = loss_fn(params, batch)
            if isinstance(out, tuple):
                return out
            return out, None

        (loss, aux), grads = jax.value_and_grad(wrapped, has_aux=True, allow_int=True)(
            state.params
        )
        new_params, new_opt = diode_update(grads, state.opt_state, state.params, hp)
        return (
            TrainState(new_params, new_opt, state.step + 1),
            {"loss": loss, "aux": aux},
        )

    return train_step


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return (jnp.argmax(logits, -1) == labels).mean()
