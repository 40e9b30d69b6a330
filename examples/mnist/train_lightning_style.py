"""Trainer-integration example: the "bring your own trainer" story.

Mirrors the reference's Lightning-Fabric example
(``examples/mnist-lightning/main.py``): there, a PLAIN torch model is
quantized **in place** via ``collect_layers``/``replace_layers``, wrapped in
a generic trainer, logged through CSV/W&B loggers, and checkpointed.  The
TPU-native translation composes the same subsystems functionally:

1. define a plain flax MLP (no engine layers anywhere in the model code);
2. quantize it in place with ``utils.convert.quantize_params`` (path-regex
   parameter surgery — the ``collect_layers`` analogue, SURVEY.md §2.2);
3. train with the generic ``training.py`` loop primitives + DiodeMix;
4. fan metrics out to CSV + JSONL + stdout backends
   (``utils.metrics.MetricsLogger`` — the Fabric ``loggers=[...]`` pattern;
   add ``WandbLogger`` where wandb exists);
5. checkpoint with Orbax mid-run, then RESUME from it and keep training.

Usage:
    python examples/mnist/train_lightning_style.py --epochs 2 [--cpu]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--strategy", default="4-128-256",
                    help="MPQ strategy string for the hidden layers")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--out", default=None, help="run dir (logs + checkpoint)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import linen as nn

    from bitorch_engine_tpu.optim import DiodeHyperParams
    from bitorch_engine_tpu.training import (
        accuracy,
        create_train_state,
        cross_entropy_loss,
        make_train_step,
    )
    from bitorch_engine_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from bitorch_engine_tpu.utils.convert import (
        prepare_for_training,
        quantize_params,
        quantized_apply,
    )
    from bitorch_engine_tpu.utils.metrics import (
        CSVLogger,
        JSONLLogger,
        MetricsLogger,
        StdoutLogger,
    )

    # --- 1. a PLAIN flax model: no engine imports in the model code --------
    class PlainMLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = x.reshape(x.shape[0], -1)
            x = nn.Dense(512, name="fc1")(x)
            x = nn.activation.hard_tanh(x)
            x = nn.Dense(512, name="fc2")(x)
            x = nn.activation.hard_tanh(x)
            return nn.Dense(10, name="head")(x)

    # --- data (same loaders as the sibling example) ------------------------
    from train_mnist import load_mnist, load_sklearn_digits, synthetic_digits

    data = load_mnist(args.data_dir) or load_sklearn_digits() or synthetic_digits()
    (xtr, ytr), (xte, yte) = data
    xtr = jnp.asarray(xtr.reshape(len(xtr), -1), jnp.float32) / 255.0
    xte = jnp.asarray(xte.reshape(len(xte), -1), jnp.float32) / 255.0
    ytr = jnp.asarray(ytr, jnp.int32)
    yte = jnp.asarray(yte, jnp.int32)

    model = PlainMLP()
    params = model.init(jax.random.PRNGKey(0), xtr[:2])

    # --- 2. quantize IN PLACE: hidden Dense kernels -> MPQTensors ----------
    # (reference: quantize_linear_with_mpq_linear_cuda over collect_layers;
    # fc1 stays fp because its K=784 input is not group-aligned — exactly
    # the shape-gating the reference's can_clone checks do — and the head
    # stays fp like the reference example's classifier)
    params = quantize_params(
        params, path_pattern=r"fc2/kernel$", strategy=args.strategy
    )
    params = prepare_for_training(params)

    # quantized_apply = model.apply + the MPQ method interceptor: the PLAIN
    # Dense consumes the MPQTensor kernel through the fused quantized matmul
    # (the reference's replace_layers module swap, done functionally)
    def loss_fn(p, batch):
        logits = quantized_apply(model, p, batch[0])
        return cross_entropy_loss(logits, batch[1]), accuracy(logits, batch[1])

    hp = DiodeHyperParams(lr=args.lr)
    step = make_train_step(loss_fn, hp)
    state = create_train_state(params, hp)

    run_dir = args.out or tempfile.mkdtemp(prefix="bitorch_run_")
    os.makedirs(run_dir, exist_ok=True)
    ckpt_path = os.path.join(run_dir, "ckpt")

    n = len(xtr)
    bs = args.batch_size
    rng = np.random.default_rng(0)
    gstep = 0

    # --- 3+4. generic trainer loop with fanned-out loggers -----------------
    with MetricsLogger(
        [
            CSVLogger(os.path.join(run_dir, "metrics.csv")),
            JSONLLogger(os.path.join(run_dir, "metrics.jsonl")),
            StdoutLogger(every=50),
        ]
    ) as logger:
        for epoch in range(args.epochs):
            perm = rng.permutation(n)
            for i in range(0, n - bs + 1, bs):
                idx = perm[i : i + bs]
                state, metrics = step(state, (xtr[idx], ytr[idx]))
                gstep += 1
                logger.log(
                    {"loss": float(metrics["loss"]), "acc": float(metrics["aux"])},
                    gstep,
                )
            test_acc = float(accuracy(quantized_apply(model, state.params, xte), yte))
            logger.log({"test_acc": test_acc}, gstep)
            print(f"epoch {epoch}: test acc {test_acc:.4f}")

        # --- 5. checkpoint mid-run, then resume and continue ---------------
        save_checkpoint(ckpt_path, state.params, pack=False)
        restored = load_checkpoint(ckpt_path, state.params)
        state = create_train_state(restored, hp)
        for i in range(0, min(n - bs + 1, 5 * bs), bs):
            state, metrics = step(state, (xtr[i : i + bs], ytr[i : i + bs]))
            gstep += 1
            logger.log({"loss": float(metrics["loss"]), "resumed": 1.0}, gstep)
        resumed_acc = float(accuracy(quantized_apply(model, state.params, xte), yte))
        logger.log({"test_acc_resumed": resumed_acc}, gstep)

    print(f"final (resumed) test acc {resumed_acc:.4f}; run dir: {run_dir}")
    assert os.path.exists(os.path.join(run_dir, "metrics.csv"))
    return resumed_acc


if __name__ == "__main__":
    main()
