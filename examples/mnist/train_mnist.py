"""Train a low-bit MLP on MNIST with DiodeMix (BASELINE.json configs[0]).

TPU-native re-creation of the reference example
(``examples/mnist/train_mnist.py:22-56,85-198``): a 2-layer MLP whose hidden
layer is a 1/4/8-bit quantized linear, trained end-to-end with gradients
flowing to the quantized weights and DiodeMix updating them directly.

Dataset: loads MNIST from an IDX/npz file if present (``--data-dir``,
zero-egress sandbox has no downloader); otherwise uses the real handwritten
digits bundled with scikit-learn (1797 8x8 scans — UCI optdigits), upsampled
to 28x28 so the model shapes match MNIST; a synthetic task remains as the
last-resort fallback.

Usage:
    python examples/mnist/train_mnist.py --bits 1 --epochs 3 [--cpu]
"""

import argparse
import gzip
import os
import struct
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def load_mnist(data_dir):
    """Load MNIST from idx-gz or npz files if available, else None."""
    npz = os.path.join(data_dir, "mnist.npz")
    if os.path.exists(npz):
        d = np.load(npz)
        return (d["x_train"], d["y_train"]), (d["x_test"], d["y_test"])

    def read_idx(path):
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rb") as f:
            magic, = struct.unpack(">I", f.read(4))
            ndim = magic & 0xFF
            dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
            return np.frombuffer(f.read(), dtype=np.uint8).reshape(dims)

    for suffix in ("", ".gz"):
        try:
            xtr = read_idx(os.path.join(data_dir, f"train-images-idx3-ubyte{suffix}"))
            ytr = read_idx(os.path.join(data_dir, f"train-labels-idx1-ubyte{suffix}"))
            xte = read_idx(os.path.join(data_dir, f"t10k-images-idx3-ubyte{suffix}"))
            yte = read_idx(os.path.join(data_dir, f"t10k-labels-idx1-ubyte{suffix}"))
            return (xtr, ytr), (xte, yte)
        except FileNotFoundError:
            continue
    return None


def load_sklearn_digits(seed=0):
    """Real handwritten digits shipped inside scikit-learn (no network).

    1797 8x8 grayscale scans of hand-written digits (UCI optdigits test set).
    Upsampled 8x8 -> 28x28 by pixel repetition + crop so the example keeps
    MNIST-shaped inputs. Returns None if sklearn is unavailable.
    """
    try:
        from sklearn.datasets import load_digits
    except ImportError:
        return None
    d = load_digits()
    x = d.data.reshape(-1, 8, 8).astype(np.float32) / 16.0
    # 8x8 -> 32x32 by 4x pixel repetition, center-crop to 28x28
    x = np.repeat(np.repeat(x, 4, axis=1), 4, axis=2)[:, 2:30, 2:30]
    y = d.target.astype(np.int32)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(x))
    x, y = x[perm], y[perm]
    n_test = len(x) // 5
    return (x[n_test:] * 255.0, y[n_test:]), (x[:n_test] * 255.0, y[:n_test])


def synthetic_digits(n_train=8000, n_test=2000, seed=0):
    """Synthetic 10-class 28x28 task (prototype digits + noise + shifts)."""
    rng = np.random.default_rng(seed)
    protos = rng.standard_normal((10, 28 * 28)).astype(np.float32)

    def make(n):
        y = rng.integers(0, 10, n)
        x = protos[y] + rng.standard_normal((n, 28 * 28)).astype(np.float32) * 0.8
        return x.reshape(n, 28, 28), y

    return make(n_train), make(n_test)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bits", type=int, default=1, choices=[1, 4, 8])
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--data-dir", default=os.environ.get("MNIST_DIR", "/root/data/mnist"))
    p.add_argument("--cpu", action="store_true", help="force local CPU backend")
    p.add_argument(
        "--log-dir",
        default=None,
        help="multi-logger output dir (CSV + JSONL + stdout; +wandb if "
        "WANDB_PROJECT is set) — the reference's Lightning CSVLogger/"
        "WandbLogger wiring, mnist-lightning/main.py:162-163",
    )
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bitorch_engine_tpu.models import QuantMLP
    from bitorch_engine_tpu.optim import DiodeHyperParams
    from bitorch_engine_tpu.training import (
        accuracy,
        create_train_state,
        cross_entropy_loss,
        make_train_step,
    )
    from bitorch_engine_tpu.utils import prepare_for_training

    data = load_mnist(args.data_dir)
    if data is None:
        data = load_sklearn_digits()
        if data is not None:
            print("# MNIST files not found; using real sklearn digits (8x8 scans -> 28x28)")
    if data is None:
        print("# no real dataset available; using the synthetic fallback task")
        (xtr, ytr), (xte, yte) = synthetic_digits()
    else:
        (xtr, ytr), (xte, yte) = data
    xtr = (xtr.reshape(len(xtr), -1).astype(np.float32) / 255.0 - 0.1307) / 0.3081 \
        if data is not None else xtr.reshape(len(xtr), -1)
    xte = (xte.reshape(len(xte), -1).astype(np.float32) / 255.0 - 0.1307) / 0.3081 \
        if data is not None else xte.reshape(len(xte), -1)

    model = QuantMLP(hidden=args.hidden, bits=args.bits)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(xtr[: args.batch_size]))
    params = prepare_for_training(params)
    hp = DiodeHyperParams(lr=args.lr)

    def loss_fn(params, batch):
        logits = model.apply(params, batch[0])
        return cross_entropy_loss(logits, batch[1]), accuracy(logits, batch[1])

    step = make_train_step(loss_fn, hp)
    state = create_train_state(params, hp)

    logger = None
    if args.log_dir:
        from bitorch_engine_tpu.utils.metrics import (
            CSVLogger,
            JSONLLogger,
            MetricsLogger,
            StdoutLogger,
        )

        backends = [
            CSVLogger(args.log_dir),
            JSONLLogger(args.log_dir),
            StdoutLogger(every=50),
        ]
        if os.environ.get("WANDB_PROJECT"):
            try:
                from bitorch_engine_tpu.utils.metrics import WandbLogger

                backends.append(WandbLogger(os.environ["WANDB_PROJECT"]))
            except ImportError:
                print("# wandb not installed; skipping WandbLogger")
        logger = MetricsLogger(backends)

    n = len(xtr)
    steps_per_epoch = n // args.batch_size
    rng = np.random.default_rng(1)
    for epoch in range(args.epochs):
        perm = rng.permutation(n)
        t0 = time.time()
        for i in range(steps_per_epoch):
            idx = perm[i * args.batch_size : (i + 1) * args.batch_size]
            state, metrics = step(state, (jnp.asarray(xtr[idx]), jnp.asarray(ytr[idx])))
            if logger is not None:
                logger.log(
                    {"loss": float(metrics["loss"]), "train_acc": float(metrics["aux"])},
                    step=epoch * steps_per_epoch + i,
                )
        # eval
        test_logits = model.apply(state.params, jnp.asarray(xte))
        test_acc = float(accuracy(test_logits, jnp.asarray(yte)))
        print(
            f"epoch {epoch}: loss {float(metrics['loss']):.4f} "
            f"train_acc {float(metrics['aux']):.4f} test_acc {test_acc:.4f} "
            f"({time.time() - t0:.1f}s)"
        )

    if logger is not None:
        logger.log({"test_acc": test_acc}, step=args.epochs * steps_per_epoch)
        logger.finalize()
    print(f"final test accuracy ({args.bits}-bit hidden layer): {test_acc:.4f}")


if __name__ == "__main__":
    main()
