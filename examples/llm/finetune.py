"""Full-parameter fine-tuning of a 4-bit quantized Llama with DiodeMix.

The flow the reference advertises as its flagship capability ("full-scale
quantization fine-tuning of LLMs", reference README.md:18) — TPU-native:

1. build / load a Llama whose projections are packed MPQ tensors
2. attach grad shadows (`prepare_for_training` — the `privileged_grad`
   analogue, reference nbit/cuda/mpq_layer.py:111-116)
3. DiodeMix updates the *quantized* weights in place: unpack → AdamW step →
   zeros refresh every 5 steps → repack (optim/diode.py::_update_mpq)
4. optionally shard the whole step over a (dp, tp) mesh

Runs self-contained on CPU with a tiny model and synthetic next-token data:

    python examples/llm/finetune.py --steps 30
    python examples/llm/finetune.py --steps 10 --mesh 2,2   # dp=2 x tp=2
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--w-bit", type=int, default=4)
    p.add_argument(
        "--mesh", help="dp,tp (e.g. 2,4) — shards the step over virtual devices"
    )
    p.add_argument(
        "--remat",
        action="store_true",
        help="rematerialize decoder blocks on backward (long-seq memory)",
    )
    args = p.parse_args()

    if args.mesh:
        dp, tp = (int(v) for v in args.mesh.split(","))
        os.environ.setdefault(
            "XLA_FLAGS", f"--xla_force_host_platform_device_count={dp * tp}"
        )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bitorch_engine_tpu.models.llama import LlamaModel, tiny_llama
    from bitorch_engine_tpu.optim import DiodeHyperParams
    from bitorch_engine_tpu.training import (
        create_train_state,
        cross_entropy_loss,
        make_train_step,
    )
    from bitorch_engine_tpu.utils import prepare_for_training

    cfg = tiny_llama(dtype=jnp.float32, w_bit=args.w_bit, remat=args.remat)
    model = LlamaModel(cfg)
    tokens = jnp.zeros((args.batch, args.seq), jnp.int32)
    params = prepare_for_training(model.init(jax.random.PRNGKey(0), tokens))

    def loss_fn(params, batch):
        logits, _ = model.apply(params, batch["tokens"])
        return cross_entropy_loss(logits, batch["labels"])

    hp = DiodeHyperParams(lr=args.lr)
    state = create_train_state(params, hp=hp)
    step = make_train_step(loss_fn, hp=hp)

    if args.mesh:
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from bitorch_engine_tpu.models.llama_sharding import llama_partition_specs

        mesh = Mesh(
            np.asarray(jax.devices()[: dp * tp]).reshape(dp, 1, tp),
            axis_names=("dp", "fsdp", "tp"),
        )
        specs = llama_partition_specs(state.params)
        state = state._replace(
            params=jax.device_put(
                state.params,
                jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs),
            )
        )
        data_sharding = NamedSharding(mesh, P("dp", None))
    else:
        mesh = None

    # synthetic copy-task data: predict the next token of a fixed pattern
    key = jax.random.PRNGKey(1)
    seq = jax.random.randint(key, (1, args.seq + 1), 0, cfg.vocab_size)
    seq = jnp.tile(seq, (args.batch, 1))
    batch = {"tokens": seq[:, :-1], "labels": seq[:, 1:]}
    if mesh is not None:
        batch = jax.device_put(batch, data_sharding)

    ctx = mesh if mesh is not None else _nullcontext()
    with ctx:
        first = None
        for i in range(args.steps):
            state, metrics = step(state, batch)
            loss = float(metrics["loss"])
            first = first if first is not None else loss
            if i % 5 == 0 or i == args.steps - 1:
                print(f"step {i:4d}  loss {loss:.4f}")
    print(f"loss {first:.4f} -> {loss:.4f} "
          f"({'improved' if loss < first else 'NO IMPROVEMENT'})")


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
