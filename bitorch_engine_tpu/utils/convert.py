"""Model surgery & quantization strategies (params-tree transformations).

Parity targets: ``utils/convert.py`` (``collect_layers`` / ``replace_layers``
/ ``quantize_linear_with_*`` and the MPQ strategy table ``get_mpq_config``,
``convert.py:94-117``) and ``utils/model_helper.py`` packing helpers.

TPU-native translation: instead of mutating ``nn.Module`` objects, we
transform *parameter pytrees* — a fp checkpoint's kernel arrays are replaced
by QTensors produced with the chosen strategy, keyed by path regex (the
pattern in SNIPPETS.md's sharding_map).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import jax

from ..ops import quant
from ..qtensor import QTensorBase, qtensor_leaves, with_grad_shadow, without_grad_shadow

Array = jax.Array

# Strategy strings "w_bit-group_size-dq_group_size" (reference convert.py:102-116).
MPQ_STRATEGIES: Dict[str, Tuple[int, int, int]] = {
    "2-8-32": (2, 8, 32),
    "2-32-32": (2, 32, 32),
    "2-128-32": (2, 128, 32),
    "4-128-256": (4, 128, 256),
    "8-128-256": (8, 128, 256),
}


def get_mpq_config(strategy: str) -> Dict[str, int]:
    """Strategy string → kwargs for MPQ quantization (convert.py:94-117)."""
    if strategy not in MPQ_STRATEGIES:
        raise ValueError(
            f"unknown strategy {strategy!r}; options: {sorted(MPQ_STRATEGIES)}"
        )
    w_bit, group_size, dq_group_size = MPQ_STRATEGIES[strategy]
    return {"w_bit": w_bit, "group_size": group_size, "dq_group_size": dq_group_size}


def quantize_params(
    params,
    path_pattern: str = r"(kernel|weight)$",
    strategy: str = "4-128-256",
    asym: bool = False,
    transpose: bool = False,
):
    """Replace matching fp weight leaves with MPQTensors.

    ``transpose=True`` for torch-convention ``(out, in)`` weights (our
    MPQTensor holical layout is ``(K, N)``; flax Dense kernels are already
    ``(in, out)``).
    """
    cfg = get_mpq_config(strategy)

    def visit(path, leaf):
        pathstr = "/".join(str(getattr(p, "key", p)) for p in path)
        if (
            not isinstance(leaf, QTensorBase)
            and hasattr(leaf, "ndim")
            and leaf.ndim == 2
            and re.search(path_pattern, pathstr)
        ):
            w = leaf.T if transpose else leaf
            return quant.quantize_mpq(
                w, w_bit=cfg["w_bit"], group_size=cfg["group_size"], asym=asym
            )
        return leaf

    flat, treedef = jax.tree_util.tree_flatten_with_path(
        params, is_leaf=lambda x: isinstance(x, QTensorBase)
    )
    return jax.tree_util.tree_unflatten(
        treedef, [visit(p, l) for p, l in flat]
    )


def mpq_interceptor(next_fun, args, kwargs, context):
    """flax method interceptor: a plain ``nn.Dense`` whose stored ``kernel``
    param is an MPQTensor (after :func:`quantize_params` surgery) computes
    the fused quantized matmul instead of the fp one.

    This is the functional analogue of the reference's ``replace_layers``
    module mutation (``convert.py:7-84`` + the Lightning example's
    quantize-in-place flow): the MODEL code stays plain; the behavior swap
    keys off the parameter type.  During ``init`` (no stored kernel yet) and
    for unconverted layers it falls through to the normal Dense path, so
    one model definition serves both fp and quantized parameter trees.
    """
    from flax import linen as nn

    from ..ops.mpq_linear import mpq_linear
    from ..qtensor import MPQTensor

    mod = context.module
    if (
        isinstance(mod, nn.Dense)
        and context.method_name == "__call__"
        and mod.scope is not None
        and mod.scope.has_variable("params", "kernel")
    ):
        kern = mod.scope.get_variable("params", "kernel")
        if isinstance(kern, MPQTensor):
            (x,) = args
            y = mpq_linear(x, kern)
            if mod.use_bias and mod.scope.has_variable("params", "bias"):
                y = y + mod.scope.get_variable("params", "bias")
            return y
    return next_fun(*args, **kwargs)


def quantized_apply(model, params, *args, **kwargs):
    """``model.apply`` with :func:`mpq_interceptor` active: run a PLAIN flax
    model whose params tree was quantized in place by :func:`quantize_params`."""
    from flax import linen as nn

    with nn.intercept_methods(mpq_interceptor):
        return model.apply(params, *args, **kwargs)


def prepare_for_training(params):
    """Attach grad shadows to every QTensor (reference ``prepare_bie_layers``
    + training-mode ``privileged_grad`` allocation)."""

    def f(leaf):
        if isinstance(leaf, QTensorBase):
            return with_grad_shadow(leaf)
        return leaf

    return jax.tree_util.tree_map(
        f, params, is_leaf=lambda x: isinstance(x, QTensorBase)
    )


def relayout_params_for_tpu(params, meta_dtype=None, act_bits_map=None):
    """Convert every MPQ/MBWQ tensor to the Pallas kernel's tpu_tiled layout.

    MUST run once at load/prepare time (the analogue of the reference's
    ``prepare_params``): the kernel auto-relayouts gptq-layout tensors for
    correctness, but inside a jitted step that conversion re-executes every
    call — on a 7B model that is ~10 GB of extra traffic per decoded token.

    ``meta_dtype=jnp.bfloat16`` stores group scales/zeros 16-bit (the
    reference's exl2/GPTQ storage width), halving the per-token metadata
    stream — see :func:`relayout_tpu`.

    ``act_bits_map``: optional ``{container_w_bit: act_bits}`` selecting the
    decode-regime activation width per stored container width, e.g.
    ``{2: 8}`` routes every 2-bit tensor/segment through the A8 int8-MXU
    quad layout (the w2 VPU-extract-bound fix, BENCH_NOTES round 3/4).
    """
    from ..ops.pallas.dequant_matmul import relayout_tpu
    from ..qtensor import MBWQTensor, MPQTensor

    abm = act_bits_map or {}

    def rl(s):
        return relayout_tpu(s, meta_dtype=meta_dtype, act_bits=abm.get(s.w_bit))

    def f(leaf):
        if isinstance(leaf, MPQTensor):
            return rl(leaf)
        if isinstance(leaf, MBWQTensor):
            return leaf.replace(segments=tuple(rl(s) for s in leaf.segments))
        return leaf

    return jax.tree_util.tree_map(
        f, params, is_leaf=lambda x: isinstance(x, QTensorBase)
    )


def prepare_for_inference(params):
    """Drop grad shadows and pack binary weights (reference ``pack_bie_layers``)."""
    from ..qtensor import BinaryQTensor

    def f(leaf):
        if isinstance(leaf, BinaryQTensor) and not leaf.packed:
            return quant.pack_binary_weight(without_grad_shadow(leaf))
        if isinstance(leaf, QTensorBase):
            return without_grad_shadow(leaf)
        return leaf

    return jax.tree_util.tree_map(
        f, params, is_leaf=lambda x: isinstance(x, QTensorBase)
    )


def count_quantized_bytes(params) -> Dict[str, int]:
    """Report packed vs would-be-fp16 footprint of all QTensors."""
    packed = 0
    fp16 = 0
    for qt in qtensor_leaves(params):
        for leaf in jax.tree_util.tree_leaves(qt):
            packed += leaf.size * leaf.dtype.itemsize
        k_n = qt.logical_shape
        fp16 += 2 * k_n[0] * k_n[1]
    return {"packed_bytes": packed, "fp16_bytes": fp16}
