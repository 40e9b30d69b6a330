"""Import the reference implementation's executable torch quant math.

The reference (``/root/reference``, GreenBitAI/bitorch-engine) implements its
pack/unpack/double-quant math in pure torch (CUDA kernels are only the fast
path); with the CPU torch in this sandbox those functions are directly
executable and serve as golden references for bit-exact parity tests
(``tests/test_reference_parity.py``).

The reference package imports ``bitorch`` (the QAT registry package, not
installed here) purely for registry decorators/enums — we stub just enough of
it for the import chain to resolve.  ``BIE_SKIP_TORCH_CHECK=1`` skips the
custom-torch-fork probe (``bitorch_engine/__init__.py:12-28``); missing
compiled extensions degrade to placeholders via ``safe_import``.
"""

from __future__ import annotations

import os
import sys
import types

_REFERENCE_PATH = "/root/reference"


def _install_bitorch_stub() -> None:
    if "bitorch" in sys.modules:
        return

    bitorch = types.ModuleType("bitorch")
    bitorch.__path__ = []  # mark as package so submodule imports resolve

    class RuntimeMode:
        DEFAULT = 0
        CPU = 1
        GPU = 2
        INFERENCE_AUTO = 3

    class QLinearBase:
        pass

    class CustomImplementationMixin:
        pass

    class LayerRecipe:
        pass

    def QLinearImplementation(*_a, **_k):
        def deco(cls):
            return cls

        return deco

    class _Quantizer:
        def __init__(self, *a, **k):
            pass

    bitorch.RuntimeMode = RuntimeMode

    layers = types.ModuleType("bitorch.layers")
    layers.__path__ = []
    layers.QLinearBase = QLinearBase
    layers.CustomImplementationMixin = CustomImplementationMixin

    extensions = types.ModuleType("bitorch.layers.extensions")
    extensions.LayerRecipe = LayerRecipe

    qlinear = types.ModuleType("bitorch.layers.qlinear")
    qlinear.QLinearImplementation = QLinearImplementation
    qlinear.QLinearBase = QLinearBase

    register = types.ModuleType("bitorch.layers.register")
    register.QLinearImplementation = QLinearImplementation

    quantizations = types.ModuleType("bitorch.quantizations")
    quantizations.Sign = type("Sign", (_Quantizer,), {})
    quantizations.SwishSign = type("SwishSign", (_Quantizer,), {})

    layers.extensions = extensions
    layers.qlinear = qlinear
    layers.register = register
    bitorch.layers = layers
    bitorch.quantizations = quantizations

    for name, mod in (
        ("bitorch", bitorch),
        ("bitorch.layers", layers),
        ("bitorch.layers.extensions", extensions),
        ("bitorch.layers.qlinear", qlinear),
        ("bitorch.layers.register", register),
        ("bitorch.quantizations", quantizations),
    ):
        sys.modules[name] = mod


def load_reference():
    """Import and return the reference's quant-math surface.

    Returns a namespace with: ``torch``, ``unpack_qweight``, ``pack_fp_weight``,
    ``make_group_map`` (``nbit/cuda/utils.py``), ``gptq_style_unpacking``,
    ``gptq_style_zeros_packing``, ``nv_tensor_quant``, ``q4_quantization``,
    ``q8_quantization`` (``utils/quant_operators.py``), ``MPQWeightParameter``,
    ``MPQLinearCuda`` (CPU-instantiable; ``prepare_params`` is pure torch).
    """
    os.environ.setdefault("BIE_SKIP_TORCH_CHECK", "1")
    if _REFERENCE_PATH not in sys.path:
        sys.path.insert(0, _REFERENCE_PATH)
    _install_bitorch_stub()

    import torch  # noqa: F401
    from bitorch_engine.layers.qlinear.nbit import MPQWeightParameter
    from bitorch_engine.layers.qlinear.nbit.cuda import MPQLinearCuda
    from bitorch_engine.layers.qlinear.nbit.cuda.utils import (
        make_group_map,
        pack_fp_weight,
        unpack_qweight,
    )
    from bitorch_engine.utils.quant_operators import (
        gptq_style_unpacking,
        gptq_style_zeros_packing,
        nv_tensor_quant,
        q4_quantization,
        q8_quantization,
    )

    ns = types.SimpleNamespace(
        torch=torch,
        MPQWeightParameter=MPQWeightParameter,
        MPQLinearCuda=MPQLinearCuda,
        make_group_map=make_group_map,
        pack_fp_weight=pack_fp_weight,
        unpack_qweight=unpack_qweight,
        gptq_style_unpacking=gptq_style_unpacking,
        gptq_style_zeros_packing=gptq_style_zeros_packing,
        nv_tensor_quant=nv_tensor_quant,
        q4_quantization=q4_quantization,
        q8_quantization=q8_quantization,
    )
    return ns
