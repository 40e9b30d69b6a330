"""bitorch_engine_tpu — a TPU-native low-bit neural-network engine.

Built from scratch in JAX/XLA/Pallas with the capability surface of
GreenBitAI/bitorch-engine (see SURVEY.md for the blueprint) and an idiomatic
TPU architecture: QTensor pytrees, custom_vjp quantized ops, Pallas fused
dequant-matmul kernels, a DiodeMix optimizer updating packed weights directly,
and pjit/shard_map multi-chip sharding.
"""

__version__ = "0.1.0"

from .qtensor import (  # noqa: F401
    BinaryEmbeddingQTensor,
    BinaryQTensor,
    IntQTensor,
    MBWQTensor,
    MPQTensor,
    QTensorBase,
    qtensor_leaves,
    tree_map_qtensor,
    with_grad_shadow,
    without_grad_shadow,
)
