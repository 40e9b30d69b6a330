from .attention import BMHA, LearnableBias, Q4MatMul  # noqa: F401
from .conv import BinaryConv2d, Q4Conv2d  # noqa: F401
from .embedding import BinaryEmbedding, BinaryEmbeddingBag  # noqa: F401
from .linear import (  # noqa: F401
    BinaryLinear,
    MBWQLinear,
    MPQLinear,
    Q4Linear,
    Q8Linear,
)
