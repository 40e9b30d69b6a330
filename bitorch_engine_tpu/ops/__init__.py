from . import binary_linear, mpq_linear, packing, qat_linear, qat_matmul, quant  # noqa: F401

