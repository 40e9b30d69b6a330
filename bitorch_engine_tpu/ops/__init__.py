from . import binary_linear, mpq_linear, packing, qat_linear, quant  # noqa: F401

