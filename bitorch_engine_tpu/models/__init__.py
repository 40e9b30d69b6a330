from .mlp import QuantMLP  # noqa: F401
