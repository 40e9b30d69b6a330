from .mesh import make_mesh, multihost_initialize  # noqa: F401
from .sharding import (  # noqa: F401
    make_sharding_rules,
    mpq_column_parallel_spec,
    mpq_row_parallel_spec,
    partition_specs,
    shard_params,
)
from .pipeline import pipeline_apply, stack_stages, stage_shardings  # noqa: F401
from .ring_attention import ring_attention  # noqa: F401
from .ulysses import ulysses_attention  # noqa: F401
