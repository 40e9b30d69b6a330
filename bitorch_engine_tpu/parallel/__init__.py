from .mesh import make_mesh, multihost_initialize  # noqa: F401
from .sharding import (  # noqa: F401
    make_sharding_rules,
    mpq_column_parallel_spec,
    mpq_row_parallel_spec,
    partition_specs,
    shard_params,
)
