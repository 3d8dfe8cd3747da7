from .mesh import (  # noqa: F401
    make_mesh,
    data_parallel_step,
    shard_batch,
    replicate,
    process_is_primary,
    maybe_initialize_distributed,
)
from .serving import make_dp_serve  # noqa: F401
