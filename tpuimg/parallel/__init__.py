from tpuimg.parallel.sharding import (
    hist_equalize_sharded,
    integral_sharded,
    make_mesh,
    shard_batch,
    shard_rows,
    stencil_sharded,
)

__all__ = [
    "hist_equalize_sharded", "integral_sharded", "make_mesh",
    "shard_batch", "shard_rows", "stencil_sharded",
]
