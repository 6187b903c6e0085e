from utree_tpu.parallel.mesh import make_mesh
from utree_tpu.parallel.sharded import (
    ShardedIndex,
    replicated_search_step,
    sharded_search_step,
    long_read_histogram,
    split_long_read,
)

__all__ = [
    "make_mesh",
    "ShardedIndex",
    "replicated_search_step",
    "sharded_search_step",
    "long_read_histogram",
    "split_long_read",
]
