"""Multi-chip execution: jax.sharding mesh + shard_map sharded retrieval.

The reference is strictly single-process (SURVEY.md §2 parallelism
statement: no DP/TP/PP/SP/EP, no collectives).  This package is the
net-new distributed design required by the BASELINE.md north star:
data-parallel sharding of the embedding matrix across chips, per-shard
partial top-k, all-gather merge over ICI.
"""

from photo_search_engine_tpu.parallel.sharded import (
    ShardedEmbeddingStore,
    make_mesh,
    sharded_exact_search,
    sharded_grouped_search,
    sharded_int8_search,
    sharded_kmeans_step,
)

__all__ = [
    "ShardedEmbeddingStore",
    "make_mesh",
    "sharded_exact_search",
    "sharded_grouped_search",
    "sharded_int8_search",
    "sharded_kmeans_step",
]
