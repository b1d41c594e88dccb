"""Multi-device scaling over a ``jax.sharding.Mesh``.

The reference's only parallelism is a single-node pthread pool
(``src/mash/ThreadPool.h``); here the same workloads scale over TPU meshes
with XLA collectives instead: chunk-data-parallel sketching with an
``all_gather`` + associative bottom-s merge, row-sharded all-pairs distance
tiles, and range-sharded screen membership counting with ``psum`` tallies.
"""

from mash_tpu.parallel.mesh import (
    default_mesh,
    sharded_sketch_chunks,
    sharded_pairwise,
    sharded_screen_counts,
)

__all__ = [
    "default_mesh",
    "sharded_sketch_chunks",
    "sharded_pairwise",
    "sharded_screen_counts",
]
