"""Multi-device scaling over a ``jax.sharding.Mesh``.

The reference's only parallelism is a single-node pthread pool
(``src/mash/ThreadPool.h``); here the same workloads scale over TPU meshes
with XLA collectives instead: chunk-data-parallel sketching with an
``all_gather`` + associative bottom-s merge, row-sharded all-pairs distance
tiles, and range-sharded screen membership counting with ``psum`` tallies.

Attribute access is lazy (PEP 562): ``mash_tpu.parallel.multihost`` must
be importable *before* ``jax.distributed.initialize`` runs, so this
package must not pull ``mesh``/``ops`` (whose compiled helpers touch the
XLA backend) at import time.
"""

__all__ = [
    "default_mesh",
    "sharded_sketch_chunks",
    "sharded_pairwise",
    "sharded_screen_counts",
]


def __getattr__(name):
    if name in __all__:
        from mash_tpu.parallel import mesh

        return getattr(mesh, name)
    raise AttributeError(name)
