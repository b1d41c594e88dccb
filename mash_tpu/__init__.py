"""mash-tpu: a TPU-native MinHash genome-sketching framework.

A from-scratch reimplementation of the capabilities of marbl/Mash v2.3
(reference surveyed in /root/repo/SURVEY.md) designed for TPU hardware:

- k-mer extraction, canonicalization and MurmurHash3-compatible hashing run
  as vectorized JAX/XLA (and Pallas) programs over batched sequence chunks
  (reference hot loop: ``src/mash/Sketch.cpp:512-583``);
- bottom-s sketch selection is an associative sort/merge fold on device
  instead of a min-heap (``src/mash/MinHashHeap.cpp:68-146``);
- Jaccard / Mash distance is a batched sorted-sketch intersection kernel
  (``src/mash/CommandDistance.cpp:336-425``);
- multi-chip scaling uses ``jax.sharding.Mesh`` + ``shard_map`` with XLA
  collectives instead of threads (reference is single-node pthreads,
  ``src/mash/ThreadPool.h``).

Numerical outputs (sketch hash sets, distances, p-values) byte-match the
reference's golden test files.
"""

import os as _os

import jax as _jax

# Bit-exact MurmurHash3 and 64-bit sketch hashes require 64-bit integer
# support everywhere (TPU emulates u64 with u32 pairs under XLA).
_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: one-shot CLI invocations would otherwise
# pay ~30s of XLA compilation per chunk shape on every run.
try:
    _cache = _os.environ.get(
        "MASH_TPU_CACHE",
        _os.path.join(
            _os.path.expanduser("~"), ".cache", "mash_tpu", "xla"
        ),
    )
    if _cache:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache is an optimization; never fail import
    pass

from mash_tpu._version import __version__  # noqa: E402

__all__ = ["__version__"]
