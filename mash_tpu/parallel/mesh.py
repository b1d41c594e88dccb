"""Mesh-sharded implementations of the three core workloads.

Communication design (ICI-friendly, all static-shape):

- **Sketching** (data parallel over chunks): every device hashes and
  bottom-s-reduces its shard of a ``[B, L]`` chunk batch locally (no
  communication), then the s-sized per-device states are ``all_gather``'d
  (tiny: s * 12 bytes each) and merged with the associative fold — the
  MinHash analog of a gradient all-reduce.

- **Pairwise distance** (model parallel over query rows): the sketch
  matrix is replicated (or left sharded by rows); each device computes its
  row block against all references with the backend-dispatched pairwise
  intersection kernel (Pallas on TPU); outputs stay row-sharded.

- **Screen** (table parallel over DB hash ranges): the sorted DB hash
  array and its count vector are contiguously range-sharded; streamed
  chunks are replicated to all devices, each device counts hits only in
  its own range (a hash falls in exactly one range, so concatenating the
  per-range counts is exact).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mash_tpu.ops import sketch_ops
from mash_tpu.ops.kmers import hash_chunk

AXIS = "shard"


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    # process-LOCAL devices: per-host folds and tiles must never
    # build collectives over other hosts' devices (cross-host
    # merges go through parallel.multihost instead)
    devices = jax.local_devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def make_sharded_sketch_fn(mesh: Mesh, params, s: int,
                           chunk_len: Optional[int] = None):
    """Compile chunks[B, W] (sharded on B) -> replicated bottom-s state.

    With ``chunk_len`` set, rows are packed 2-bit+mask ingest rows and
    are reconstructed per device (local rows, no extra communication).
    """
    from mash_tpu.ops.kmers import alphabet_bytes, unpack_chunks

    alpha = alphabet_bytes(params.alphabet)

    from mash_tpu.ops.pallas_sketch import sketch_chunks_auto

    def per_device(chunks_local):
        if chunk_len is not None:
            chunks_local = unpack_chunks(chunks_local, chunk_len)
        sh_all, sc_all = sketch_chunks_auto(
            chunks_local,
            alphabet=alpha,
            k=params.kmer_size,
            seed=params.seed,
            use64=params.use64,
            noncanonical=params.noncanonical,
            preserve_case=params.preserve_case,
            s=s,
        )
        sh, sc = sketch_ops.tree_merge(sh_all, sc_all, s=s)
        # gather the tiny per-device states and merge them everywhere
        gh = jax.lax.all_gather(sh, AXIS)  # [n_dev, s]
        gc = jax.lax.all_gather(sc, AXIS)
        return sketch_ops.tree_merge(gh, gc, s=s)

    fn = shard_map(
        per_device,
        mesh=mesh,
        check_vma=False,
        in_specs=P(AXIS, None),
        out_specs=(P(), P()),
    )
    return jax.jit(fn)


_SKETCH_FN_CACHE: dict = {}


def sharded_sketch_chunks(mesh: Mesh, params, chunks, s: int):
    """Sketch a [B, L] uint8 chunk batch across the mesh.

    The compiled fn is cached per parameter signature — a fresh
    shard_map+jit wrapper per call would recompile every invocation.
    """
    key = (
        tuple(d.id for d in mesh.devices.flat),
        params.kmer_size,
        params.seed,
        params.use64,
        params.noncanonical,
        params.preserve_case,
        params.alphabet,
        s,
    )
    fn = _SKETCH_FN_CACHE.get(key)
    if fn is None:
        fn = make_sharded_sketch_fn(mesh, params, s)
        _SKETCH_FN_CACHE[key] = fn
    return fn(chunks)


def make_sharded_pairwise_fn(mesh: Mesh, cap: int, use64: bool = True):
    """Compile row-sharded all-pairs (common, denom) over the mesh.

    Each device runs the backend-dispatched kernel (Pallas on TPU) on
    its row shard against the replicated reference matrix.
    """
    from mash_tpu.ops.distance import pairwise_common_denom_auto

    def per_device(qry_h, qry_n, ref_h, ref_n):
        return pairwise_common_denom_auto(
            qry_h, qry_n, ref_h, ref_n, cap=cap, use64=use64
        )

    fn = shard_map(
        per_device,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(AXIS, None), P(AXIS), P(None, None), P(None)),
        out_specs=(P(AXIS, None), P(AXIS, None)),
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def cached_sharded_pairwise_fn(cap: int, use64: bool = True):
    """Process-cached sharded pairwise fn over the default device mesh."""
    return make_sharded_pairwise_fn(default_mesh(), cap, use64)


_pairwise_fns = {}


def sharded_pairwise(mesh: Mesh, qry_h, qry_n, ref_h, ref_n, cap: int,
                     use64: bool = True):
    """All-pairs (common, denom); query rows sharded, refs replicated.

    Rows must be padded to a multiple of the mesh size (pad with empty
    sketches: size 0).  Compiled wrappers are cached per
    (mesh devices, cap, use64), like the other sharded entry points.
    """
    key = (tuple(id(d) for d in mesh.devices.flat), cap, use64)
    fn = _pairwise_fns.get(key)
    if fn is None:
        fn = make_sharded_pairwise_fn(mesh, cap, use64)
        _pairwise_fns[key] = fn
    return fn(qry_h, qry_n, ref_h, ref_n)


def make_sharded_screen_fn(mesh: Mesh, params, s: int):
    """Compile (counts_sharded, state, chunk_replicated) -> updated.

    ``db_hashes`` and ``counts`` are contiguously range-sharded on the
    mesh; the chunk is replicated; each device counts only its range.
    The bottom-s cardinality state is computed identically on every
    device from the replicated chunk, so it stays replicated without
    communication.
    """
    from mash_tpu.ops.kmers import alphabet_bytes

    alpha = alphabet_bytes(params.alphabet)

    def per_device(db_local, counts_local, state_h, state_c, chunk):
        h, v = hash_chunk(
            chunk,
            alphabet=alpha,
            k=params.kmer_size,
            seed=params.seed,
            use64=params.use64,
            noncanonical=params.noncanonical,
            preserve_case=params.preserve_case,
        )
        from mash_tpu.ops.screen_ops import count_db_occurrences

        counts_local = count_db_occurrences(h, v, db_local, counts_local)
        bh, bc = sketch_ops.sketch_chunk_batch(
            h[None], v[None], s=s, use64=params.use64
        )
        # The chunk is replicated, so every device computes an identical
        # state; merging once with the carried state is the final value.
        # (An all_gather + re-merge here would multiply every hash count
        # by n_dev per chunk — geometric inflation that corrupts the
        # multiplicity/cardinality estimators.)
        sh, sc = sketch_ops.merge_states(
            (state_h, state_c), (bh[0], bc[0]), s=s
        )
        return counts_local, sh, sc

    fn = shard_map(
        per_device,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(AXIS), P(AXIS), P(), P(), P()),
        out_specs=(P(AXIS), P(), P()),
    )
    return jax.jit(fn)


def sharded_screen_counts(
    mesh: Mesh, params, db_hashes, chunks, s: int
):
    """Count DB-hash occurrences over streamed chunks on a mesh.

    ``db_hashes`` must be sorted and padded (with 2^64-1) to a multiple
    of the mesh size; sentinel padding never matches real hashes below
    2^64-1, so padded slots simply count nothing (pad entries are
    stripped by the caller).  Returns (counts[H], state).
    """
    n_dev = mesh.devices.size
    H = db_hashes.shape[0]
    assert H % n_dev == 0
    fn = make_sharded_screen_fn(mesh, params, s)
    state_h, state_c = sketch_ops.empty_state(s)
    counts = jnp.zeros(H, dtype=jnp.uint32)
    for chunk in chunks:
        counts, state_h, state_c = fn(
            db_hashes, counts, state_h, state_c, chunk
        )
    return np.asarray(counts), (state_h, state_c)
