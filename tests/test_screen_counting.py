"""Screen membership counting vs a numpy oracle, both DB-size regimes.

The fold picks a strategy by DB size (compare-reduce below 32k hashes,
sorted-chunk + DB-side binary search above); both must produce the
reference's exact total-occurrence counts (``CommandScreen.cpp:
569-575`` semantics: every valid k-mer occurrence of a DB hash counts).
"""

import numpy as np
import jax
import jax.numpy as jnp

from mash_tpu.core.params import default_nucleotide_params
from mash_tpu.ops import screen_ops, sketch_ops
from mash_tpu.ops.kmers import alphabet_bytes, hash_chunk


def _oracle_counts(params, db, chunks):
    alpha = alphabet_bytes(params.alphabet)
    total = np.zeros(len(db), np.int64)
    lut = {int(x): i for i, x in enumerate(db)}
    for c in chunks:
        h, v = hash_chunk(
            jnp.asarray(c),
            alphabet=alpha,
            k=params.kmer_size,
            seed=params.seed,
            use64=params.use64,
            noncanonical=params.noncanonical,
            preserve_case=params.preserve_case,
        )
        h = np.asarray(h)
        v = np.asarray(v)
        for hh in h[v]:
            i = lut.get(int(hh))
            if i is not None:
                total[i] += 1
    return total


def _run_fold(params, db, chunks, s=64):
    fold = screen_ops.make_screen_fold(params, jnp.asarray(db), s)
    counts = jnp.zeros(len(db) + 1, jnp.int64)
    state = sketch_ops.empty_state(s)
    for c in chunks:
        counts, state = fold(counts, state, jnp.asarray(c))
    return np.asarray(counts)[: len(db)]


def _mk_inputs(seed, n_chunks=2, clen=20000):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    return [rng.choice(bases, size=clen) for _ in range(n_chunks)]


def _db_from_stream(params, chunks, extra, take):
    """DB = some true stream hashes (guaranteed hits) + random misses."""
    alpha = alphabet_bytes(params.alphabet)
    h, v = hash_chunk(
        jnp.asarray(chunks[0]),
        alphabet=alpha,
        k=params.kmer_size,
        seed=params.seed,
        use64=params.use64,
        noncanonical=params.noncanonical,
        preserve_case=params.preserve_case,
    )
    present = np.unique(np.asarray(h)[np.asarray(v)])[:take]
    rng = np.random.default_rng(99)
    absent = rng.integers(0, 2**63, size=extra, dtype=np.int64).astype(
        np.uint64
    )
    return np.unique(np.concatenate([present, absent]))


def test_small_db_compare_reduce():
    params = default_nucleotide_params()
    chunks = _mk_inputs(0)
    db = _db_from_stream(params, chunks, extra=500, take=200)
    assert len(db) <= screen_ops_small_limit()
    got = _run_fold(params, db, chunks)
    want = _oracle_counts(params, db, chunks)
    np.testing.assert_array_equal(got, want)


def test_large_db_sorted_counting():
    params = default_nucleotide_params()
    chunks = _mk_inputs(1)
    db = _db_from_stream(params, chunks, extra=40000, take=300)
    assert len(db) > screen_ops_small_limit()
    got = _run_fold(params, db, chunks)
    want = _oracle_counts(params, db, chunks)
    np.testing.assert_array_equal(got, want)


def test_huge_db_merge_counting():
    params = default_nucleotide_params()
    chunks = _mk_inputs(2, n_chunks=1, clen=30000)
    db = _db_from_stream(params, chunks, extra=300000, take=400)
    assert len(db) > screen_ops_db_side_limit()
    got = _run_fold(params, db, chunks)
    want = _oracle_counts(params, db, chunks)
    np.testing.assert_array_equal(got, want)


def test_huge_db_with_empty_sentinel_hash():
    """A real DB hash equal to 2^64-1 must count only valid k-mers."""
    params = default_nucleotide_params()
    chunks = _mk_inputs(3, n_chunks=1, clen=30000)
    db = _db_from_stream(params, chunks, extra=300000, take=100)
    db = np.unique(
        np.concatenate([db, [np.uint64(0xFFFFFFFFFFFFFFFF)]])
    )
    got = _run_fold(params, db, chunks)
    want = _oracle_counts(params, db, chunks)
    np.testing.assert_array_equal(got, want)


def screen_ops_small_limit():
    return 1 << 15


def screen_ops_db_side_limit():
    return 1 << 18
