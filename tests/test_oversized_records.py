"""Records longer than the engine chunk length.

The chunk-splitting paths must (a) produce identical results to a
configuration where the record fits in one chunk, and (b) never lose
hashes in the big-DB screen tier (which previously truncated any
oversized chunk to its first ``chunk_len`` hashes at flush).
"""

from __future__ import annotations

import random

import numpy as np
import jax.numpy as jnp
import pytest

from mash_tpu.core.engine import (
    SketchEngine,
    sketch_records_exact,
)
from mash_tpu.core.params import default_nucleotide_params
from mash_tpu.io.fastx import Record
from mash_tpu.native import load_library


def _rand_seq(rng, n):
    return bytes(rng.choice(b"ACGT") for _ in range(n))


def _records(rng, sizes):
    return [
        Record(name="r%d" % i, comment="", seq=_rand_seq(rng, n))
        for i, n in enumerate(sizes)
    ]


@pytest.mark.skipif(
    load_library() is None, reason="native library unavailable"
)
def test_exact_streaming_splits_oversized_records():
    """-M/-m style exact streaming of a record far bigger than the
    chunk: identical sketch to an engine whose chunk holds it whole."""
    rng = random.Random(3)
    small_chunk = 1 << 12
    sizes = [2000, int(small_chunk * 2.5), 300, small_chunk * 4 + 17]
    params = default_nucleotide_params()
    params.counts = True  # forces the exact-streaming path

    big = SketchEngine(params, chunk_len=1 << 20)
    small = SketchEngine(params, chunk_len=small_chunk)
    recs = _records(rng, sizes)
    ref_big, _h1, c1, _s1 = sketch_records_exact(
        big, iter(recs), "f", is_stdin=False
    )
    ref_small, _h2, c2, _s2 = sketch_records_exact(
        small, iter(recs), "f", is_stdin=False
    )
    assert c1 == c2 == len(sizes)
    np.testing.assert_array_equal(ref_big.hashes, ref_small.hashes)
    np.testing.assert_array_equal(ref_big.counts, ref_small.counts)
    assert ref_big.comment == ref_small.comment


@pytest.mark.skipif(
    load_library() is None, reason="native library unavailable"
)
def test_windowed_positions_split_matches_whole():
    rng = random.Random(5)
    params = default_nucleotide_params()
    params.windowed = True
    params.window_size = 100
    seq = _rand_seq(rng, 40000)

    big = SketchEngine(params, chunk_len=1 << 20)
    small = SketchEngine(params, chunk_len=1 << 12)
    p1, h1 = big.windowed_positions(seq)
    p2, h2 = small.windowed_positions(seq)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(h1, h2)
    assert len(p1) > 0


def test_bigdb_counter_oversized_chunk_not_truncated():
    """A hashed chunk spanning several rows keeps every hash (it was
    previously counted as ONE pending row and truncated at flush)."""
    import jax

    from mash_tpu.ops.screen_ops import BigDBCounter

    rng = np.random.default_rng(17)
    H = 1200
    db = np.unique(
        rng.integers(0, 2**63, size=H, dtype=np.int64).astype(
            np.uint64
        )
    )
    chunk_len = 1 << 12
    params = default_nucleotide_params()
    tpu = jax.default_backend() == "tpu"
    counter = BigDBCounter(
        params, db, s=100, chunk_len=chunk_len,
        d_tile=1024 if tpu else 256,
        wblk=8 if tpu else 4, rw=4,
    )
    # one oversized chunk: 3.5x the chunk length, with planted db
    # values in EVERY chunk_len-sized stretch (so truncation would
    # provably lose counts)
    n = int(chunk_len * 3.5)
    h = rng.integers(0, 2**63, size=n, dtype=np.int64).astype(
        np.uint64
    )
    for o in range(0, n, chunk_len):
        idx = rng.choice(len(db), size=min(200, n - o))
        h[o : o + len(idx)] = db[idx]
    v = rng.random(n) < 0.9
    counter.add(jnp.asarray(h), jnp.asarray(v))
    got = counter.finalize()

    from collections import Counter as C

    c = C(int(x) for x in h[v])
    exp = np.array([c.get(int(x), 0) for x in db], dtype=np.uint32)
    np.testing.assert_array_equal(got, exp)
