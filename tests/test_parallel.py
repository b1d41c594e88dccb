"""Multi-device sharding on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mash_tpu.core.params import default_nucleotide_params
from mash_tpu.ops import sketch_ops
from mash_tpu.ops.distance import pad_sketches, pairwise_common_denom
from mash_tpu.parallel import (
    default_mesh,
    sharded_pairwise,
    sharded_sketch_chunks,
    sharded_screen_counts,
)


pytestmark = pytest.mark.skipif(
    jax.device_count() < 2, reason="needs multiple devices"
)


def _chunks(rng, b, l):
    return rng.choice(
        np.frombuffer(b"ACGT", dtype=np.uint8), size=(b, l)
    )


def test_sharded_sketch_matches_single(tmp_path):
    rng = np.random.default_rng(0)
    params = default_nucleotide_params(kmer_size=15, sketch_size=64)
    s = 64
    n_dev = jax.device_count()
    chunks = _chunks(rng, n_dev * 2, 4096)
    mesh = default_mesh()
    got = sharded_sketch_chunks(
        mesh, params, jnp.asarray(chunks), s
    )

    # single-device reference: fold every chunk sequentially
    from mash_tpu.ops.kmers import alphabet_bytes, hash_chunk

    state = sketch_ops.empty_state(s)
    for i in range(chunks.shape[0]):
        h, v = hash_chunk(
            jnp.asarray(chunks[i]),
            alphabet=alphabet_bytes(params.alphabet),
            k=params.kmer_size,
            seed=params.seed,
            use64=params.use64,
            noncanonical=params.noncanonical,
            preserve_case=params.preserve_case,
        )
        st = sketch_ops.sketch_chunk(h, v, s=s)
        state = sketch_ops.merge_states(state, st, s=s)

    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(state[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(state[1]))


def test_sharded_pairwise_matches_single():
    rng = np.random.default_rng(1)
    s = 32
    n = jax.device_count() * 3
    sketches = [
        np.sort(
            rng.choice(10000, size=rng.integers(10, s), replace=False)
        ).astype(np.uint64)
        for _ in range(n)
    ]
    H, N = pad_sketches(sketches, s)
    mesh = default_mesh()
    c1, d1 = sharded_pairwise(
        mesh,
        jnp.asarray(H),
        jnp.asarray(N),
        jnp.asarray(H),
        jnp.asarray(N),
        cap=s,
    )
    c2, d2 = pairwise_common_denom(
        jnp.asarray(H),
        jnp.asarray(N),
        jnp.asarray(H),
        jnp.asarray(N),
        cap=s,
    )
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_sharded_screen_counts():
    rng = np.random.default_rng(2)
    params = default_nucleotide_params(kmer_size=15, sketch_size=32)
    n_dev = jax.device_count()

    # take some true k-mer hashes as the DB so hits actually occur
    from mash_tpu.ops.kmers import alphabet_bytes, hash_chunk

    chunk = _chunks(rng, 1, 2048)[0]
    h, v = hash_chunk(
        jnp.asarray(chunk),
        alphabet=alphabet_bytes(params.alphabet),
        k=params.kmer_size,
        seed=params.seed,
        use64=params.use64,
        noncanonical=params.noncanonical,
        preserve_case=params.preserve_case,
    )
    hv = np.unique(np.asarray(h)[np.asarray(v)])
    db = hv[:: max(1, len(hv) // 64)][:64]
    pad = (-len(db)) % n_dev
    db_padded = np.concatenate(
        [db, np.full(pad, np.uint64(2**64 - 1), dtype=np.uint64)]
    )

    mesh = default_mesh()
    counts, state = sharded_screen_counts(
        mesh, params, jnp.asarray(db_padded), [jnp.asarray(chunk)], 32
    )

    # oracle: numpy counting
    hs = np.asarray(h)[np.asarray(v)]
    expect = np.array([(hs == x).sum() for x in db_padded])
    np.testing.assert_array_equal(counts, expect)
    assert all(c >= 1 for c in counts[: len(db)])
