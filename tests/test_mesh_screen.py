"""Range-sharded screen counting on a CPU mesh vs the single-device fold."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mash_tpu.core.params import default_nucleotide_params
from mash_tpu.ops import screen_ops, sketch_ops
from mash_tpu.parallel import mesh as pmesh


@pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh"
)
def test_sharded_screen_counts_match_single_device():
    params = default_nucleotide_params()
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    chunks = [jnp.asarray(rng.choice(bases, size=(20000,))) for _ in range(2)]

    # DB with guaranteed hits: hashes drawn from the first chunk
    from mash_tpu.ops.kmers import alphabet_bytes, hash_chunk

    h, v = hash_chunk(
        chunks[0],
        alphabet=alphabet_bytes(params.alphabet),
        k=params.kmer_size,
        seed=params.seed,
        use64=params.use64,
        noncanonical=params.noncanonical,
        preserve_case=params.preserve_case,
    )
    present = np.unique(np.asarray(h)[np.asarray(v)])[:150]
    absent = rng.integers(0, 2**63, size=200, dtype=np.int64).astype(
        np.uint64
    )
    db = np.unique(np.concatenate([present, absent]))
    n_dev = len(jax.devices())
    pad = (-len(db)) % n_dev
    db = np.concatenate(
        [db, np.full(pad, np.uint64(0xFFFFFFFFFFFFFFFF))]
    )

    s = 64
    mesh = pmesh.default_mesh()
    counts_mesh, state_mesh = pmesh.sharded_screen_counts(
        mesh, params, jnp.asarray(db), chunks, s
    )

    fold = screen_ops.make_screen_fold(params, jnp.asarray(db), s)
    counts = jnp.zeros(len(db) + 1, jnp.int64)
    state = sketch_ops.empty_state(s)
    for c in chunks:
        counts, state = fold(counts, state, c)

    np.testing.assert_array_equal(
        np.asarray(counts_mesh), np.asarray(counts)[: len(db)]
    )
    np.testing.assert_array_equal(
        np.asarray(state_mesh[0]), np.asarray(state[0])
    )
    # counts too: a replicated-state re-merge bug once inflated these by
    # n_dev per chunk (corrupting the multiplicity/cardinality
    # estimators) while leaving the hash set identical
    np.testing.assert_array_equal(
        np.asarray(state_mesh[1]), np.asarray(state[1])
    )
