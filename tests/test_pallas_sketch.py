"""Fused Pallas sketch kernel vs the XLA pipeline (interpret mode on CPU).

Covers the emulated 64-bit pair arithmetic against oracles and the full
bytes->bottom-s path against hash_chunk + sketch_chunk for every mode
combination the CLI can produce, including certificate-fallback inputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mash_tpu.core.params import default_nucleotide_params
from mash_tpu.hashing.murmur3 import mmh3_x64_128_py
from mash_tpu.ops import pallas_sketch as ps
from mash_tpu.ops import sketch_ops
from mash_tpu.ops.kmers import alphabet_bytes, hash_chunk

ALPHA = alphabet_bytes(default_nucleotide_params().alphabet)


def _to_pair(x):
    hi = ((x >> np.uint64(32)) & np.uint64(0xFFFFFFFF)).astype(
        np.uint32
    ).view(np.int32)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
    return jnp.asarray(hi), jnp.asarray(lo)


def _from_pair(h, l):
    return (
        np.asarray(h).view(np.uint32).astype(np.uint64) << np.uint64(32)
    ) | np.asarray(l).view(np.uint32).astype(np.uint64)


def test_u64_pair_arithmetic():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**64, size=2000, dtype=np.uint64)
    b = rng.integers(0, 2**64, size=2000, dtype=np.uint64)
    ah, al = _to_pair(a)
    bh, bl = _to_pair(b)
    assert np.array_equal(_from_pair(*ps._mul64(ah, al, bh, bl)), a * b)
    assert np.array_equal(_from_pair(*ps._add64(ah, al, bh, bl)), a + b)
    for r in (1, 27, 31, 32, 33, 47):
        want = (a << np.uint64(r)) | (a >> np.uint64(64 - r))
        assert np.array_equal(
            _from_pair(*ps._rotl64(ah, al, r)), want
        ), r


@pytest.mark.parametrize("k", [9, 16, 21, 32])
def test_murmur_pair_matches_oracle(k):
    rng = np.random.default_rng(k)
    kmers = rng.integers(65, 91, size=(200, k), dtype=np.int64).astype(
        np.uint8
    )
    pairs = []
    for m in range((k + 7) // 8):
        w = np.zeros(200, dtype=np.uint64)
        for j in range(8 * m, min(8 * m + 8, k)):
            w |= kmers[:, j].astype(np.uint64) << np.uint64(
                8 * (j - 8 * m)
            )
        pairs.append(_to_pair(w))
    got = _from_pair(*ps.mmh3_words_pair(pairs, k, 42))
    want = np.array(
        [mmh3_x64_128_py(bytes(km), 42)[0] for km in kmers],
        dtype=np.uint64,
    )
    np.testing.assert_array_equal(got, want)


def _check(chunks, k, s, use64, noncanon):
    kw = dict(
        alphabet=ALPHA,
        k=k,
        seed=42,
        use64=use64,
        noncanonical=noncanon,
        preserve_case=False,
    )
    c = jnp.asarray(chunks)
    h, v = hash_chunk(c, **kw)
    ref = jax.vmap(lambda hh, vv: sketch_ops.sketch_chunk(hh, vv, s=s))(
        h, v
    )
    fast = ps.sketch_chunks_pallas(c, **kw, s=s)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(fast[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(fast[1]))


@pytest.fixture(scope="module")
def dna():
    rng = np.random.default_rng(5)
    return rng.choice(
        np.frombuffer(b"ACGTacgtNN" + bytes([0]), dtype=np.uint8),
        size=(2, 40000),
    )


def test_fused_basic(dna):
    _check(dna, 21, 50, True, False)


def test_fused_noncanonical(dna):
    _check(dna, 21, 50, True, True)


def test_fused_32bit(dna):
    _check(dna, 15, 50, False, False)


def test_fused_k_edges(dna):
    _check(dna, 32, 50, True, False)
    _check(dna, 9, 50, False, False)


def test_fused_fallbacks(dna):
    rep = np.tile(np.frombuffer(b"AT", dtype=np.uint8), 20000)[
        None, :
    ].repeat(2, 0)
    _check(rep, 21, 50, True, False)  # repetitive -> verified fallback
    mix = dna.copy()
    mix[1] = rep[0]
    _check(mix, 21, 50, True, False)
    _check(np.zeros((2, 40000), np.uint8), 21, 50, True, False)
