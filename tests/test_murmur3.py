"""MurmurHash3 correctness: scalar oracle vs vectorized numpy/JAX paths.

End-to-end hash correctness against the reference binary is pinned by the
golden-sketch parity tests (test_golden_parity.py), which would fail for any
algorithmic deviation; these tests pin internal consistency and known
structural properties.
"""

import numpy as np
import pytest

from mash_tpu.hashing.murmur3 import (
    mmh3_x64_128_py,
    mmh3_words_x64_128,
    hash_kmer_py,
)


def _pack_words(data: bytes) -> list:
    padded = data.ljust(-(-len(data) // 8) * 8, b"\0")
    return [
        np.uint64(int.from_bytes(padded[i : i + 8], "little"))
        for i in range(0, len(padded), 8)
    ]


def test_empty_seed0_is_zero():
    # No blocks, no tail, len 0: both lanes collapse to fmix(0) == 0.
    assert mmh3_x64_128_py(b"", 0) == (0, 0)


@pytest.mark.parametrize("seed", [0, 42, 0xFFFFFFFF])
@pytest.mark.parametrize("length", list(range(1, 33)))
def test_words_matches_oracle_numpy(length, seed):
    rng = np.random.default_rng(1234 + length)
    for _ in range(8):
        data = rng.integers(0, 256, size=length, dtype=np.uint8).tobytes()
        h1, h2 = mmh3_x64_128_py(data, seed)
        w = _pack_words(data)
        v1, v2 = mmh3_words_x64_128(w, length, np.uint64(seed), xp=np)
        assert int(v1) == h1
        assert int(v2) == h2


def test_words_matches_oracle_jax():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    for length in (5, 8, 16, 21, 31, 32):
        datas = [
            rng.integers(0, 256, size=length, dtype=np.uint8).tobytes()
            for _ in range(64)
        ]
        nwords = -(-length // 8)
        cols = [
            jnp.asarray(
                [_pack_words(d)[m] for d in datas], dtype=jnp.uint64
            )
            for m in range(nwords)
        ]
        h1, h2 = mmh3_words_x64_128(cols, length, jnp.uint64(42), xp=jnp)
        for i, d in enumerate(datas):
            e1, e2 = mmh3_x64_128_py(d, 42)
            assert int(h1[i]) == e1
            assert int(h2[i]) == e2


def test_hash_kmer_width():
    h64 = hash_kmer_py(b"ACGTACGTACGTACGTACGTA", 42, True)
    h32 = hash_kmer_py(b"ACGTACGTACGTACGTACGTA", 42, False)
    assert h32 == h64 & 0xFFFFFFFF
    assert h64 > 0xFFFFFFFF  # overwhelmingly likely for a 64-bit hash


def test_avalanche_sanity():
    # Flipping one input bit should flip ~half the output bits.
    a = b"ACGTACGTACGTACGTACGTA"
    b = b"CCGTACGTACGTACGTACGTA"
    ha, _ = mmh3_x64_128_py(a, 42)
    hb, _ = mmh3_x64_128_py(b, 42)
    assert 16 <= bin(ha ^ hb).count("1") <= 48
