"""Device k-mer pipeline vs the reference-semantics Python oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from mash_tpu.core.params import default_nucleotide_params
from mash_tpu.ops.kmers import (
    alphabet_bytes,
    hash_chunk,
    hash_sequence_py,
)


def _device_hashes(seq: bytes, params):
    arr = jnp.asarray(np.frombuffer(seq, dtype=np.uint8))
    h, v = hash_chunk(
        arr,
        alphabet=alphabet_bytes(params.alphabet),
        k=params.kmer_size,
        seed=params.seed,
        use64=params.use64,
        noncanonical=params.noncanonical,
        preserve_case=params.preserve_case,
    )
    h = np.asarray(h)
    v = np.asarray(v)
    return [int(h[i]) for i in range(len(h)) if v[i]]


def _random_dna(rng, n, lower=False, with_bad=False):
    chars = b"ACGT"
    s = bytes(rng.choice(list(chars), size=n))
    if lower:
        s = bytes(
            c + 32 if rng.random() < 0.3 and 65 <= c <= 90 else c for c in s
        )
    if with_bad:
        s = bytearray(s)
        for _ in range(max(1, n // 50)):
            s[rng.integers(0, n)] = ord("N")
        s = bytes(s)
    return s


@pytest.mark.parametrize("k", [4, 9, 16, 21, 31, 32])
def test_matches_oracle_canonical(k):
    rng = np.random.default_rng(k)
    params = default_nucleotide_params(kmer_size=k)
    params.set_alphabet("ACGT")
    seq = _random_dna(rng, 300)
    assert _device_hashes(seq, params) == hash_sequence_py(seq, params)


def test_matches_oracle_with_bad_chars_and_case():
    rng = np.random.default_rng(99)
    params = default_nucleotide_params()
    seq = _random_dna(rng, 500, lower=True, with_bad=True)
    assert _device_hashes(seq, params) == hash_sequence_py(seq, params)


def test_matches_oracle_noncanonical():
    rng = np.random.default_rng(5)
    params = default_nucleotide_params(kmer_size=15)
    params.noncanonical = True
    params.set_alphabet("ACGT")
    seq = _random_dna(rng, 300)
    assert _device_hashes(seq, params) == hash_sequence_py(seq, params)


def test_matches_oracle_protein():
    from mash_tpu.core.params import ALPHABET_PROTEIN

    rng = np.random.default_rng(6)
    params = default_nucleotide_params(kmer_size=9)
    params.noncanonical = True
    params.set_alphabet(ALPHABET_PROTEIN)
    assert params.use64
    seq = bytes(rng.choice(list(ALPHABET_PROTEIN.encode()), size=200))
    assert _device_hashes(seq, params) == hash_sequence_py(seq, params)


def test_32bit_mode():
    rng = np.random.default_rng(8)
    params = default_nucleotide_params(kmer_size=12)
    params.set_alphabet("ACGT")
    assert not params.use64  # 4^12 < 2^32
    seq = _random_dna(rng, 200)
    hashes = _device_hashes(seq, params)
    assert hashes == hash_sequence_py(seq, params)
    assert all(h <= 0xFFFFFFFF for h in hashes)


def test_separator_masks_windows():
    params = default_nucleotide_params(kmer_size=5)
    left = b"ACGTACGTA"
    right = b"TTTTGGGGC"
    joint = left + b"\x00" + right
    got = _device_hashes(joint, params)
    want = hash_sequence_py(left, params) + hash_sequence_py(right, params)
    assert got == want
