"""Differential test: native -b Bloom vs a literal Partow oracle.

``PartowOracle`` below is a tests-only direct transcription of the
relevant logic of the reference's vendored Open Bloom Filter
(``/root/reference/src/mash/bloom_filter.hpp``): the general
``generate_unique_salt`` + ``hash_ap`` + ``compute_indices`` over
arbitrary byte keys and salt counts, plus the parameter optimizer with
the degenerate fpp=0 inputs the reference uses
(``MinHashHeap.cpp:25-41``).  The shipped filter
(``native/mash_native.cpp`` Bloom, ``pyheap.PyBloom``) implements the
*analyzed closed form* (one salt, memoryBound*8 bits); this fuzz proves
the two agree bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mash_tpu.native import load_library
from mash_tpu.native.pyheap import PyBloom

M32 = 0xFFFFFFFF

# first entries of the vendored predef_salt table (bloom_filter.hpp)
PREDEF_SALT = [
    0xAAAAAAAA, 0x55555555, 0x33333333, 0xCCCCCCCC,
    0x66666666, 0x99999999, 0xB5B5B5B5, 0x4B4B4B4B,
]


class PartowOracle:
    """Literal transcription (tests only, never shipped)."""

    def __init__(self, projected: int, fpp: float, maximum_size: int):
        # compute_optimal_parameters (bloom_filter.hpp:107-156)
        min_m = math.inf
        min_k = 0.0
        k = 1.0
        while k < 1000.0:
            numerator = -k * projected
            denominator = math.log(1.0 - fpp ** (1.0 / k))
            curr_m = (
                numerator / denominator
                if denominator != 0.0
                else -math.inf
            )
            if curr_m < min_m:
                min_m = curr_m
                min_k = k
            k += 1.0
        number_of_hashes = int(min_k)
        # (unsigned long long)(-inf): x86 cvttsd2si out-of-range => 2^63
        table_size = 1 << 63 if min_m == -math.inf else int(min_m)
        if table_size % 8:
            table_size += 8 - table_size % 8
        number_of_hashes = max(1, number_of_hashes)
        table_size = max(1, min(table_size, maximum_size))

        self.salt_count = number_of_hashes
        self.table_size = table_size
        random_seed = 0xA5A5A5A55A5A5A5A
        self.random_seed = (random_seed * 0xA5A5A5A5 + 1) & (2**64 - 1)
        self._generate_unique_salt()
        self.bits = bytearray((table_size + 7) // 8)

    def _generate_unique_salt(self):
        salt = PREDEF_SALT[: self.salt_count]
        n = len(salt)
        for i in range(n):
            salt[i] = (
                salt[i] * salt[(i + 3) % n] + (self.random_seed & M32)
            ) & M32
        self.salt = salt

    @staticmethod
    def hash_ap(data: bytes, h: int) -> int:
        itr = 0
        remaining = len(data)
        loop = 0
        while remaining >= 8:
            i1 = int.from_bytes(data[itr : itr + 4], "little")
            itr += 4
            i2 = int.from_bytes(data[itr : itr + 4], "little")
            itr += 4
            h ^= (
                ((h << 7) & M32)
                ^ ((i1 * (h >> 3)) & M32)
                ^ (~(((h << 11) & M32) + (i2 ^ (h >> 5))) & M32)
            )
            h &= M32
            remaining -= 8
        if remaining >= 4:
            i = int.from_bytes(data[itr : itr + 4], "little")
            if loop & 1:
                h ^= ((h << 7) & M32) ^ ((i * (h >> 3)) & M32)
            else:
                h ^= ~(((h << 11) & M32) + (i ^ (h >> 5))) & M32
            h &= M32
            loop += 1
            itr += 4
            remaining -= 4
        if remaining >= 2:
            i = int.from_bytes(data[itr : itr + 2], "little")
            if loop & 1:
                h ^= ((h << 7) & M32) ^ ((i * (h >> 3)) & M32)
            else:
                h ^= ~(((h << 11) & M32) + (i ^ (h >> 5))) & M32
            h &= M32
            loop += 1
            itr += 2
            remaining -= 2
        if remaining:
            h = (h + ((data[itr] ^ (h * 0xA5A5A5A5)) & M32) + loop) & M32
        return h & M32

    def _indices(self, data: bytes):
        for s in self.salt:
            h = self.hash_ap(data, s)
            bit_index = h % self.table_size
            yield bit_index

    def contains(self, data: bytes) -> bool:
        for bit_index in self._indices(data):
            byte, bit = bit_index // 8, bit_index % 8
            if not (self.bits[byte] >> bit) & 1:
                return False
        return True

    def insert(self, data: bytes) -> None:
        for bit_index in self._indices(data):
            byte, bit = bit_index // 8, bit_index % 8
            self.bits[byte] |= 1 << bit


def _key_bytes(h: int, use64: bool) -> bytes:
    return int(h).to_bytes(8 if use64 else 4, "little")


@pytest.mark.parametrize("use64", [True, False])
def test_pybloom_matches_partow_oracle(use64):
    mem = 4096  # memoryBound bytes
    oracle = PartowOracle(
        projected=1000000000, fpp=0.0, maximum_size=mem * 8
    )
    assert oracle.salt_count == 1
    assert oracle.table_size == mem * 8

    ours = PyBloom(mem, use64)
    assert ours.table_size == oracle.table_size

    rng = np.random.default_rng(31)
    space = 2**64 if use64 else 2**32
    keys = rng.integers(0, space, size=600, dtype=np.uint64)
    for i, kk in enumerate(keys):
        k = int(kk)
        data = _key_bytes(k, use64)
        assert ours.probe(k, insert=False) == oracle.contains(data), i
        if i % 2 == 0:
            oracle.insert(data)
            ours.probe(k, insert=True)
    assert bytes(oracle.bits) == bytes(ours.bits)


@pytest.mark.parametrize("use64", [True, False])
def test_native_bloom_matches_partow_oracle(use64):
    lib = load_library()
    if lib is None:
        pytest.skip("native library unavailable")
    mem = 2048
    oracle = PartowOracle(
        projected=1000000000, fpp=0.0, maximum_size=mem * 8
    )
    b = lib.mash_bloom_create(mem, int(use64))
    try:
        rng = np.random.default_rng(7)
        space = 2**64 if use64 else 2**32
        keys = rng.integers(0, space, size=600, dtype=np.uint64)
        for i, kk in enumerate(keys):
            k = int(kk)
            data = _key_bytes(k, use64)
            assert bool(
                lib.mash_bloom_contains(b, k)
            ) == oracle.contains(data), i
            if i % 3 == 0:
                oracle.insert(data)
                lib.mash_bloom_insert(b, k)
    finally:
        lib.mash_bloom_destroy(b)
