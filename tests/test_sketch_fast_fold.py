"""Hierarchical fast bottom-s fold vs the full-sort reference fold.

``sketch_chunk_batch`` must be bit-identical to ``vmap(sketch_chunk)``
for every input: the fast path carries a per-row exactness certificate
and falls back to the sort path otherwise (see
``mash_tpu/ops/sketch_ops.py``).  These cases cover the certificate's
edge conditions: heavy duplication (forced fallback), subrow bursts,
pad-region index clamping, tie-heavy keys, and 32-bit hash mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mash_tpu.ops import sketch_ops

B, N, S = 3, 50001, 100  # N > 4*4096 exercises the fast path + padding


def _assert_same(h, v, s, use64=True):
    h = jnp.asarray(h)
    v = jnp.asarray(v)
    ref = jax.vmap(lambda a, b: sketch_ops.sketch_chunk(a, b, s=s))(h, v)
    fast = sketch_ops.sketch_chunk_batch(h, v, s=s, use64=use64)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(fast[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(fast[1]))


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(3)


def test_random(rng):
    h = rng.integers(0, 2**63, size=(B, N), dtype=np.int64).astype(np.uint64)
    v = rng.random((B, N)) < 0.9
    _assert_same(h, v, S)


def test_heavy_duplicates_fallback(rng):
    h = (
        rng.integers(0, 30, size=(B, N), dtype=np.int64).astype(np.uint64)
        << np.uint64(32)
    ) + np.uint64(7)
    v = rng.random((B, N)) < 0.9
    _assert_same(h, v, S)


def test_subrow_burst(rng):
    h = rng.integers(0, 2**63, size=(B, N), dtype=np.int64).astype(np.uint64)
    h[0, 100:600] = np.uint64(12345)  # 500 copies inside one subrow
    v = rng.random((B, N)) < 0.9
    _assert_same(h, v, S)


def test_mostly_and_all_invalid(rng):
    h = rng.integers(0, 2**63, size=(B, N), dtype=np.int64).astype(np.uint64)
    _assert_same(h, rng.random((B, N)) < 0.001, S)
    _assert_same(h, np.zeros((B, N), bool), S)


def test_tail_only_valid(rng):
    # valid elements adjacent to the padded final subrow: exercises the
    # pad-index clamp masking
    h = rng.integers(0, 2**63, size=(B, N), dtype=np.int64).astype(np.uint64)
    v = np.zeros((B, N), bool)
    v[:, -5:] = True
    _assert_same(h, v, S)


def test_32bit_mode(rng):
    h = rng.integers(0, 2**32, size=(B, N), dtype=np.int64).astype(np.uint64)
    v = rng.random((B, N)) < 0.9
    _assert_same(h, v, S, use64=False)


def test_hi_key_ties(rng):
    h = (np.uint64(5) << np.uint64(32)) | rng.integers(
        0, 2**31, size=(B, N), dtype=np.int64
    ).astype(np.uint64)
    v = rng.random((B, N)) < 0.9
    _assert_same(h, v, S)
