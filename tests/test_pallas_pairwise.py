"""Pallas pairwise-intersection kernel vs the XLA reference formulation.

On CPU test runs the kernel executes in interpret mode; both paths must
agree bit-for-bit with the XLA batched-sort kernel (which itself is
golden-tested against the reference merge walk of
``src/mash/CommandDistance.cpp:336-425``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mash_tpu.ops.distance import (
    pairwise_common_denom,
    pairwise_common_denom_auto,
)
from mash_tpu.ops.pallas_pairwise import pairwise_common_denom_pallas

EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mk(rng, n, s, universe):
    H = np.full((n, s), EMPTY)
    N = np.zeros(n, np.int32)
    for i in range(n):
        m = int(rng.integers(max(1, s // 2), s + 1))
        vals = rng.choice(universe, size=m, replace=False).astype(np.uint64)
        H[i, :m] = np.sort(vals * np.uint64(0x9E3779B97F4A7C15) >> np.uint64(1))
        N[i] = m
    return H, N


@pytest.mark.parametrize(
    "nq,nr,s,cap",
    [(5, 9, 40, 40), (3, 3, 17, 10), (12, 4, 100, 100), (9, 130, 64, 64)],
)
def test_pallas_matches_xla(nq, nr, s, cap):
    rng = np.random.default_rng(nq * 1000 + nr)
    qh, qn = _mk(rng, nq, s, 3 * s)
    rh, rn = _mk(rng, nr, s, 3 * s)
    args = (jnp.asarray(qh), jnp.asarray(qn), jnp.asarray(rh), jnp.asarray(rn))
    c0, d0 = pairwise_common_denom(*args, cap=cap)
    c1, d1 = pairwise_common_denom_pallas(*args, cap=cap)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


@pytest.mark.parametrize("nq,nr,s,cap", [(5, 9, 40, 40), (12, 4, 100, 100)])
def test_single_plane_32bit_variant(nq, nr, s, cap):
    """use64=False runs the one-plane kernel; results must be identical."""
    rng = np.random.default_rng(nq + nr)

    def mk32(n):
        H = np.full((n, s), EMPTY)
        N = np.zeros(n, np.int32)
        for i in range(n):
            m = int(rng.integers(max(1, s // 2), s + 1))
            vals = rng.choice(3 * s, size=m, replace=False).astype(
                np.uint64
            )
            H[i, :m] = np.sort(
                (vals * np.uint64(2654435761)) % np.uint64(2**32)
            )
            N[i] = m
        return H, N

    qh, qn = mk32(nq)
    rh, rn = mk32(nr)
    args = (jnp.asarray(qh), jnp.asarray(qn), jnp.asarray(rh), jnp.asarray(rn))
    c0, d0 = pairwise_common_denom(*args, cap=cap)
    c1, d1 = pairwise_common_denom_pallas(*args, cap=cap, use64=False)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


def test_auto_dispatch_agrees():
    rng = np.random.default_rng(0)
    qh, qn = _mk(rng, 6, 50, 120)
    args = (jnp.asarray(qh), jnp.asarray(qn), jnp.asarray(qh), jnp.asarray(qn))
    c0, d0 = pairwise_common_denom(*args, cap=50)
    c1, d1 = pairwise_common_denom_auto(*args, cap=50)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    # self-comparison: diagonal intersection is complete
    assert (np.diag(np.asarray(c0)) == qn).all()
