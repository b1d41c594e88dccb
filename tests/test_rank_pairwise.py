"""Rank-compressed single-plane pairwise kernel parity."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from mash_tpu.ops.distance import (
    EMPTY,
    pad_sketches,
    pairwise_common_denom,
    rank_compress,
)
from mash_tpu.ops.pallas_pairwise import pairwise_common_denom_keys32


def _rand_sketches(rng, n, s, width, shared_frac=0.3):
    base = np.sort(
        rng.integers(0, 2**63, size=4 * s, dtype=np.int64).astype(
            np.uint64
        )
    )
    out = []
    for i in range(n):
        m = rng.integers(s // 2, s + 1)
        take = rng.choice(len(base), size=m, replace=False)
        h = base[take]
        priv = rng.random(m) < (1 - shared_frac)
        h[priv] = rng.integers(
            0, 2**63, size=int(priv.sum()), dtype=np.int64
        ).astype(np.uint64)
        out.append(np.unique(h))
    return pad_sketches(out, width)


def test_rank_compress_preserves_order_and_equality():
    rng = np.random.default_rng(3)
    H, N = _rand_sketches(rng, 6, 50, 64)
    Kq, Kr = rank_compress(jnp.asarray(H), jnp.asarray(H))
    kq = np.asarray(Kq)
    flat_h = H.reshape(-1)
    flat_k = kq.reshape(-1)
    # pads map to the uint32 sentinel
    assert (flat_k[flat_h == np.uint64(EMPTY)] == 0xFFFFFFFF).all()
    real = flat_h != np.uint64(EMPTY)
    hs = flat_h[real]
    ks = flat_k[real]
    order = np.argsort(hs, kind="stable")
    assert (np.diff(ks[order]) >= 0).all()
    same = hs[order][1:] == hs[order][:-1]
    assert (np.diff(ks[order])[same] == 0).all()
    assert (np.diff(ks[order])[~same] > 0).all()
    # both halves rank identically
    np.testing.assert_array_equal(np.asarray(Kr), kq)


@pytest.mark.parametrize("s,width", [(40, 64), (100, 160)])
def test_ranked_keys32_matches_reference_kernel(s, width):
    rng = np.random.default_rng(11)
    qh, qn = _rand_sketches(rng, 10, s, width)
    rh, rn = _rand_sketches(rng, 12, s, width)
    # plant exact duplicates across the sets
    rh[0, :20] = qh[0, :20]
    rh[0] = np.sort(rh[0])
    cap = s

    c0, d0 = pairwise_common_denom(
        jnp.asarray(qh), jnp.asarray(qn), jnp.asarray(rh),
        jnp.asarray(rn), cap=cap,
    )
    Kq, Kr = rank_compress(jnp.asarray(qh), jnp.asarray(rh))
    c1, d1 = pairwise_common_denom_keys32(
        Kq, jnp.asarray(qn), Kr, jnp.asarray(rn), cap=cap
    )
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
