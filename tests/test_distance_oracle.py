"""Pairwise intersection kernels vs a literal reference merge walk.

Transcribes the semantics of ``compareSketches``
(``src/mash/CommandDistance.cpp:336-425``) as a sequential Python walk
and fuzzes both device formulations (the XLA batched sort and, via
``pairwise_common_denom_pallas`` in interpret mode, the Pallas kernel)
against it across ragged sketch sizes and caps — pinning the exact
union-cap/termination behavior, not just the 3-line golden file.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mash_tpu.ops.distance import (
    pairwise_common_denom,
    pad_sketches,
)
from mash_tpu.ops.pallas_pairwise import pairwise_common_denom_pallas


def walk(ref, qry, sketch_size):
    """The reference's merge walk, verbatim semantics."""
    i = j = common = denom = 0
    while denom < sketch_size and i < len(ref) and j < len(qry):
        if ref[i] < qry[j]:
            i += 1
        elif qry[j] < ref[i]:
            j += 1
        else:
            i += 1
            j += 1
            common += 1
        denom += 1
    if denom < sketch_size:
        if i < len(ref):
            denom += len(ref) - i
        if j < len(qry):
            denom += len(qry) - j
        if denom > sketch_size:
            denom = sketch_size
    return common, denom


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_against_reference_walk(seed):
    rng = np.random.default_rng(seed)
    cap = int(rng.integers(5, 60))
    sketches = []
    for _ in range(12):
        m = int(rng.integers(1, cap + 10))
        # small universe -> real overlaps and ties with the cap
        vals = rng.choice(150, size=m, replace=False).astype(np.uint64)
        sketches.append(np.sort(vals * np.uint64(0x9E3779B9) + np.uint64(7))[:cap])
    width = cap
    H, N = pad_sketches(sketches, width)
    args = (jnp.asarray(H), jnp.asarray(N), jnp.asarray(H), jnp.asarray(N))

    want_c = np.zeros((12, 12), np.int32)
    want_d = np.zeros((12, 12), np.int32)
    for a in range(12):
        for b in range(12):
            c, d = walk(sketches[b], sketches[a], cap)
            want_c[a, b] = c
            want_d[a, b] = d

    for fn in (pairwise_common_denom, pairwise_common_denom_pallas):
        got_c, got_d = fn(*args, cap=cap)
        np.testing.assert_array_equal(np.asarray(got_c), want_c, err_msg=fn.__name__)
        np.testing.assert_array_equal(np.asarray(got_d), want_d, err_msg=fn.__name__)
