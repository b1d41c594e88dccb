"""Containment kernel vs a literal reference walk (``containSketches``).

Transcribes ``src/mash/CommandContain.cpp:231-263``: reference-side
advances are budget-free (``steps--``), query advances and matches
consume budget ``denom = min(|ref|, |qry|)``, and the loop also ends
when the reference list is exhausted.  Score = common / consumed,
error = 1/sqrt(consumed).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mash_tpu.ops.distance import pad_sketches, pairwise_containment


def walk(ref, qry):
    common = 0
    denom = min(len(ref), len(qry))
    i = j = 0
    steps = 0
    while steps < denom and i < len(ref):
        if ref[i] < qry[j]:
            i += 1
        elif qry[j] < ref[i]:
            j += 1
            steps += 1
        else:
            i += 1
            j += 1
            common += 1
            steps += 1
    return common, j


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_against_reference_walk(seed):
    rng = np.random.default_rng(100 + seed)
    n = 10
    sketches = []
    for _ in range(n):
        m = int(rng.integers(1, 40))
        vals = rng.choice(120, size=m, replace=False).astype(np.uint64)
        sketches.append(np.sort(vals * np.uint64(0x9E3779B9) + np.uint64(3)))
    width = max(len(s) for s in sketches)
    H, N = pad_sketches(sketches, width)
    common, consumed = pairwise_containment(
        jnp.asarray(H), jnp.asarray(N), jnp.asarray(H), jnp.asarray(N)
    )
    common = np.asarray(common)
    consumed = np.asarray(consumed)
    for qi in range(n):
        for ri in range(n):
            c, j = walk(sketches[ri], sketches[qi])
            assert common[qi, ri] == c, (qi, ri)
            assert consumed[qi, ri] == j, (qi, ri)
