"""``screen -w`` winner-take-all reallocation vs a transcribed oracle.

The oracle is a literal, tests-only transcription of the reference's
reallocation loop (``/root/reference/src/mash/CommandScreen.cpp:
357-407``): per shared hash, the winning reference maximizes
``(score, length)`` with strict ``>`` comparisons in entry-iteration
order (the first entry wins full ties).
"""

from __future__ import annotations

import numpy as np
import pytest

from mash_tpu.ops.screen_ops import winner_takes_all


def _wta_oracle(counts, seg_starts, ref_ids, scores, lengths, min_cov):
    """Literal transcription of the reallocation loop."""
    n_refs = len(scores)
    shared = np.zeros(n_refs, dtype=np.int64)
    depths = [[] for _ in range(n_refs)]
    for h in range(len(counts)):
        if counts[h] < min_cov:
            continue
        entries = ref_ids[seg_starts[h] : seg_starts[h + 1]]
        max_score = 0.0
        max_length = 0
        max_index = None
        for r in entries:
            if scores[r] > max_score:
                max_score = scores[r]
                max_index = int(r)
                max_length = lengths[r]
            elif scores[r] == max_score and lengths[r] > max_length:
                max_index = int(r)
                max_length = lengths[r]
        if max_index is not None:
            shared[max_index] += 1
            depths[max_index].append(int(counts[h]))
    return shared, [np.array(d, dtype=np.int64) for d in depths]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("min_cov", [1, 2])
def test_wta_matches_transcription(seed, min_cov):
    rng = np.random.default_rng(seed)
    n_refs = 7
    n_hashes = 400
    # CSR: each hash belongs to 1-4 references
    seg_len = rng.integers(1, 5, size=n_hashes)
    seg_starts = np.concatenate([[0], np.cumsum(seg_len)])
    ref_ids = np.concatenate(
        [
            rng.choice(n_refs, size=m, replace=False)
            for m in seg_len
        ]
    ).astype(np.int64)
    counts = rng.integers(0, 4, size=n_hashes).astype(np.int64)
    # deliberately create score ties (quantized scores) and length ties
    scores = rng.integers(0, 4, size=n_refs).astype(np.float64) / 4.0
    lengths = rng.integers(1, 4, size=n_refs).astype(np.int64) * 1000

    got_shared, got_depths = winner_takes_all(
        counts, seg_starts, ref_ids, scores, lengths, min_cov
    )
    exp_shared, exp_depths = _wta_oracle(
        counts, seg_starts, ref_ids, scores, lengths, min_cov
    )
    np.testing.assert_array_equal(got_shared, exp_shared)
    for r in range(n_refs):
        np.testing.assert_array_equal(
            np.sort(got_depths[r]), np.sort(exp_depths[r])
        )


def test_wta_all_zero_scores():
    """scores all 0: the oracle's strict > never fires (max_index stays
    None unless a length tie-break... it doesn't — score 0 == max_score
    0 initially but max_length 0 < any length picks an index).  Pin
    whatever the transcription does."""
    counts = np.array([2, 1], dtype=np.int64)
    seg_starts = np.array([0, 2, 3])
    ref_ids = np.array([0, 1, 1], dtype=np.int64)
    scores = np.zeros(2)
    lengths = np.array([500, 900], dtype=np.int64)
    got = winner_takes_all(
        counts, seg_starts, ref_ids, scores, lengths, 1
    )
    exp = _wta_oracle(counts, seg_starts, ref_ids, scores, lengths, 1)
    np.testing.assert_array_equal(got[0], exp[0])
