"""Fuzz tally_shared against a literal transcription of the
reference's summing loop (CommandScreen.cpp:330-355) — tests-only
parity oracle, same practice as test_screen_wta.py / test_bloom_oracle.

The reference iterates a hash->count map; for each hash whose count
reaches minCov, every reference containing it gains one shared hash
and appends the hash's depth. Our vectorized version must produce the
same shared counts and the same depth MULTISETS (the reference's
robin_hood iteration order is unspecified, and the consumer takes a
median, so order is immaterial — sorted comparison pins exactly what
matters)."""

import numpy as np

from mash_tpu.ops.screen_ops import build_db_table, tally_shared


def _reference_tally(hash_counts, hash_table, n_refs, min_cov):
    # literal transcription of CommandScreen.cpp:337-354
    shared = [0] * n_refs
    depths = [[] for _ in range(n_refs)]
    for h, count in hash_counts.items():
        if count >= min_cov:
            for k in hash_table[h]:
                shared[k] += 1
                depths[k].append(count)
    return shared, depths


def test_tally_shared_fuzz_vs_transcription():
    rng = np.random.default_rng(17)
    for trial in range(25):
        n_refs = int(rng.integers(1, 9))
        lists = []
        for _ in range(n_refs):
            size = int(rng.integers(0, 40))
            lists.append(
                np.unique(
                    rng.integers(0, 60, size=size, dtype=np.int64)
                ).astype(np.uint64)
            )
        db, seg_starts, ref_ids = build_db_table(lists)
        counts = rng.integers(
            0, 6, size=len(db), dtype=np.int64
        ).astype(np.uint32)
        min_cov = int(rng.integers(1, 4))

        got_shared, got_depths = tally_shared(
            counts, seg_starts, ref_ids, n_refs, min_cov
        )

        hash_table = {}
        for r, lst in enumerate(lists):
            for h in lst:
                hash_table.setdefault(int(h), []).append(r)
        hash_counts = {
            int(h): int(c) for h, c in zip(db, counts) if c > 0
        }
        exp_shared, exp_depths = _reference_tally(
            hash_counts, hash_table, n_refs, min_cov
        )

        assert list(got_shared) == exp_shared, trial
        for r in range(n_refs):
            assert sorted(got_depths[r].tolist()) == sorted(
                exp_depths[r]
            ), (trial, r)
