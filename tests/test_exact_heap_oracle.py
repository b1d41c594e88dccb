"""Native ExactHeap vs a literal transcription of MinHashHeap::tryInsert.

The reads-mode filters (-m min-copy pending gate, eviction-time zombie
purge, boundary-equal-to-top rejection) are stream-order dependent, so
the native heap must match the reference *exactly*, not just produce the
same final set.  This transcribes ``src/mash/MinHashHeap.cpp:68-146``
(without the Bloom branch, which is probabilistic) and fuzzes adversarial
streams against it.
"""

import heapq

import numpy as np
import pytest

from mash_tpu.native import ExactHeap


class OracleHeap:
    """Literal MinHashHeap transcription (min_cov gate, no bloom)."""

    def __init__(self, cap, min_cov):
        self.cap = cap
        self.min_cov = min_cov
        self.hashes = {}          # hash -> count (the kept set)
        self.queue = []           # max-heap of kept hashes (negated)
        self.pending = {}         # hash -> count (< min_cov so far)
        self.queue_pending = []   # max-heap of pending hashes (negated)
        self.multiplicity_sum = 0

    def _top(self):
        return -self.queue[0]

    def try_insert(self, h):
        if not (len(self.hashes) < self.cap or h < self._top()):
            return
        if h not in self.hashes:
            if self.min_cov == 1 or self.pending.get(h, 0) == self.min_cov - 1:
                self.hashes[h] = self.min_cov
                heapq.heappush(self.queue, -h)
                self.multiplicity_sum += self.min_cov
                if self.min_cov > 1:
                    self.pending.pop(h, None)
            else:
                if h not in self.pending:
                    heapq.heappush(self.queue_pending, -h)
                self.pending[h] = self.pending.get(h, 0) + 1
        else:
            self.hashes[h] += 1
            self.multiplicity_sum += 1

        if len(self.hashes) > self.cap:
            top = self._top()
            self.multiplicity_sum -= self.hashes.pop(top)
            # zombie purge compares against the EVICTED top (the queue
            # is popped only afterwards, MinHashHeap.cpp:126-144)
            while self.queue_pending and top < -self.queue_pending[0]:
                p = -heapq.heappop(self.queue_pending)
                self.pending.pop(p, None)
            heapq.heappop(self.queue)

    def result(self):
        hs = sorted(self.hashes)
        return hs, [self.hashes[h] for h in hs]


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_vs_reference_transcription(seed):
    rng = np.random.default_rng(seed)
    cap = int(rng.integers(1, 12))
    min_cov = int(rng.integers(1, 4))
    # small universe -> heavy duplication, boundary ties, pending churn
    stream = rng.integers(0, 40, size=600, dtype=np.uint64) * np.uint64(
        0x9E3779B97F4A7C15
    ) >> np.uint64(30)

    oracle = OracleHeap(cap, min_cov)
    for h in stream:
        oracle.try_insert(int(h))
    want_h, want_c = oracle.result()

    heap = ExactHeap(cap, min_cov, 0, True)
    heap.insert(np.asarray(stream, dtype=np.uint64))
    got_h, got_c = heap.extract()
    order = np.argsort(np.asarray(got_h, dtype=np.uint64), kind="stable")
    got_h = list(np.asarray(got_h, dtype=np.uint64)[order])
    got_c = list(np.asarray(got_c)[order])
    assert [int(x) for x in got_h] == want_h, (cap, min_cov)
    assert [int(x) for x in got_c] == want_c, (cap, min_cov)
