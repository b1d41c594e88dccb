"""Windowed-minmer semantics pinned to the reference algorithm.

``_reference_get_min_hash_positions`` below is a deliberate, literal
transcription of the reference's rolling windowed-minmer algorithm
(``getMinHashPositions``, ``/root/reference/src/mash/Sketch.cpp:585-895``)
operating at the hash-array level (the reference hashes *every* kmer in
windowed mode — its invalid-kmer skip is disabled, ``Sketch.cpp:650-668``
— so ``hashes[i]`` stands in for ``getHash(seq + i, ...)`` exactly).
TESTS-ONLY: like the heap/Bloom/merge-walk oracles, this transcription
exists so the shipped implementations (`native mash_minmers` sweep and
``py_minmers``) are pinned to the reference's semantics rather than to
the builder's interpretation of them.  The intricate bits it preserves:

- ``maxMinmer`` tracks the mins-th smallest distinct hash (an iterator,
  here the key itself; ``None`` is ``end()``), decremented when a new
  key lands strictly before it or when the map first reaches ``mins``;
- repeat candidate promotion at eviction (``Sketch.cpp:772-786``): when
  the leftmost occurrence of a repeated hash leaves the window, the next
  occurrence is marked iff the key is within the current bottom set;
- boundary movement on singleton eviction (``Sketch.cpp:787-806``):
  ``maxMinmer`` advances and the *new* boundary key's front is marked;
- the first-complete-window sweep (``Sketch.cpp:808-823``) and the
  new-kmer marking gate ``i >= windowSize`` (``Sketch.cpp:825-831``);
- final drain emission order (``Sketch.cpp:857-880``).
"""

from __future__ import annotations

import bisect

import numpy as np
import pytest

from mash_tpu.native import load_library, minmer_positions
from mash_tpu.native.pyheap import py_minmers


class _Locus:
    __slots__ = ("position", "is_minmer")

    def __init__(self, position):
        self.position = position
        self.is_minmer = False


def _reference_get_min_hash_positions(hashes, window_size, mins):
    """Literal transcription of Sketch.cpp:585-895 (see module doc)."""
    hs = [int(h) for h in np.asarray(hashes, dtype=np.uint64)]
    n = len(hs)
    position_hashes = []
    if n == 0:
        return position_hashes
    if window_size > n:
        window_size = n

    keys = []            # sorted distinct hashes (the map's key order)
    candidates = {}      # hash -> list of _Locus (the deques)
    window_queue = []    # pushed keys, FIFO (all kmers valid here)
    qhead = 0
    max_minmer = None    # None == candidatesByHash.end()

    def _pred(key):
        # --iterator: predecessor key (from end(): the last key)
        if key is None:
            return keys[-1]
        return keys[bisect.bisect_left(keys, key) - 1]

    def _succ(key):
        # ++iterator: successor key (possibly end())
        j = bisect.bisect_right(keys, key)
        return keys[j] if j < len(keys) else None

    for i in range(n):
        h = hs[i]
        inserted = h not in candidates
        if inserted:
            bisect.insort(keys, h)
            candidates[h] = []
        new_candidates = h
        candidates[h].append(_Locus(i))

        if inserted and (
            (max_minmer is None and len(keys) == mins)
            or (max_minmer is not None and h < max_minmer)
        ):
            max_minmer = _pred(max_minmer)

        window_queue.append(new_candidates)

        window_front = None
        if len(window_queue) - qhead > window_size:
            window_front = window_queue[qhead]
            qhead += 1

        if window_front is not None:
            front_candidates = candidates[window_front]
            if front_candidates[0].is_minmer:
                position_hashes.append(
                    (front_candidates[0].position, window_front)
                )
            if len(front_candidates) > 1:
                front_candidates.pop(0)
                # repeated hash: promote the new leftmost occurrence
                if max_minmer is None or (
                    i >= window_size and window_front <= max_minmer
                ):
                    front_candidates[0].is_minmer = True
            else:
                if max_minmer is not None and window_front <= max_minmer:
                    max_minmer = _succ(max_minmer)
                    if max_minmer is not None:
                        candidates[max_minmer][0].is_minmer = True
                keys.remove(window_front)
                del candidates[window_front]

        if i == window_size - 1:
            # first complete window; mark min-hashes
            for k in keys:
                if k == max_minmer:
                    break
                candidates[k][0].is_minmer = True
            if max_minmer is not None:
                candidates[max_minmer][0].is_minmer = True

        # mark the just-pushed candidate if within the bottom set
        if i >= window_size and (
            max_minmer is None or new_candidates <= max_minmer
        ):
            candidates[new_candidates][0].is_minmer = True

    # finalize remaining min-hashes from the last window
    while qhead < len(window_queue):
        window_front = window_queue[qhead]
        qhead += 1
        front_candidates = candidates.get(window_front)
        if front_candidates:
            if front_candidates[0].is_minmer:
                position_hashes.append(
                    (front_candidates[0].position, window_front)
                )
            front_candidates.pop(0)

    return position_hashes


def _as_arrays(position_hashes):
    pos = np.array([p for p, _ in position_hashes], dtype=np.uint32)
    hsh = np.array([h for _, h in position_hashes], dtype=np.uint64)
    return pos, hsh


def _check(hashes, window, mins):
    exp = _as_arrays(
        _reference_get_min_hash_positions(hashes, window, mins)
    )
    got_py = py_minmers(np.asarray(hashes, dtype=np.uint64), window, mins)
    np.testing.assert_array_equal(
        got_py[0], exp[0],
        err_msg="py_minmers positions (w=%d mins=%d)" % (window, mins),
    )
    np.testing.assert_array_equal(got_py[1], exp[1])
    if load_library() is not None:
        got = minmer_positions(
            np.asarray(hashes, dtype=np.uint64), window, mins
        )
        np.testing.assert_array_equal(
            got[0], exp[0],
            err_msg="native positions (w=%d mins=%d)" % (window, mins),
        )
        np.testing.assert_array_equal(got[1], exp[1])


def test_simple_distinct():
    _check(np.array([5, 3, 9, 1, 7, 2, 8], dtype=np.uint64), 3, 2)


def test_heavy_repeats_small_alphabet():
    rng = np.random.default_rng(0)
    for trial in range(60):
        n = int(rng.integers(1, 80))
        vals = int(rng.integers(1, 6))  # tiny hash alphabet: many ties
        hashes = rng.integers(0, vals, size=n).astype(np.uint64)
        window = int(rng.integers(1, 12))
        mins = int(rng.integers(1, 6))
        _check(hashes, window, mins)


def test_fuzz_general():
    rng = np.random.default_rng(1)
    for trial in range(120):
        n = int(rng.integers(1, 200))
        # mixed regimes: dense repeats / sparse / unique
        regime = trial % 3
        if regime == 0:
            hashes = rng.integers(0, 10, size=n)
        elif regime == 1:
            hashes = rng.integers(0, max(2, n // 2), size=n)
        else:
            hashes = rng.integers(0, 2**63, size=n)
        hashes = hashes.astype(np.uint64)
        window = int(rng.integers(1, 2 * n + 4))
        mins = int(rng.integers(1, 20))
        _check(hashes, window, mins)


def test_window_geq_n():
    # single full window: plain bottom-mins of distinct hashes,
    # leftmost occurrence each
    h = np.array([4, 2, 4, 9, 2, 1], dtype=np.uint64)
    _check(h, 6, 2)
    _check(h, 100, 2)
    _check(h, 100, 50)  # mins > distinct: everything marked


def test_mins_greater_than_distinct():
    h = np.array([3, 3, 3, 1, 1, 3, 3], dtype=np.uint64)
    for w in (1, 2, 3, 7, 10):
        _check(h, w, 5)


def test_window_one():
    # every position is its window's sole (hence bottom) hash; repeats
    # still emit every position (each window has one occurrence)
    h = np.array([7, 7, 3, 7, 5], dtype=np.uint64)
    _check(h, 1, 1)
    _check(h, 1, 3)


def test_repeat_separated_by_exactly_window():
    # eviction of a repeat's leftmost occurrence in the same step its
    # next occurrence arrives (Sketch.cpp:772-786 promotion path)
    for w in (2, 3, 4):
        h = np.zeros(3 * w + 1, dtype=np.uint64)
        h[:] = np.arange(3 * w + 1) + 100
        h[0] = 1
        h[w] = 1
        h[2 * w] = 1
        _check(h, w, 1)
        _check(h, w, 2)


def test_boundary_movement_on_singleton_eviction():
    # a small hash leaving the window must advance maxMinmer and mark
    # the new boundary key (Sketch.cpp:787-806)
    h = np.array([1, 50, 60, 70, 80, 90, 2, 55], dtype=np.uint64)
    for mins in (1, 2, 3):
        _check(h, 4, mins)


def test_monotone_runs():
    n = 64
    asc = np.arange(n, dtype=np.uint64)
    desc = asc[::-1].copy()
    for w in (1, 5, 16, 63, 64, 65):
        for mins in (1, 3, 8):
            _check(asc, w, mins)
            _check(desc, w, mins)


@pytest.mark.skipif(load_library() is None, reason="native lib needed")
def test_native_large_fuzz():
    rng = np.random.default_rng(2)
    for trial in range(10):
        n = int(rng.integers(500, 3000))
        hashes = rng.integers(
            0, max(4, n // int(rng.integers(1, 20))), size=n
        ).astype(np.uint64)
        window = int(rng.integers(2, 300))
        mins = int(rng.integers(1, 40))
        _check(hashes, window, mins)
