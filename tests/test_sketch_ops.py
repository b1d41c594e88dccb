"""Bottom-s sketch ops vs brute-force selection."""

import numpy as np
import jax.numpy as jnp

from mash_tpu.ops import sketch_ops


def _brute_bottom_s(values, s):
    from collections import Counter

    cnt = Counter(values)
    keys = sorted(cnt)[:s]
    return keys, [cnt[k] for k in keys]


def _unpack(state, s):
    h, c = state
    h = np.asarray(h)
    c = np.asarray(c)
    n = int((c > 0).sum())
    return list(h[:n].astype(np.uint64)), list(c[:n])


def test_sketch_chunk_basic():
    rng = np.random.default_rng(0)
    s = 16
    vals = rng.integers(0, 50, size=300).astype(np.uint64)
    valid = rng.random(300) < 0.8
    state = sketch_ops.sketch_chunk(
        jnp.asarray(vals), jnp.asarray(valid), s=s
    )
    keys, counts = _brute_bottom_s(vals[valid].tolist(), s)
    gh, gc = _unpack(state, s)
    assert [int(x) for x in gh] == keys
    assert [int(x) for x in gc] == counts


def test_sketch_chunk_fewer_than_s():
    s = 32
    vals = np.array([5, 5, 7, 9], dtype=np.uint64)
    valid = np.array([True, True, True, False])
    state = sketch_ops.sketch_chunk(
        jnp.asarray(vals), jnp.asarray(valid), s=s
    )
    gh, gc = _unpack(state, s)
    assert [int(x) for x in gh] == [5, 7]
    assert [int(x) for x in gc] == [2, 1]


def test_merge_matches_whole():
    rng = np.random.default_rng(1)
    s = 20
    a = rng.integers(0, 1000, size=500).astype(np.uint64)
    b = rng.integers(0, 1000, size=700).astype(np.uint64)
    sa = sketch_ops.sketch_chunk(
        jnp.asarray(a), jnp.ones(len(a), bool), s=s
    )
    sb = sketch_ops.sketch_chunk(
        jnp.asarray(b), jnp.ones(len(b), bool), s=s
    )
    merged = sketch_ops.merge_states(sa, sb, s=s)
    keys, _ = _brute_bottom_s(np.concatenate([a, b]).tolist(), s)
    gh, gc = _unpack(merged, s)
    assert [int(x) for x in gh] == keys
    # Counts are exact when every surviving hash stayed within bottom-s of
    # its own chunk; verify against per-chunk-truncated expectation instead.
    ka, ca = _brute_bottom_s(a.tolist(), s)
    kb, cb = _brute_bottom_s(b.tolist(), s)
    expect = {}
    for k, c in zip(ka, ca):
        expect[k] = expect.get(k, 0) + c
    for k, c in zip(kb, cb):
        expect[k] = expect.get(k, 0) + c
    assert [int(x) for x in gc] == [expect[k] for k in keys]


def test_merge_associative_commutative():
    rng = np.random.default_rng(2)
    s = 8
    chunks = [
        rng.integers(0, 200, size=100).astype(np.uint64) for _ in range(4)
    ]
    states = [
        sketch_ops.sketch_chunk(jnp.asarray(c), jnp.ones(len(c), bool), s=s)
        for c in chunks
    ]
    ab = sketch_ops.merge_states(states[0], states[1], s=s)
    cd = sketch_ops.merge_states(states[2], states[3], s=s)
    left = sketch_ops.merge_states(ab, cd, s=s)
    acc = states[3]
    for st in states[2::-1]:
        acc = sketch_ops.merge_states(st, acc, s=s)
    np.testing.assert_array_equal(np.asarray(left[0]), np.asarray(acc[0]))
    np.testing.assert_array_equal(np.asarray(left[1]), np.asarray(acc[1]))


def test_empty_state_identity():
    s = 10
    e = sketch_ops.empty_state(s)
    vals = np.array([3, 1, 2], dtype=np.uint64)
    st = sketch_ops.sketch_chunk(jnp.asarray(vals), jnp.ones(3, bool), s=s)
    m = sketch_ops.merge_states(e, st, s=s)
    np.testing.assert_array_equal(np.asarray(m[0]), np.asarray(st[0]))
    np.testing.assert_array_equal(np.asarray(m[1]), np.asarray(st[1]))


def test_estimators():
    s = 4
    # distinct hashes 10,20,30,40 with counts 2 each
    vals = np.repeat(np.array([10, 20, 30, 40], dtype=np.uint64), 2)
    st = sketch_ops.sketch_chunk(jnp.asarray(vals), jnp.ones(8, bool), s=s)
    assert sketch_ops.estimate_multiplicity(st) == 2.0
    est = sketch_ops.estimate_set_size(st)
    assert est == (2.0 ** 64) * 4 / 40.0


def test_sentinel_valued_hash_keeps_prefix_invariant():
    """A real hash equal to the empty-slot sentinel (2^64-1) must keep
    its count in the first slot of its run, so the count>0 entries form
    a sorted prefix (state_to_ref slices h[:n])."""
    import jax.numpy as jnp

    h = np.array(
        [5, 7, 0xFFFFFFFFFFFFFFFF, 7, 5], dtype=np.uint64
    )
    v = np.ones(5, dtype=bool)
    sh, sc = sketch_ops.sketch_chunk_batch(
        jnp.asarray(h)[None], jnp.asarray(v)[None], s=10, use64=True
    )
    counts = np.asarray(sc[0])
    hashes = np.asarray(sh[0])
    n = int((counts > 0).sum())
    assert n == 3
    np.testing.assert_array_equal(
        hashes[:n],
        np.array([5, 7, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64),
    )
    np.testing.assert_array_equal(counts[:n], [2, 2, 1])
    assert (counts[n:] == 0).all()
