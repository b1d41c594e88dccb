"""Big-DB screen counting tier (Pallas windowed count) parity."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

import jax

from mash_tpu.core.params import default_nucleotide_params
from mash_tpu.ops import screen_ops
from mash_tpu.ops.screen_ops import BigDBCounter, count_db_occurrences

SENT = np.uint64(0xFFFFFFFFFFFFFFFF)


def _expected_counts(db, chunks):
    from collections import Counter

    c = Counter()
    for h, v in chunks:
        for x in h[v]:
            c[int(x)] += 1
    return np.array([c.get(int(x), 0) for x in db], dtype=np.uint32)


@pytest.mark.parametrize("with_sentinel_db", [False, True])
def test_bigdb_counter_matches_reference(with_sentinel_db):
    rng = np.random.default_rng(23)
    H = 2000
    db = np.unique(
        rng.integers(0, 2**63, size=H, dtype=np.int64).astype(
            np.uint64
        )
    )
    if with_sentinel_db:
        db = np.unique(np.concatenate([db, [SENT]]))

    chunk_len = 1 << 12
    chunks = []
    for i in range(5):
        n = chunk_len if i < 3 else chunk_len // 2
        h = rng.integers(0, 2**63, size=n, dtype=np.int64).astype(
            np.uint64
        )
        # plant db values (with repeats)
        take = rng.choice(len(db), size=n // 4)
        h[: n // 4] = db[take]
        if with_sentinel_db:
            h[n // 4 : n // 4 + 7] = SENT
        rng.shuffle(h)
        v = rng.random(n) < 0.8
        chunks.append((h, v))

    params = default_nucleotide_params()
    # real-TPU Mosaic requires (8m, 128) blocks; interpret mode allows
    # smaller shapes that keep CPU runs fast
    tpu = jax.default_backend() == "tpu"
    counter = BigDBCounter(
        params, db, s=100, chunk_len=chunk_len,
        d_tile=1024 if tpu else 256,
        wblk=8 if tpu else 4,
        rw=4,
    )
    for h, v in chunks:
        counter.add(jnp.asarray(h), jnp.asarray(v))
    got = counter.finalize()

    exp = _expected_counts(db, chunks)
    np.testing.assert_array_equal(got, exp)
    if not tpu:
        # the CPU config is tuned so every batch passes the coverage
        # certificate; the TPU config (legal Mosaic block shapes with a
        # tiny H) deliberately trips it, exercising the exact fallback
        assert counter.fallback_count() == 0


def test_bigdb_counter_certificate_fallback():
    """Skewed (non-uniform) hashes break window coverage -> fallback."""
    rng = np.random.default_rng(5)
    H = 1024
    db = np.unique(
        rng.integers(0, 1000, size=H, dtype=np.int64).astype(np.uint64)
    )
    chunk_len = 1 << 12
    # all chunk values inside the tiny db range: every tile's window
    # would need the whole batch
    h = rng.integers(0, 1000, size=chunk_len, dtype=np.int64).astype(
        np.uint64
    )
    v = np.ones(chunk_len, dtype=bool)

    params = default_nucleotide_params()
    tpu = jax.default_backend() == "tpu"
    counter = BigDBCounter(
        params, db, s=100, chunk_len=chunk_len,
        d_tile=1024 if tpu else 256,
        wblk=8 if tpu else 2,
        rw=2,
    )
    counter.add(jnp.asarray(h), jnp.asarray(v))
    got = counter.finalize()
    exp = _expected_counts(db, [(h, v)])
    np.testing.assert_array_equal(got, exp)
    assert counter.fallback_count() >= 1


def test_bigdb_deferred_matches_eager():
    """Deferred (readback-free, on-device cond fallback) and eager
    (per-flush certificate readback) modes count identically on a
    mixed stream containing certificate-tripping batches."""
    rng = np.random.default_rng(31)
    H = 1500
    # dense low range (so a clustered chunk trips coverage) + uniform
    db = np.unique(
        np.concatenate(
            [
                rng.integers(0, 3000, size=400, dtype=np.int64),
                rng.integers(0, 2**63, size=H, dtype=np.int64),
            ]
        ).astype(np.uint64)
    )
    chunk_len = 1 << 12
    chunks = []
    for i in range(6):
        if i == 2:  # pathological: all values in the dense low range
            h = rng.integers(
                0, 3000, size=chunk_len, dtype=np.int64
            ).astype(np.uint64)
        else:
            h = rng.integers(
                0, 2**63, size=chunk_len, dtype=np.int64
            ).astype(np.uint64)
            h[: chunk_len // 4] = db[
                rng.choice(len(db), size=chunk_len // 4)
            ]
        v = rng.random(chunk_len) < 0.9
        chunks.append((h, v))

    params = default_nucleotide_params()
    tpu = jax.default_backend() == "tpu"
    kw = dict(
        s=100, chunk_len=chunk_len,
        d_tile=1024 if tpu else 256,
        wblk=8 if tpu else 2, rw=2,
    )
    results = {}
    fails = {}
    for mode in (True, False):
        counter = BigDBCounter(params, db, deferred=mode, **kw)
        for h, v in chunks:
            counter.add(jnp.asarray(h), jnp.asarray(v))
        results[mode] = counter.finalize()
        fails[mode] = counter.fallback_count()
    exp = _expected_counts(db, chunks)
    np.testing.assert_array_equal(results[True], exp)
    np.testing.assert_array_equal(results[False], exp)
    assert fails[True] >= 1  # the cond exact branch actually ran


def test_bigdb_k_eff_recovers_after_clean_flushes():
    """One pathological batch must not degrade batching permanently:
    after RECOVER_AFTER clean flushes, k_eff doubles back toward K
    (VERDICT r2: a single high-multiplicity region previously pinned
    the stream at per-chunk flushes forever)."""
    rng = np.random.default_rng(11)
    H = 1024
    db = np.unique(
        rng.integers(0, 1000, size=H, dtype=np.int64).astype(np.uint64)
    )
    chunk_len = 1 << 12
    params = default_nucleotide_params()
    tpu = jax.default_backend() == "tpu"
    counter = BigDBCounter(
        params, db, s=100, chunk_len=chunk_len,
        d_tile=1024 if tpu else 256,
        wblk=8 if tpu else 2,
        rw=2,
        deferred=False,  # k_eff adaptation is the eager-mode feature
    )
    counter.K = max(counter.K, 4)  # ensure there is room to recover
    counter.k_eff = counter.K
    k0 = counter.K

    chunks = []

    def feed(h):
        v = np.ones(chunk_len, dtype=bool)
        chunks.append((h, v))
        counter.add(jnp.asarray(h), jnp.asarray(v))

    # pathological batch: all values inside the tiny db range
    bad = rng.integers(0, 1000, size=chunk_len, dtype=np.int64).astype(
        np.uint64
    )
    for _ in range(counter.k_eff):
        feed(bad.copy())
    assert counter._fallbacks >= 1
    assert counter.k_eff < k0
    # then a long clean stream: uniform values (sparse vs the db)
    for _ in range(counter.RECOVER_AFTER * (k0 + 2) * 2):
        good = rng.integers(
            0, 2**63, size=chunk_len, dtype=np.int64
        ).astype(np.uint64)
        feed(good)
        if counter.k_eff == k0:
            break
    assert counter.k_eff == k0, (counter.k_eff, k0)
    got = counter.finalize()
    exp = _expected_counts(db, chunks)
    np.testing.assert_array_equal(got, exp)


def test_bigdb_deferred_compile_failure_falls_back_to_eager():
    """If the deferred one-dispatch flush cannot compile (a TPU
    lowering surprise), the counter degrades to eager per-flush
    certificates instead of failing the stream."""
    rng = np.random.default_rng(41)
    H = 1024
    db = np.unique(
        rng.integers(0, 2**63, size=H, dtype=np.int64).astype(
            np.uint64
        )
    )
    chunk_len = 1 << 12
    params = default_nucleotide_params()
    tpu = jax.default_backend() == "tpu"
    counter = BigDBCounter(
        params, db, s=100, chunk_len=chunk_len,
        d_tile=1024 if tpu else 256,
        wblk=8 if tpu else 4, rw=4, deferred=True,
    )

    def boom():
        def step(*_a, **_k):
            raise RuntimeError("synthetic lowering failure")

        return step

    counter._deferred_step = boom
    chunks = []
    for _ in range(3):
        h = rng.integers(0, 2**63, size=chunk_len, dtype=np.int64
                         ).astype(np.uint64)
        h[:300] = db[rng.choice(len(db), size=300)]
        v = rng.random(chunk_len) < 0.9
        chunks.append((h, v))
        counter.add(jnp.asarray(h), jnp.asarray(v))
    got = counter.finalize()
    assert counter.deferred is False  # degraded, not dead
    exp = _expected_counts(db, chunks)
    np.testing.assert_array_equal(got, exp)


def test_int32_accumulator_saturates_at_wrap_boundary():
    """Big-DB counts saturate at 2^31-1 instead of wrapping negative.

    The reference's uint32 atomics wrap at 2^32 (CommandScreen.h:106);
    our device accumulator is int32 (TPU-native lane width), so without
    saturation >2^31 occurrences of one hash would wrap NEGATIVE and
    the finalize uint32 cast would emit garbage (round-3 verdict #6).
    """
    db = jnp.asarray(np.array([100, 200, 300], dtype=np.uint64))
    imax = np.iinfo(np.int32).max
    counts = jnp.asarray(
        np.array([imax - 1, imax - 3, 5, 0], dtype=np.int32)
    )
    h = jnp.asarray(
        np.array([100, 100, 100, 200, 300, 999], dtype=np.uint64)
    )
    v = jnp.asarray(np.ones(6, dtype=bool))
    out = np.asarray(count_db_occurrences(h, v, db, counts))
    # 100: imax-1 + 3 would wrap -> saturates; 200: imax-3+1 exact
    assert out[0] == imax
    assert out[1] == imax - 2
    assert out[2] == 6


def test_uint32_accumulator_keeps_reference_wrap():
    """Unsigned (small-DB/sharded) counts wrap exactly like the
    reference's uint32 atomic increments."""
    db = jnp.asarray(np.array([7], dtype=np.uint64))
    counts = jnp.asarray(
        np.array([0xFFFFFFFF, 0], dtype=np.uint32)
    )
    h = jnp.asarray(np.array([7, 7], dtype=np.uint64))
    v = jnp.asarray(np.ones(2, dtype=bool))
    out = np.asarray(count_db_occurrences(h, v, db, counts))
    assert out[0] == 1  # 2^32-1 + 2 wraps to 1


def test_bigdb_pallas_flush_saturates():
    """The windowed Pallas accumulate path saturates too (both the
    certificate-pass and the on-device exact fallback branches)."""
    rng = np.random.default_rng(77)
    H = 1024
    db = np.unique(
        rng.integers(0, 2**63, size=H, dtype=np.int64).astype(
            np.uint64
        )
    )
    chunk_len = 1 << 12
    h = rng.integers(0, 2**63, size=chunk_len, dtype=np.int64).astype(
        np.uint64
    )
    h[:64] = db[5]
    v = np.ones(chunk_len, dtype=bool)
    params = default_nucleotide_params()
    tpu = jax.default_backend() == "tpu"
    counter = BigDBCounter(
        params, db, s=100, chunk_len=chunk_len,
        d_tile=1024 if tpu else 256,
        wblk=8 if tpu else 4,
        rw=4,
    )
    imax = np.iinfo(np.int32).max
    idx = int(np.searchsorted(db, db[5]))
    counter.counts = counter.counts.at[idx].set(imax - 10)
    counter.add(jnp.asarray(h), jnp.asarray(v))
    got = counter.finalize()
    assert got[idx] == np.uint32(imax)  # 64 adds saturate, not wrap


@pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh"
)
def test_bigdb_counter_mesh_range_sharded_matches_reference():
    """Mesh mode: range-sharded windowed counting is exact and (on
    uniform data with per-shard windows) certificate-clean."""
    from mash_tpu.parallel import mesh as pmesh

    mesh = pmesh.default_mesh()
    rng = np.random.default_rng(31)
    H = 4096
    db = np.unique(
        rng.integers(0, 2**63, size=H, dtype=np.int64).astype(
            np.uint64
        )
    )
    chunk_len = 1 << 12
    chunks = []
    for i in range(6):
        h = rng.integers(
            0, 2**63, size=chunk_len, dtype=np.int64
        ).astype(np.uint64)
        h[: chunk_len // 4] = db[
            rng.choice(len(db), size=chunk_len // 4)
        ]
        rng.shuffle(h)
        v = rng.random(chunk_len) < 0.8
        chunks.append((h, v))

    params = default_nucleotide_params()
    tpu = jax.default_backend() == "tpu"
    counter = BigDBCounter(
        params, db, s=100, chunk_len=chunk_len,
        d_tile=1024 if tpu else 256,
        wblk=8 if tpu else 4,
        rw=4,
        mesh=mesh,
    )
    assert counter.deferred  # mesh mode is deferred-only
    for h, v in chunks:
        counter.add(jnp.asarray(h), jnp.asarray(v))
    got = counter.finalize()
    np.testing.assert_array_equal(got, _expected_counts(db, chunks))


@pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh"
)
def test_bigdb_counter_mesh_fallback_stays_exact():
    """Skewed values trip per-shard certificates; the on-device exact
    tier keeps mesh counts correct and fallback_count reports it."""
    from mash_tpu.parallel import mesh as pmesh

    mesh = pmesh.default_mesh()
    rng = np.random.default_rng(8)
    db = np.unique(
        rng.integers(0, 2000, size=1024, dtype=np.int64).astype(
            np.uint64
        )
    )
    chunk_len = 1 << 12
    h = rng.integers(0, 2000, size=chunk_len, dtype=np.int64).astype(
        np.uint64
    )
    v = np.ones(chunk_len, dtype=bool)
    params = default_nucleotide_params()
    counter = BigDBCounter(
        params, db, s=100, chunk_len=chunk_len,
        d_tile=256, wblk=2, rw=2, mesh=mesh,
    )
    counter.add(jnp.asarray(h), jnp.asarray(v))
    got = counter.finalize()
    np.testing.assert_array_equal(got, _expected_counts(db, [(h, v)]))
    assert counter.fallback_count() >= 1


def test_bigdb_small_h_window_autoscale():
    """Default windows widen for small H so batches stay >= ~12 chunks
    (K=1 pays the flush's fixed costs per single chunk)."""
    params = default_nucleotide_params()
    db1 = np.arange(1, 1_000_001, dtype=np.uint64)
    c1 = BigDBCounter(params, db1, s=100)
    assert c1.wblk == 128 and c1.rw == 20
    assert c1.K >= 12
    db2 = np.arange(1, 10_000_001, 7, dtype=np.uint64)
    c2 = BigDBCounter(params, db2, s=100)
    assert c2.K >= 12
    # H ~ 1.4e6 still needs widening; H = 1e7 does not
    db3 = np.arange(1, 10_000_001, dtype=np.uint64)
    c3 = BigDBCounter(params, db3, s=100)
    assert (c3.wblk, c3.rw) == (16, 4) and c3.K >= 12
    # explicit window args are never overridden
    c4 = BigDBCounter(params, db1, s=100, wblk=4, rw=2, d_tile=256)
    assert (c4.wblk, c4.rw) == (4, 2)
    # widening stops where chunk_len stops dividing by wblk*128
    # (flush slabs are K*chunk_len and must stay wblk*128-aligned):
    # 1<<13 divides by 64*128 but not 128*128, so H=5000 (which wants
    # the widest windows) stops at (64, 12)
    c5 = BigDBCounter(
        params, np.arange(1, 5001, dtype=np.uint64), s=100,
        chunk_len=1 << 13,
    )
    assert (c5.wblk, c5.rw) == (64, 12)


def test_bigdb_counts_exact_at_widened_windows():
    """The kernel stays exact at the autoscale's widest windows
    (wblk=128, rw=20); chunk_len must be a multiple of wblk*128."""
    rng = np.random.default_rng(97)
    db = np.unique(
        rng.integers(0, 2**63, size=2000, dtype=np.int64).astype(
            np.uint64
        )
    )
    chunk_len = 128 * 128
    h = rng.integers(0, 2**63, size=chunk_len, dtype=np.int64).astype(
        np.uint64
    )
    take = rng.choice(len(db), size=chunk_len // 4)
    h[: chunk_len // 4] = db[take]
    rng.shuffle(h)
    v = rng.random(chunk_len) < 0.8

    params = default_nucleotide_params()
    counter = BigDBCounter(
        params, db, s=100, chunk_len=chunk_len,
        d_tile=256, wblk=128, rw=20,
    )
    counter.add(jnp.asarray(h), jnp.asarray(v))
    got = counter.finalize()
    np.testing.assert_array_equal(
        got, _expected_counts(db, [(h, v)])
    )
    assert counter.fallback_count() == 0
