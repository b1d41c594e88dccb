"""Streaming containment (``mash screen``) device kernels.

The reference builds a hash->refs table plus an atomic hash->count map and
streams every k-mer of the mixture through them
(``src/mash/CommandScreen.cpp:93-116, 484-599``).  Here the DB becomes one
sorted distinct hash array (+ CSR segments to reference indices, built on
host); each streamed chunk is hashed on device, membership-tested with a
binary search and counted with a scatter-add, while the same chunk feeds
the bottom-s fold used for the distinct-k-mer cardinality estimate.  All
counting is total-occurrence based, which matches the reference exactly
(its counts are plain atomic increments).

Multi-device: shard ``db_hashes``/``counts`` by range over the mesh; each
chunk is broadcast, each shard counts its own range, and per-ref tallies
``psum`` at the end (see ``mash_tpu.parallel``).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mash_tpu.ops import sketch_ops
from mash_tpu.ops.kmers import hash_chunk


def build_db_table(hash_lists: List[np.ndarray]):
    """Sorted distinct DB hashes + CSR (hash -> reference indices).

    Equivalent of the reference's ``hashTable``/``hashCounts`` build
    (``CommandScreen.cpp:99-114``), as arrays:

    Returns (db_hashes[H], seg_starts[H+1], ref_ids[sum(sizes)]).
    """
    if not hash_lists:
        return (
            np.empty(0, np.uint64),
            np.zeros(1, np.int64),
            np.empty(0, np.int32),
        )
    all_h = np.concatenate([np.asarray(h, np.uint64) for h in hash_lists])
    ids = np.concatenate(
        [
            np.full(len(h), i, dtype=np.int32)
            for i, h in enumerate(hash_lists)
        ]
    )
    order = np.argsort(all_h, kind="stable")
    sh = all_h[order]
    sids = ids[order]
    uniq, starts = np.unique(sh, return_index=True)
    seg_starts = np.concatenate([starts, [len(sh)]]).astype(np.int64)
    return uniq, seg_starts, sids


def count_db_occurrences(h, v, db_hashes, counts):
    """Add each DB hash's occurrence count in (h, v) to ``counts``.

    ``counts`` has a trailing drop slot (index Hn) kept for historical
    layout compatibility; only ``counts[:Hn]`` is updated.  Strategy by
    DB size — TPU random access is the enemy: one XLA gather round over
    a 1M-hash chunk costs ~9 ms, ``jnp.searchsorted`` is log2(Hn) such
    rounds, and scatters are similar:

    - <= 32k hashes: gather-free compare-reduce over DB tiles
      (``count[j] += sum(h == db[j])``, ~1 ms per 1k DB per Mbase);
    - <= 256k: sort the chunk once, binary-search from the DB side
      (rank difference; dense in DB order, no scatter);
    - larger: one 2-key sort of [chunk, db-before, db-after] sentinels
      + cumsums + two ordinal scatters (~60 ms per 1M chunk x 1M DB).

    All three are exact total-occurrence counts
    (``CommandScreen.cpp:569-575``), including for a DB hash equal to
    the 2^64-1 masking sentinel.  Shared by the single-device fold and
    the mesh range-sharded fold.
    """
    Hn = db_hashes.shape[0]
    COMPARE_REDUCE_MAX = 1 << 15
    DB_SIDE_MAX = 1 << 18
    if Hn == 0:
        return counts
    if Hn <= COMPARE_REDUCE_MAX:
        rows = 1
        while (h.shape[0] % (2 * rows) == 0) and rows < 64:
            rows *= 2
        hr = h.reshape(rows, -1)
        vr = v.reshape(rows, -1)

        def body(carry, xs):
            xt, vt = xs
            eq = (xt[:, None] == db_hashes[None, :]) & vt[:, None]
            return (
                carry + jnp.sum(eq, axis=0, dtype=counts.dtype),
                0,
            )

        add, _ = jax.lax.scan(
            body, jnp.zeros(Hn, counts.dtype), (hr, vr)
        )
    elif Hn <= DB_SIDE_MAX:
        hs = jnp.sort(jnp.where(v, h, jnp.uint64(0xFFFFFFFFFFFFFFFF)))
        nv = jnp.sum(v, dtype=jnp.int32)
        # entries sorted past nv are the masked invalid lanes (and any
        # real EMPTY-valued hash among them would be a single 2^64-1
        # run; clamp both bounds into the valid prefix)
        left = jnp.minimum(
            jnp.searchsorted(hs, db_hashes, side="left"), nv
        )
        right = jnp.minimum(
            jnp.searchsorted(hs, db_hashes, side="right"), nv
        )
        add = (right - left).astype(counts.dtype)
    else:
        hm = jnp.where(v, h, jnp.uint64(0xFFFFFFFFFFFFFFFF))
        vals = jnp.concatenate([hm, db_hashes, db_hashes])
        flags = jnp.concatenate(
            [
                jnp.ones(hm.shape[0], jnp.int32),
                jnp.zeros(Hn, jnp.int32),
                jnp.full(Hn, 2, jnp.int32),
            ]
        )
        sv, sf = jax.lax.sort((vals, flags), num_keys=2)
        is_chunk = (sf == 1).astype(jnp.int32)
        rank = jnp.cumsum(is_chunk)
        ordb = jnp.cumsum((sf == 0).astype(jnp.int32)) - 1
        orda = jnp.cumsum((sf == 2).astype(jnp.int32)) - 1
        before = (
            jnp.zeros(Hn, jnp.int32)
            .at[jnp.where(sf == 0, ordb, Hn)]
            .add(jnp.where(sf == 0, rank, 0), mode="drop")
        )
        after = (
            jnp.zeros(Hn, jnp.int32)
            .at[jnp.where(sf == 2, orda, Hn)]
            .add(jnp.where(sf == 2, rank, 0), mode="drop")
        )
        # masked invalid lanes sort as 2^64-1; a real DB hash of that
        # value must count only valid occurrences: all valid non-EMPTY
        # chunk values rank below `before`, so nv - before is exact.
        nv = jnp.sum(v, dtype=jnp.int32)
        add = jnp.where(
            db_hashes == jnp.uint64(0xFFFFFFFFFFFFFFFF),
            nv - before,
            after - before,
        ).astype(counts.dtype)
    return jnp.concatenate(
        [_accum(counts[:Hn], add), counts[Hn:]]
    )


def _accum(counts, add):
    """Accumulate non-negative per-chunk occurrence counts.

    Signed accumulators (the big-DB tier's int32 device counts)
    SATURATE at INT32_MAX instead of wrapping negative: the finalize
    cast to uint32 would turn a wrapped negative into garbage.  This
    diverges from the reference's uint32 atomics, which silently wrap
    at 2^32 (``CommandScreen.h:106``) — saturating at 2^31-1 is the
    strictly-less-wrong behavior and is documented in
    ``docs/file-formats.md``.  Unsigned accumulators (the small-DB and
    mesh-sharded folds) keep the reference's exact wrapping semantics.
    ``add`` is always >= 0 and itself far below 2^31 (one flush counts
    at most ~2e8 hashes), so overflow manifests exactly as
    ``new < counts``.
    """
    new = counts + add
    if jnp.issubdtype(counts.dtype, jnp.signedinteger):
        new = jnp.where(
            new < counts, jnp.iinfo(counts.dtype).max, new
        )
    return new


def make_screen_fold(params, db_hashes: jnp.ndarray, s: int):
    """Compile a (counts, state, chunk) -> (counts, state) fold step.

    The returned fold also carries a ``fold_rows(counts, state,
    rows[R, L])`` attribute that folds a whole ingest batch in ONE
    dispatch (hashing all rows at once, scanning the count/merge),
    mirroring the reference ThreadPool's batch concurrency
    (CommandScreen.cpp:155-270) without per-row dispatch overhead.
    """
    from mash_tpu.ops.kmers import alphabet_bytes

    alpha = alphabet_bytes(params.alphabet)
    k = params.kmer_size
    seed = params.seed
    use64 = params.use64
    noncanonical = params.noncanonical
    preserve_case = params.preserve_case

    def _hash(chunk):
        return hash_chunk(
            chunk,
            alphabet=alpha,
            k=k,
            seed=seed,
            use64=use64,
            noncanonical=noncanonical,
            preserve_case=preserve_case,
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fold(counts, state, chunk):
        h, v = _hash(chunk)
        h, v = jax.lax.optimization_barrier((h, v))
        counts = count_db_occurrences(h, v, db_hashes, counts)
        sh, sc = sketch_ops.sketch_chunk_batch(
            h[None], v[None], s=s, use64=use64
        )
        state = sketch_ops.merge_states(state, (sh[0], sc[0]), s=s)
        return counts, state

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fold_rows(counts, state, rows):
        h2, v2 = _hash(rows)
        h2, v2 = jax.lax.optimization_barrier((h2, v2))

        def cbody(c, hv):
            return count_db_occurrences(hv[0], hv[1], db_hashes, c), None

        counts, _ = jax.lax.scan(cbody, counts, (h2, v2))
        sh, sc = sketch_ops.sketch_chunk_batch(h2, v2, s=s, use64=use64)

        def mbody(st, x):
            return sketch_ops.merge_states(st, x, s=s), None

        state, _ = jax.lax.scan(mbody, state, (sh, sc))
        return counts, state

    def fold_entry(counts, state, chunk):
        return fold(counts, state, chunk)

    fold_entry.fold_rows = fold_rows
    return fold_entry


# Above this many DB hashes the per-chunk counting tiers lose to the
# batched Pallas windowed-count kernel (see ops.pallas_screen): the
# static DB is tiled/split once and never re-sorted.
BIG_DB_MIN = 1 << 18


class BigDBCounter:
    """Batched big-DB occurrence counting (the RefSeq-scale tier).

    Chunks' device hashes accumulate into a K-chunk batch; one sort per
    batch + the Pallas windowed equality-count kernel replace the
    round-1 per-chunk ``[chunk, db, db]`` 2-key sort, making per-chunk
    work independent of H.  A coverage certificate guards every batch;
    failure falls back to the exact sort tier.

    Counts accumulate in device int32 and SATURATE at 2^31-1 (see
    :func:`_accum`); the reference's uint32 atomics instead wrap at
    2^32 (``CommandScreen.h:106``).

    With ``mesh`` (>1 device) the sorted DB's tile planes, subrow
    bounds and counts are contiguously RANGE-SHARDED over the mesh
    (each device owns a value range of the sorted DB; the replicated
    batch is windowed-counted against the local range only, so
    concatenating per-range counts is exact).  Mesh mode is
    deferred-only: per-flush certificate readbacks would sync every
    device, and the on-device ``lax.cond`` exact tier already keeps
    failed batches correct locally.
    """

    def __init__(self, params, db_hashes: np.ndarray, s: int,
                 chunk_len: int = 1 << 20, d_tile: int | None = None,
                 wblk: int | None = None, rw: int | None = None,
                 deferred: bool | None = None, mesh=None):
        import os

        from mash_tpu.ops import pallas_screen as ps

        self.ps = ps
        self.D = d_tile or ps.D_TILE
        self.wblk = wblk or ps.WBLK
        self.rw = rw or ps.RW
        self.db_np = np.asarray(db_hashes, np.uint64)
        H = len(self.db_np)
        if wblk is None and rw is None and H > 0:
            # Small-H autoscale: with the default windows the
            # certificate math (below) caps the batch at
            # ~212*H/(128*chunk_len) chunks — K=1 for H ~ 1e6, paying
            # the flush's fixed costs (sort ramp, offsets, grid) per
            # single chunk (~6x slower than the K=15 regime measured at
            # H=1e7).  Wider windows are cheap at small H (tile count
            # T = H/D is small; per-tile compute scales with rw only,
            # wblk just widens the two copied window blocks), so scale
            # them until the batch reaches ~12 chunks.  wblk stays a
            # power of two: count_batch requires the slab length to be
            # a multiple of wblk*128, and chunk_len is a power of two.
            for wb, rwx in ((32, 8), (64, 12), (128, 20)):
                target = min(
                    self.rw * 128 - 300, (self.wblk * 128 - 300) // 8
                )
                if (target * H) // (128 * chunk_len) >= 12:
                    break
                # flush slabs are K*chunk_len long and must stay a
                # multiple of wblk*128 (count_batch's slab constraint)
                if wb > self.wblk and chunk_len % (wb * 128) == 0:
                    self.wblk, self.rw = wb, rwx
        self.mesh = (
            mesh
            if mesh is not None and mesh.devices.size > 1
            else None
        )
        if self.mesh is not None:
            # pad so tile boundaries align with contiguous range shards
            n_dev = self.mesh.devices.size
            tiles_per_dev = -(-(-(-H // self.D)) // n_dev)
            Hp = tiles_per_dev * n_dev * self.D
            dbp = np.full(Hp, np.uint64(0xFFFFFFFFFFFFFFFF))
            dbp[:H] = self.db_np
            (
                self.dbh,
                self.dbl,
                self.sub_min,
                self.sub_max,
                self.H_pad,
            ) = ps.prepare_db_planes(dbp, self.D)
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            from mash_tpu.parallel.mesh import AXIS

            rows = NamedSharding(self.mesh, P(AXIS, None))
            vec = NamedSharding(self.mesh, P(AXIS))
            self.dbh = jax.device_put(self.dbh, rows)
            self.dbl = jax.device_put(self.dbl, rows)
            self.sub_min = jax.device_put(self.sub_min, vec)
            self.sub_max = jax.device_put(self.sub_max, vec)
            self._counts_sharding = vec
        else:
            (
                self.dbh,
                self.dbl,
                self.sub_min,
                self.sub_max,
                self.H_pad,
            ) = ps.prepare_db_planes(self.db_np, self.D)
            self._counts_sharding = None
        self.H = H
        self.s = s
        self.params = params
        self.chunk_len = chunk_len
        # Batch sizing: the mean 128-hash subrow slice must stay >6
        # sigma below BOTH certificate bounds — its own RW-row window
        # minus worst-case 255-element (2-row-granularity) misalignment,
        # and its 1/8 share of the tile span that must fit the big
        # window minus up-to-WBLK-row misalignment.  Clamped to a
        # 192-chunk (1.5 GiB) memory cap.  Undersized batches waste
        # window compares on empty lanes; oversized ones trip the
        # certificate (the adaptive k_eff backoff then kicks in).
        target = min(
            self.rw * 128 - 300, (self.wblk * 128 - 300) // 8
        )
        target = max(target, 16)
        # H (not H/n_dev) is right even sharded: a shard holds 1/n_dev
        # of the hashes over 1/n_dev of the value range, so the batch
        # slice per 128-hash subrow has the same expectation.
        #
        # HBM guard: at RefSeq scale the resident set (DB planes +
        # counts) plus the flush's sort transients (~3x slab) must
        # share one chip — K=157 slabs (1.26 GiB) RESOURCE_EXHAUSTED
        # at H=1e8 on a v5e core (2026-08-19 bench).  Cap slab bytes
        # at MASH_TPU_BIGDB_SLAB_MB.  The per-FLUSH cost has a
        # component proportional to H (tile walk + subrow offsets), so
        # H=1e8 throughput tracks the batch/H ratio almost linearly:
        # 18.0M hashes/s at 512 MiB (K=64, batch 0.64*H), 27.0M at
        # 768 MiB (K=96), 32.4M at 1024 MiB (K=128), all fallback-free
        # (r5 probes, scripts/probe_bigdb_1e8.py + bench_results/).
        # Default 1024 MiB — the largest probe-proven size on a v5e
        # core (1.26 GiB OOMs; the next step would gain only ~5%).
        slab_cap = int(
            os.environ.get("MASH_TPU_BIGDB_SLAB_MB", "1024")
        ) << 20
        kcap = max(12, slab_cap // (chunk_len * 8))
        self.K = int(
            min(kcap, max(1, (target * H) // (128 * chunk_len)))
        )
        # Active chunks per flush: halved whenever a batch trips the
        # coverage certificate (high-multiplicity streams cluster
        # values and widen spans), without changing the compiled batch
        # shape (inactive slots pad with sentinels).
        self.k_eff = self.K
        self.counts = jnp.zeros(self.H_pad, dtype=jnp.int32)
        if self._counts_sharding is not None:
            self.counts = jax.device_put(
                self.counts, self._counts_sharding
            )
        # queued device rows awaiting a flush: a list of 1-D
        # [chunk_len] chunks and 2-D [r, chunk_len] row groups (kept
        # whole — slicing a group into rows would cost one device
        # dispatch per row through the transfer path)
        self.pending = []
        self._pending_rows = 0
        self._preps = {}
        self._sent_valid = jnp.zeros((), dtype=jnp.int32)
        self._db_dev64 = None  # lazy, only for the fallback tier
        self._fallbacks = 0
        # Recovery: one pathological batch must not degrade batching
        # for the rest of the stream — after RECOVER_AFTER consecutive
        # clean flushes, k_eff doubles back toward K.
        self.RECOVER_AFTER = 4
        self._clean_streak = 0
        # Deferred certificates (default): the per-flush coverage check
        # stays on device (lax.cond routes failed batches to the exact
        # tier there) and is read back ONCE at finalize — a per-flush
        # ``bool(ok)`` sync would stall the dispatch pipeline (and on
        # the dev tunnel pay a ~40 ms round-trip floor per flush).
        # Eager mode (readback per flush + k_eff batch adaptation)
        # remains for debugging/adaptive use: ``deferred=False`` or
        # MASH_TPU_BIGDB_EAGER=1.
        if deferred is None:
            deferred = os.environ.get("MASH_TPU_BIGDB_EAGER") != "1"
        # mesh mode is deferred-only (see class docstring)
        self.deferred = True if self.mesh is not None else deferred
        self._nfail = jnp.zeros((), dtype=jnp.int32)
        self._dstep = None

    def _prep_fn(self, length: int):
        fn = self._preps.get(length)
        if fn is not None:
            return fn
        chunk_len = self.chunk_len
        # oversized chunks (a record longer than chunk_len packed
        # whole) span several rows; pad to the row multiple so flush's
        # row accounting covers every hash
        rows = max(1, -(-length // chunk_len))

        @jax.jit
        def prep(h, v):
            hm = jnp.where(v, h, jnp.uint64(0xFFFFFFFFFFFFFFFF))
            sent = jnp.sum(
                v & (h == jnp.uint64(0xFFFFFFFFFFFFFFFF)),
                dtype=jnp.int32,
            )
            if hm.shape[0] < rows * chunk_len:
                hm = jnp.concatenate(
                    [
                        hm,
                        jnp.full(
                            rows * chunk_len - hm.shape[0],
                            jnp.uint64(0xFFFFFFFFFFFFFFFF),
                        ),
                    ]
                )
            return hm, sent

        self._preps[length] = (prep, rows)
        return prep, rows

    def add(self, h, v) -> None:
        """Queue one hashed chunk (device arrays from hash_chunk)."""
        prep, rows = self._prep_fn(int(h.shape[0]))
        hm, sent = prep(h, v)
        self._sent_valid = self._sent_valid + sent
        self.pending.append(hm)
        self._pending_rows += rows
        if self._pending_rows >= self.k_eff:
            self.flush()

    def _prep_rows_fn(self, rows: int, length: int):
        key = (rows, length)
        fn = self._preps.get(key)
        if fn is not None:
            return fn
        chunk_len = self.chunk_len

        @jax.jit
        def prep_rows(h2, v2):
            hm = jnp.where(v2, h2, jnp.uint64(0xFFFFFFFFFFFFFFFF))
            sent = jnp.sum(
                v2 & (h2 == jnp.uint64(0xFFFFFFFFFFFFFFFF)),
                dtype=jnp.int32,
            )
            if hm.shape[1] < chunk_len:
                hm = jnp.concatenate(
                    [
                        hm,
                        jnp.full(
                            (hm.shape[0], chunk_len - hm.shape[1]),
                            jnp.uint64(0xFFFFFFFFFFFFFFFF),
                        ),
                    ],
                    axis=1,
                )
            return hm, sent

        self._preps[key] = prep_rows
        return prep_rows

    def add_rows(self, h2, v2) -> None:
        """Queue a whole hashed batch ``[R, n]`` (one prep dispatch)."""
        hm, sent = self._prep_rows_fn(
            int(h2.shape[0]), int(h2.shape[1])
        )(h2, v2)
        self._sent_valid = self._sent_valid + sent
        self.pending.append(hm)
        self._pending_rows += int(hm.shape[0])
        if self._pending_rows >= self.k_eff:
            self.flush()

    def flush(self) -> None:
        if self._pending_rows == 0:
            return
        L = self.chunk_len
        flat = (
            jnp.concatenate([a.reshape(-1) for a in self.pending])
            if len(self.pending) > 1 or self.pending[0].ndim != 1
            else self.pending[0]
        )
        n = self._pending_rows
        self.pending = []
        self._pending_rows = 0
        i = 0
        while i < n:  # k_eff-row slabs (row groups can exceed one)
            take = min(self.k_eff, n - i)
            slab = flat[i * L : (i + take) * L]
            if take < self.K:
                slab = jnp.concatenate(
                    [
                        slab,
                        jnp.full(
                            (self.K - take) * L,
                            jnp.uint64(0xFFFFFFFFFFFFFFFF),
                        ),
                    ]
                )
            if self.deferred:
                try:
                    self.counts, self._nfail = self._deferred_step()(
                        self.counts, slab, self._nfail
                    )
                except Exception as e:  # compile/lowering surprise:
                    # fall back to eager certificates for the rest of
                    # the stream rather than failing the run (donation
                    # only consumes inputs at execution, so counts is
                    # still live after a failed compile)
                    import sys

                    # If the jitted step failed DURING execution (e.g.
                    # RESOURCE_EXHAUSTED mid-run) the donated counts
                    # buffer is gone and the accumulated tallies are
                    # unrecoverable — surface the original error with
                    # context instead of a confusing secondary
                    # use-after-donate crash in the recovery below.
                    if getattr(
                        self.counts, "is_deleted", lambda: False
                    )():
                        raise RuntimeError(
                            "big-DB deferred flush failed after its "
                            "inputs were donated; accumulated counts "
                            "are lost — rerun (MASH_TPU_BIGDB_EAGER=1 "
                            "forces per-flush certificates)"
                        ) from e
                    sys.stderr.write(
                        "WARNING: deferred big-DB flush unavailable "
                        "(%s: %s); using per-flush certificates.\n"
                        % (type(e).__name__, str(e)[:200])
                    )
                    if self.mesh is not None:
                        # degrade to single-device: pull the sharded
                        # counts local and rebuild unsharded planes
                        # (pad slots differ; both are stripped at
                        # finalize, so only the real-H prefix matters)
                        old = np.asarray(self.counts)
                        self.mesh = None
                        self._counts_sharding = None
                        self._dstep = None
                        (
                            self.dbh,
                            self.dbl,
                            self.sub_min,
                            self.sub_max,
                            self.H_pad,
                        ) = self.ps.prepare_db_planes(
                            self.db_np, self.D
                        )
                        cn = np.zeros(self.H_pad, np.int32)
                        n_keep = min(self.H_pad, old.shape[0])
                        cn[:n_keep] = old[:n_keep]
                        self.counts = jnp.asarray(cn)
                    self.deferred = False
                    self._flush_batch(jnp.sort(slab))
            else:
                self._flush_batch(jnp.sort(slab))
            i += take

    def _deferred_step(self):
        """One-dispatch readback-free flush: sort + count + on-device
        certificate/fallback cond + failure-count accumulate.

        Mesh mode wraps the count in ``shard_map``: the sorted batch is
        replicated, the DB planes/bounds/counts arrive range-sharded,
        each device counts only its value range, and the per-device
        certificate failures ``psum`` into one replicated counter (so
        ``fallback_count`` reports failed device-batches)."""
        if self._dstep is not None:
            return self._dstep
        ps = self.ps
        dbh, dbl = self.dbh, self.dbl
        sub_min, sub_max = self.sub_min, self.sub_max
        D, wblk, rw = self.D, self.wblk, self.rw

        if self.mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from mash_tpu.parallel.mesh import AXIS

            def per_dev(c, dh, dl, smin, smax, batch):
                c2, ok = ps.count_batch_cond(
                    batch, dh, dl, smin, smax, c, D, wblk, rw
                )
                f = jax.lax.psum(
                    jnp.where(ok, jnp.int32(0), jnp.int32(1)), AXIS
                )
                return c2, f

            smapped = shard_map(
                per_dev,
                mesh=self.mesh,
                check_vma=False,
                in_specs=(
                    P(AXIS),
                    P(AXIS, None),
                    P(AXIS, None),
                    P(AXIS),
                    P(AXIS),
                    P(),
                ),
                out_specs=(P(AXIS), P()),
            )

            @functools.partial(jax.jit, donate_argnums=(0, 2))
            def step(counts, slab, nfail):
                batch = jnp.sort(slab)
                counts2, f = smapped(
                    counts, dbh, dbl, sub_min, sub_max, batch
                )
                return counts2, nfail + f

            self._dstep = step
            return step

        @functools.partial(jax.jit, donate_argnums=(0, 2))
        def step(counts, slab, nfail):
            batch = jnp.sort(slab)
            counts2, ok = ps.count_batch_cond(
                batch, dbh, dbl, sub_min, sub_max, counts,
                D, wblk, rw,
            )
            nfail = nfail + jnp.where(
                ok, jnp.int32(0), jnp.int32(1)
            )
            return counts2, nfail

        self._dstep = step
        return step

    def fallback_count(self) -> int:
        """Total certificate failures so far (syncs in deferred mode)."""
        if self.deferred:
            return self._fallbacks + int(self._nfail)
        return self._fallbacks

    def _flush_batch(self, batch) -> None:
        new_counts, ok = self.ps.count_batch(
            batch,
            self.dbh,
            self.dbl,
            self.sub_min,
            self.sub_max,
            self.counts,
            self.D,
            self.wblk,
            self.rw,
        )
        if bool(ok):
            self.counts = new_counts
            self._clean_streak += 1
            if (
                self._clean_streak >= self.RECOVER_AFTER
                and self.k_eff < self.K
            ):
                self.k_eff = min(self.K, self.k_eff * 2)
                self._clean_streak = 0
        else:  # certificate failed: exact fallback on this batch
            self._fallbacks += 1
            self.k_eff = max(1, self.k_eff // 2)
            self._clean_streak = 0
            if self._db_dev64 is None:
                dbp = np.full(
                    self.H_pad, np.uint64(0xFFFFFFFFFFFFFFFF)
                )
                dbp[: self.H] = self.db_np
                self._db_dev64 = jnp.asarray(dbp)
            valid = batch != jnp.uint64(0xFFFFFFFFFFFFFFFF)
            self.counts = count_db_occurrences(
                batch, valid, self._db_dev64, self.counts
            )

    def finalize(self) -> np.ndarray:
        self.flush()
        if self.deferred:
            self._fallbacks += int(self._nfail)
            self._nfail = jnp.zeros((), dtype=jnp.int32)
        out = np.asarray(self.counts)[: self.H].astype(np.uint32)
        if self.H and self.db_np[-1] == np.uint64(
            0xFFFFFFFFFFFFFFFF
        ):
            # a real DB hash equal to the masking sentinel is counted
            # separately (masked lanes share its value in the batch)
            out[-1] = np.uint32(int(self._sent_valid))
        return out


def make_screen_fold_auto(params, db_hashes: np.ndarray, s: int):
    """Device-count-aware screen fold.

    Returns ``(fold, counts0, finalize)``: ``fold(counts, state, chunk)
    -> (counts, state)``; ``finalize(counts) -> np.ndarray[H]`` undoes
    the internal layout.  With several devices the DB is contiguously
    range-sharded over the default mesh (each device counts only its
    range — a hash falls in exactly one range) and the cardinality
    state is merged collectively; single-device uses the plain fold.
    """
    H = len(db_hashes)
    n_dev = len(jax.local_devices())
    if (
        n_dev == 1
        and H > BIG_DB_MIN
        and jax.default_backend() == "tpu"
    ):
        return make_screen_fold_bigdb(params, db_hashes, s)
    if (
        n_dev > 1
        and H // n_dev > BIG_DB_MIN
        and jax.default_backend() == "tpu"
    ):
        # RefSeq-scale DB on a mesh: range-sharded windowed counting
        from mash_tpu.parallel import mesh as pmesh

        return make_screen_fold_bigdb(
            params, db_hashes, s, mesh=pmesh.default_mesh()
        )
    if n_dev > 1 and H > 0:
        from mash_tpu.parallel import mesh as pmesh

        per = -(-H // n_dev)
        pad = per * n_dev - H
        dbp = np.concatenate(
            [
                np.asarray(db_hashes, np.uint64),
                np.full(pad, np.uint64(0xFFFFFFFFFFFFFFFF)),
            ]
        )
        fn = pmesh.make_sharded_screen_fn(pmesh.default_mesh(), params, s)
        db_dev = jnp.asarray(dbp)
        # uint32 like the reference's atomic counters
        # (CommandScreen.h:106); int64 would run emulated on TPU lanes.
        counts0 = jnp.zeros(per * n_dev, dtype=jnp.uint32)

        def fold(counts, state, chunk):
            c2, sh, sc = fn(db_dev, counts, state[0], state[1], chunk)
            return c2, (sh, sc)

        def finalize(counts):
            return np.asarray(counts)[:H]

        return fold, counts0, finalize

    fold = make_screen_fold(params, jnp.asarray(db_hashes), s)
    counts0 = jnp.zeros(H + 1, dtype=jnp.uint32)

    def finalize(counts):
        return np.asarray(counts)[:H]

    return fold, counts0, finalize


def make_screen_fold_bigdb(params, db_hashes: np.ndarray, s: int,
                           chunk_len: int = 1 << 20, mesh=None):
    """Big-DB screen fold: batched Pallas counting + per-chunk state.

    Same ``(fold, counts0, finalize)`` contract as the other variants;
    the counts value threaded through ``fold`` is a placeholder — the
    :class:`BigDBCounter` holds the real accumulator and ``finalize``
    drains it.  With ``mesh``, counting is range-sharded (see
    :class:`BigDBCounter`).
    """
    from mash_tpu.ops.kmers import alphabet_bytes

    counter = BigDBCounter(params, db_hashes, s, chunk_len, mesh=mesh)
    alpha = alphabet_bytes(params.alphabet)
    hash_fns = {}

    def _hash_fn(length: int):
        fn = hash_fns.get(length)
        if fn is not None:
            return fn

        @jax.jit
        def hf(chunk, state_h, state_c):
            h, v = hash_chunk(
                chunk,
                alphabet=alpha,
                k=params.kmer_size,
                seed=params.seed,
                use64=params.use64,
                noncanonical=params.noncanonical,
                preserve_case=params.preserve_case,
            )
            sh, sc = sketch_ops.sketch_chunk_batch(
                h[None], v[None], s=s, use64=params.use64
            )
            nh, nc = sketch_ops.merge_states(
                (state_h, state_c), (sh[0], sc[0]), s=s
            )
            return h, v, nh, nc

        hash_fns[length] = hf
        return hf

    def fold(counts, state, chunk):
        h, v, sh, sc = _hash_fn(int(chunk.shape[0]))(
            chunk, state[0], state[1]
        )
        counter.add(h, v)
        return counts, (sh, sc)

    hash_rows_fns = {}

    def _hash_rows_fn(shape):
        fn = hash_rows_fns.get(shape)
        if fn is not None:
            return fn

        @jax.jit
        def hfr(rows, state_h, state_c):
            h2, v2 = hash_chunk(
                rows,
                alphabet=alpha,
                k=params.kmer_size,
                seed=params.seed,
                use64=params.use64,
                noncanonical=params.noncanonical,
                preserve_case=params.preserve_case,
            )
            sh, sc = sketch_ops.sketch_chunk_batch(
                h2, v2, s=s, use64=params.use64
            )

            def mbody(st, x):
                return sketch_ops.merge_states(st, x, s=s), None

            (nh, nc), _ = jax.lax.scan(
                mbody, (state_h, state_c), (sh, sc)
            )
            return h2, v2, nh, nc

        hash_rows_fns[shape] = hfr
        return hfr

    def fold_rows(counts, state, rows):
        h2, v2, sh, sc = _hash_rows_fn(tuple(rows.shape))(
            rows, state[0], state[1]
        )
        counter.add_rows(h2, v2)
        return counts, (sh, sc)

    fold.fold_rows = fold_rows
    counts0 = jnp.zeros(0, dtype=jnp.uint32)

    def finalize(_counts):
        return counter.finalize()

    return fold, counts0, finalize


def tally_shared(
    counts: np.ndarray,
    seg_starts: np.ndarray,
    ref_ids: np.ndarray,
    n_refs: int,
    min_cov: int = 1,
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Per-reference shared-hash counts and depth lists.

    Vectorized version of the tally loop (``CommandScreen.cpp:338-355``):
    for every DB hash with count >= min_cov, each reference containing it
    gains one shared hash and records the hash's depth.
    """
    hit = counts >= min_cov
    # expand hash-level hit/count to CSR entries
    seg_len = np.diff(seg_starts)
    entry_hit = np.repeat(hit, seg_len)
    entry_count = np.repeat(counts, seg_len)
    sel = entry_hit
    refs_hit = ref_ids[sel]
    depths_flat = entry_count[sel]
    shared = np.bincount(refs_hit, minlength=n_refs).astype(np.int64)
    depths: List[np.ndarray] = [
        np.empty(0, dtype=np.int64) for _ in range(n_refs)
    ]
    if len(refs_hit):
        order = np.argsort(refs_hit, kind="stable")
        refs_sorted = refs_hit[order]
        depths_sorted = depths_flat[order]
        starts = np.searchsorted(refs_sorted, np.arange(n_refs + 1))
        for r in range(n_refs):
            depths[r] = depths_sorted[starts[r] : starts[r + 1]]
    return shared, depths


def winner_takes_all(
    counts: np.ndarray,
    seg_starts: np.ndarray,
    ref_ids: np.ndarray,
    scores: np.ndarray,
    lengths: np.ndarray,
    min_cov: int = 1,
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Reassign each shared hash to its best-scoring reference.

    Replicates ``CommandScreen.cpp:357-407``: ties broken by larger
    reference length; the first CSR entry wins remaining ties, matching
    the reference's strict ``>`` comparisons over its (insertion-ordered)
    set iteration.  Note the reference iterates a ``robin_hood`` set whose
    order for equal (score, length) pairs is unspecified; such full ties
    are output-identical anyway because the winner's identity only matters
    when scores or lengths differ.
    """
    n_refs = len(scores)
    hit = counts >= min_cov
    seg_len = np.diff(seg_starts)
    entry_hit = np.repeat(hit, seg_len)
    entry_score = scores[ref_ids]
    entry_length = lengths[ref_ids]
    # rank = (score, length); select argmax per segment
    hash_idx = np.repeat(np.arange(len(counts)), seg_len)
    # order by (hash, score desc, length desc) then pick first per hash
    order = np.lexsort(
        (-entry_length, -entry_score, hash_idx)
    )
    oh = hash_idx[order]
    first = np.unique(oh, return_index=True)[1]
    win_entries = order[first]
    sel = entry_hit[win_entries]
    winners = ref_ids[win_entries][sel]
    win_counts = np.repeat(counts, seg_len)[win_entries][sel]
    shared = np.bincount(winners, minlength=n_refs).astype(np.int64)
    depths: List[np.ndarray] = [
        np.empty(0, dtype=np.int64) for _ in range(n_refs)
    ]
    if len(winners):
        order2 = np.argsort(winners, kind="stable")
        ws = winners[order2]
        ds = win_counts[order2]
        starts = np.searchsorted(ws, np.arange(n_refs + 1))
        for r in range(n_refs):
            depths[r] = ds[starts[r] : starts[r + 1]]
    return shared, depths


# ---------------------------------------------------------------------------
# 6-frame translation (protein-DB screens), host-side vectorized.
# ---------------------------------------------------------------------------

_CODON_TABLE = {}


def _codon_lut() -> np.ndarray:
    """64-entry codon->amino-acid LUT (standard genetic code, matching the
    reference's ``aaFromCodon`` switch, ``CommandScreen.cpp:625-809``)."""
    bases = "ACGT"
    aa = (
        "KNKNTTTTRSRSIIMI"  # A??
        "QHQHPPPPRRRRLLLL"  # C??
        "EDEDAAAAGGGGVVVV"  # G??
        "*Y*YSSSS*CWCLFLF"  # T??
    )
    lut = np.full(64, ord("*"), dtype=np.uint8)
    for i0 in range(4):
        for i1 in range(4):
            for i2 in range(4):
                lut[i0 * 16 + i1 * 4 + i2] = ord(aa[i0 * 16 + i1 * 4 + i2])
    return lut


_CODON_LUT = _codon_lut()

_BASE_CODE = np.full(256, -1, dtype=np.int8)
for _i, _b in enumerate(b"ACGT"):
    _BASE_CODE[_b] = _i


def translate_frames(chunk: np.ndarray) -> List[np.ndarray]:
    """All six translation frames of an uppercased uint8 chunk.

    Order matches the reference (``hashSequence``): frames 0,1,2 forward
    then 0,1,2 of the reverse complement of the whole chunk.  Invalid
    codons (containing non-ACGT bytes, including separators) become ``*``.
    """
    from mash_tpu.ops.kmers import complement_lut

    comp = complement_lut()
    rev = comp[chunk[::-1]]
    out = []
    for src in (chunk, rev):
        codes = _BASE_CODE[src]
        for frame in range(3):
            n = (len(src) - frame) // 3
            if n <= 0:
                out.append(np.empty(0, dtype=np.uint8))
                continue
            c0 = codes[frame : frame + 3 * n : 3]
            c1 = codes[frame + 1 : frame + 1 + 3 * n : 3]
            c2 = codes[frame + 2 : frame + 2 + 3 * n : 3]
            valid = (c0 >= 0) & (c1 >= 0) & (c2 >= 0)
            idx = (
                c0.astype(np.int32) * 16
                + c1.astype(np.int32) * 4
                + c2.astype(np.int32)
            )
            aa = np.where(valid, _CODON_LUT[np.clip(idx, 0, 63)], ord("*"))
            out.append(aa.astype(np.uint8))
    # reorder to fwd0,fwd1,fwd2,rev0,rev1,rev2 == reference's i=0..5
    return out
