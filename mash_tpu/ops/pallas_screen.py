"""Pallas TPU kernel for big-DB screen counting.

Problem: ``mash screen`` against a RefSeq-scale DB (H = 1e7..1e9 sorted
distinct hashes) must count, for every DB hash, its occurrences in a
streamed k-mer mixture.  The round-1 top tier re-sorted
``[chunk, db, db]`` per 1 MiB chunk — O((n + 2H) log) with the static
DB paying the sort cost again every chunk; at H = 1e8 that is ~seconds
per chunk.

Design (v3, per-subrow windowed equality count):
- chunks accumulate into a device batch; ONE sort per ~3H-hash batch
  (TPU u64 sort measured at 2.8 ns/elem) replaces per-chunk DB sorts;
- the DB is tiled into D-hash grid steps ([D/128, 128] natural-layout
  int32 hi/lo planes; a [H, 1] layout would lane-pad 128x).  Because
  both sides are sorted, the batch positions matching each 128-value
  db SUBROW form one contiguous span; per-subrow window row offsets
  are precomputed with one searchsorted over subrow bounds (8T
  queries/batch) and scalar-prefetched;
- each grid step loads two consecutive [WBLK, 128] blocks of the
  sorted batch (the two-block trick covers any span with guaranteed
  WBLK-row slack) and, per db subrow, compares only RW rows around its
  span — the compare volume tracks the data density instead of the
  whole tile window (~2.7x fewer compares than a tile-level window,
  and ~4x larger batches for the same certificate margin);
- certificates (every subrow span inside its RW-row window, inside the
  2-block big window) are checked per batch; failure (pathologically
  skewed hashes — unreachable for MurmurHash-uniform data) falls back
  to the exact sort tier, the repo's standard pattern.

Work per batch is one n-sort + O(H * RW/8) row-compares, with n ~ 3H —
per-hash cost independent of H.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# D_TILE db hashes per grid step as [D/128, 128]; the big window is two
# [WBLK, 128] blocks of the sorted batch; each 128-hash db subrow
# compares against RW rows starting at its prefetched offset.
# Constraints: D_TILE % 128 == 0; WBLK % 8 == 0; RW <= WBLK.  Sizing
# couples to the batch target (screen_ops.BigDBCounter): the whole
# TILE's span plus up-to-WBLK-row misalignment must fit the 2*WBLK-row
# big window, and each subrow's span plus <=127-element misalignment
# must fit its RW rows.
D_TILE = 1024
WBLK = 16
RW = 4
LANES = 128

# SMEM budget: the per-subrow offset array (T*8 int32) must fit the
# ~1 MiB SMEM; bigger DBs run the kernel over row segments of this
# many tiles (20000 tiles -> 640 KB of offsets + 80 KB block indices).
MAX_SEG_TILES = 20000

_I0 = np.int32(0)

SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def _split_planes(x):
    """uint64 [...] -> (hi, lo) int32 planes (equality only, no bias)."""
    hi = jax.lax.bitcast_convert_type(
        (x >> jnp.uint64(32)).astype(jnp.uint32), jnp.int32
    )
    lo = jax.lax.bitcast_convert_type(x.astype(jnp.uint32), jnp.int32)
    return hi, lo


def _make_count_kernel(db_rows: int, wblk: int, rw: int):
    def kernel(blk_ref, rsub_ref, dbh_ref, dbl_ref, wh0_ref, wl0_ref,
               wh1_ref, wl1_ref, out_ref):
        t = pl.program_id(0)
        # hoisted lane<->sublane transposes (expensive inside loops)
        dbh_t = jnp.transpose(dbh_ref[:])  # [LANES, db_rows]
        dbl_t = jnp.transpose(dbl_ref[:])
        accs = []
        for dr in range(db_rows):  # static: db_rows is small
            dh = dbh_t[:, dr : dr + 1]  # [LANES, 1]
            dl = dbl_t[:, dr : dr + 1]
            # rsub is flat [T*db_rows] int32 (2D SMEM arrays lane-pad
            # 16x; RefSeq-scale T is kept in budget by segmentation)
            rs = rsub_ref[t * np.int32(db_rows) + np.int32(dr)]

            def r_body(carry, dh=dh, dl=dl, rs=rs):
                r, acc = carry
                row = rs + r
                # the RW-row window may span the two big-window blocks;
                # read the candidate row from both and select
                in0 = row < np.int32(wblk)
                h0 = wh0_ref[
                    pl.ds(jnp.minimum(row, np.int32(wblk - 1)), 1), :
                ]
                l0 = wl0_ref[
                    pl.ds(jnp.minimum(row, np.int32(wblk - 1)), 1), :
                ]
                r1 = jnp.maximum(row - np.int32(wblk), np.int32(0))
                h1 = wh1_ref[pl.ds(r1, 1), :]
                l1 = wl1_ref[pl.ds(r1, 1), :]
                wh = jnp.where(in0, h0, h1)
                wl = jnp.where(in0, l0, l1)
                eq = (dh == wh) & (dl == wl)  # [LANES, LANES]
                acc = acc + jnp.sum(eq, axis=1, dtype=jnp.int32)[
                    :, None
                ]
                return r + np.int32(1), acc

            _, acc = jax.lax.while_loop(
                lambda c: c[0] < np.int32(rw),
                r_body,
                (
                    np.int32(0),
                    jnp.zeros((LANES, 1), dtype=jnp.int32),
                ),
            )
            accs.append(acc)
        out_ref[:] = jnp.transpose(jnp.concatenate(accs, axis=1))

    return kernel


@functools.lru_cache(maxsize=None)
def _build_count(T: int, n_rows: int, D: int, wblk: int, rw: int,
                 interpret: bool):
    db_rows = D // LANES
    db_spec = pl.BlockSpec(
        (db_rows, LANES), lambda t, blk, rsub: (t, _I0)
    )
    w0 = pl.BlockSpec(
        (wblk, LANES), lambda t, blk, rsub: (blk[t], _I0)
    )
    w1 = pl.BlockSpec(
        (wblk, LANES), lambda t, blk, rsub: (blk[t] + 1, _I0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[db_spec, db_spec, w0, w0, w1, w1],
        out_specs=pl.BlockSpec(
            (db_rows, LANES), lambda t, blk, rsub: (t, _I0)
        ),
    )
    return pl.pallas_call(
        _make_count_kernel(db_rows, wblk, rw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * db_rows, LANES), jnp.int32),
        interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("T", "D", "wblk", "rw")
)
def _window_offsets(batch_sorted, sub_min, sub_max, *, T, D, wblk, rw):
    """Per-tile big-window block + per-subrow row offsets + certificate.

    ``blk[t]`` indexes the first of two WBLK-row batch blocks;
    ``rs[t, dr]`` is db subrow dr's RW-row window start relative to the
    big window; ``ok`` certifies every subrow's matching span lies in
    its window (and hence in the big window).
    """
    db_rows = D // LANES
    n = batch_sorted.shape[0]
    wsz = wblk * LANES
    n_blocks = n // wsz
    left = jnp.searchsorted(batch_sorted, sub_min, side="left")
    right = jnp.searchsorted(batch_sorted, sub_max, side="right")
    L = left.reshape(T, db_rows)
    R = right.reshape(T, db_rows)
    blk = jnp.clip(
        (L[:, 0] // wsz).astype(jnp.int32), 0, max(n_blocks - 2, 0)
    )
    base = blk.astype(jnp.int64) * wsz
    rs = jnp.clip(
        ((L - base[:, None]) // LANES).astype(jnp.int32),
        0,
        2 * wblk - rw,
    )
    win_start = base[:, None] + rs.astype(jnp.int64) * LANES
    # empty spans (R <= L: pad subrows with 0/0 bounds, or subrows no
    # batch value falls into) have nothing to count — any window is
    # fine for them and they must not fail the certificate
    nonempty = R > L
    covered = (R <= win_start + rw * LANES) & (L >= win_start)
    ok = jnp.all(jnp.where(nonempty, covered, True))
    return blk, rs, ok


def count_batch_cond(
    batch_sorted, dbh, dbl, sub_min, sub_max, counts,
    D: int = D_TILE, wblk: int = WBLK, rw: int = RW,
):
    """Like :func:`count_batch`, but the certificate never reaches the
    host: a failed batch routes to the exact sort tier *on device* via
    ``lax.cond``.  Mid-stream ``bool(ok)`` readbacks stall the dispatch
    pipeline on any hardware (through the dev tunnel each forced sync
    also pays the ~40 ms round-trip floor, serializing flushes); this
    variant keeps the whole stream readback-free, at the cost of
    forgoing the host-side
    ``k_eff`` batch adaptation (certificate failures are statistically
    unreachable for MurmurHash-uniform data, and the exact tier keeps
    pathological batches correct).

    Designed to be called inside jit.  Returns ``(counts', ok)`` with
    ``ok`` a device scalar (accumulate it; read back once at finalize).
    """
    T_full = dbh.shape[0] * LANES // D
    db_rows = D // LANES
    n_rows = batch_sorted.shape[0] // LANES
    interpret = jax.default_backend() != "tpu"
    segs = []
    ok = None
    for t0 in range(0, T_full, MAX_SEG_TILES):
        T = min(MAX_SEG_TILES, T_full - t0)
        r0, r1 = t0 * db_rows, (t0 + T) * db_rows
        blk, rs, seg_ok = _window_offsets(
            batch_sorted, sub_min[r0:r1], sub_max[r0:r1],
            T=T, D=D, wblk=wblk, rw=rw,
        )
        segs.append((T, r0, r1, blk, rs))
        ok = seg_ok if ok is None else ok & seg_ok

    def windowed(c):
        wh, wl = _split_planes(batch_sorted)
        whr = wh.reshape(n_rows, LANES)
        wlr = wl.reshape(n_rows, LANES)
        adds = []
        for T, r0, r1, blk, rs in segs:
            call = _build_count(T, n_rows, D, wblk, rw, interpret)
            adds.append(
                call(
                    blk, rs.reshape(-1), dbh[r0:r1], dbl[r0:r1],
                    whr, wlr, whr, wlr,
                )
            )
        add = (
            jnp.concatenate(adds, axis=0) if len(adds) > 1 else adds[0]
        )
        from mash_tpu.ops.screen_ops import _accum

        return _accum(c, add.reshape(-1).astype(c.dtype))

    def exact(c):
        # The 64-bit DB is rebuilt from the resident int32 planes (no
        # extra HBM residency for a branch that never runs in practice).
        from mash_tpu.ops.screen_ops import count_db_occurrences

        hi = jax.lax.bitcast_convert_type(
            dbh.reshape(-1), jnp.uint32
        ).astype(jnp.uint64)
        lo = jax.lax.bitcast_convert_type(
            dbl.reshape(-1), jnp.uint32
        ).astype(jnp.uint64)
        db64 = (hi << jnp.uint64(32)) | lo
        valid = batch_sorted != SENTINEL
        return count_db_occurrences(batch_sorted, valid, db64, c)

    return jax.lax.cond(ok, windowed, exact, counts), ok


def prepare_db_planes(db_hashes: np.ndarray, D: int = D_TILE):
    """Host-side one-time prep: pad DB, split planes, subrow bounds.

    Returns (dbh, dbl, sub_min, sub_max, H_pad) as device arrays.
    A real DB hash equal to the 2^64-1 sentinel must be handled by the
    caller (it would also match masked batch lanes).
    """
    H = len(db_hashes)
    T = -(-H // D)
    H_pad = T * D
    dbp = np.full(H_pad, SENTINEL, dtype=np.uint64)
    dbp[:H] = db_hashes
    # Span bounds per 128-value subrow, over *real* values only:
    # sentinel pads (and a real 2^64-1 db hash, counted separately by
    # the caller) would drag boundary spans across the batch's
    # masked-lane sentinel run and fail the certificate spuriously.
    subs = dbp.reshape(H_pad // LANES, LANES)
    real = subs != SENTINEL
    sub_min = subs[:, 0].copy()
    sub_max = np.where(real, subs, np.uint64(0)).max(axis=1)
    none = ~real.any(axis=1)
    sub_min[none] = 0
    sub_max[none] = 0
    dbd = jnp.asarray(dbp)
    hi, lo = _split_planes(dbd)
    return (
        hi.reshape(H_pad // LANES, LANES),
        lo.reshape(H_pad // LANES, LANES),
        jnp.asarray(sub_min),
        jnp.asarray(sub_max),
        H_pad,
    )


def count_batch(
    batch_sorted, dbh, dbl, sub_min, sub_max, counts,
    D: int = D_TILE, wblk: int = WBLK, rw: int = RW,
):
    """Count DB-hash occurrences in one sorted batch; add to counts.

    ``batch_sorted`` is uint64 [n] ascending with masked lanes at the
    top as 2^64-1 sentinels; n must be a multiple of wblk*128.  Returns
    (counts, ok): if ``ok`` is False the result must be discarded and
    the batch recounted via the fallback tier.
    """
    T_full = dbh.shape[0] * LANES // D
    db_rows = D // LANES
    wh, wl = _split_planes(batch_sorted)
    n_rows = batch_sorted.shape[0] // LANES
    whr = wh.reshape(n_rows, LANES)
    wlr = wl.reshape(n_rows, LANES)
    interpret = jax.default_backend() != "tpu"
    adds = []
    ok = None
    # segment the DB so the per-tile scalar arrays fit SMEM
    for t0 in range(0, T_full, MAX_SEG_TILES):
        T = min(MAX_SEG_TILES, T_full - t0)
        r0, r1 = t0 * db_rows, (t0 + T) * db_rows
        blk, rs, seg_ok = _window_offsets(
            batch_sorted,
            sub_min[r0:r1],
            sub_max[r0:r1],
            T=T, D=D, wblk=wblk, rw=rw,
        )
        call = _build_count(T, n_rows, D, wblk, rw, interpret)
        adds.append(
            call(
                blk, rs.reshape(-1), dbh[r0:r1], dbl[r0:r1],
                whr, wlr, whr, wlr,
            )
        )
        ok = seg_ok if ok is None else (ok & seg_ok)
    add = jnp.concatenate(adds, axis=0) if len(adds) > 1 else adds[0]
    # DB pad entries are sentinels: they match masked batch lanes, but
    # their counts land in pad slots the caller strips.
    from mash_tpu.ops.screen_ops import _accum

    return _accum(counts, add.reshape(-1).astype(counts.dtype)), ok
