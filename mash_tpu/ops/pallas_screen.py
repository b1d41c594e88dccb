"""Pallas TPU kernel for big-DB screen counting.

Problem: ``mash screen`` against a RefSeq-scale DB (H = 1e7..1e9 sorted
distinct hashes) must count, for every DB hash, its occurrences in a
streamed k-mer mixture.  The round-1 top tier re-sorted
``[chunk, db, db]`` per 1 MiB chunk — O((n + 2H) log) with the static
DB paying the sort cost again every chunk; at H = 1e8 that is ~seconds
per chunk.

Design here (sorted-window equality count):
- chunks accumulate into a device batch; one sort per batch
  (~K x 1 MiB) replaces K DB re-sorts;
- the DB is tiled into [D]-hash blocks (static, sorted, split into
  int32 hi/lo planes once); because both sides are sorted, the batch
  positions that can match DB tile t form one contiguous window whose
  start is precomputed with a searchsorted over tile boundaries (tiny:
  H/D queries per batch);
- a Pallas grid walks the DB tiles; each step loads its [D, 1] DB
  block plus two consecutive [G/128, 128] blocks of the sorted batch
  selected by a *scalar-prefetched* block offset (Mosaic requires
  8-sublane-aligned blocks, hence the two-block window trick: a span
  of <= G elements starting anywhere is always covered by two
  G-aligned blocks), and counts exact 64-bit equality by broadcast
  compare-reduce — no gather, no scatter, no DB sort;
- a coverage certificate (every tile's matching span of *real* db
  values lies inside its 2G window) is checked per batch; failure
  (pathologically skewed hashes — impossible for MurmurHash-uniform
  data) falls back to the exact sort tier, the repo's standard
  certificate+fallback pattern.

Work per batch is O(H * G/D + n) compares instead of
O((n + 2H) log(n + 2H)) sorted elements per chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# DB tile height and window granularity (elements).  Both must be
# multiples of 1024 (8 sublanes x 128 lanes) on real TPUs so every
# block is (8m, 128)-shaped.  Each grid step compares a D-hash db tile
# against a 2G-element window of the sorted batch.
D_TILE = 1024
G_WIN = 1024
LANES = 128

_I0 = np.int32(0)

SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def _split_planes(x):
    """uint64 [...] -> (hi, lo) int32 planes (equality only, no bias)."""
    hi = jax.lax.bitcast_convert_type(
        (x >> jnp.uint64(32)).astype(jnp.uint32), jnp.int32
    )
    lo = jax.lax.bitcast_convert_type(x.astype(jnp.uint32), jnp.int32)
    return hi, lo


def _make_count_kernel(rows: int, db_rows: int):
    def kernel(offs_ref, dbh_ref, dbl_ref, wh0_ref, wl0_ref,
               wh1_ref, wl1_ref, out_ref):
        # db tile arrives in the natural [db_rows, 128] layout (a
        # [D, 1] HBM layout would lane-pad 128x); each 128-lane subrow
        # is transposed to sublane-major for the cross broadcast.
        # Runtime while_loops (int32 counters: fori would carry an i64
        # induction var under x64) instead of static unrolling — the
        # unrolled form was db_rows*rows*2 compare blocks and took
        # minutes to compile through Mosaic.
        # hoist the lane<->sublane transposes: two on the db planes,
        # one on the assembled output — transposes inside the loops
        # dominated runtime in the first version
        dbh_t = jnp.transpose(dbh_ref[:])  # [LANES, db_rows]
        dbl_t = jnp.transpose(dbl_ref[:])
        accs = []
        for dr in range(db_rows):  # static: db_rows is small (8)
            dh = dbh_t[:, dr : dr + 1]  # [LANES, 1]
            dl = dbl_t[:, dr : dr + 1]

            def r_body(carry, dh=dh, dl=dl):
                r, acc = carry
                eq0 = (dh == wh0_ref[pl.ds(r, 1), :]) & (
                    dl == wl0_ref[pl.ds(r, 1), :]
                )  # [LANES, LANES]
                eq1 = (dh == wh1_ref[pl.ds(r, 1), :]) & (
                    dl == wl1_ref[pl.ds(r, 1), :]
                )
                acc = (
                    acc
                    + jnp.sum(eq0, axis=1, dtype=jnp.int32)[:, None]
                    + jnp.sum(eq1, axis=1, dtype=jnp.int32)[:, None]
                )
                return r + np.int32(1), acc

            _, acc = jax.lax.while_loop(
                lambda c: c[0] < np.int32(rows),
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
def _build_count(T: int, n_rows: int, D: int, G: int,
                 interpret: bool):
    rows = G // LANES
    db_rows = D // LANES
    db_spec = pl.BlockSpec(
        (db_rows, LANES), lambda t, offs: (t, _I0)
    )
    w0 = pl.BlockSpec((rows, LANES), lambda t, offs: (offs[t], _I0))
    w1 = pl.BlockSpec(
        (rows, LANES), lambda t, offs: (offs[t] + 1, _I0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[db_spec, db_spec, w0, w0, w1, w1],
        out_specs=pl.BlockSpec(
            (db_rows, LANES), lambda t, offs: (t, _I0)
        ),
    )
    return pl.pallas_call(
        _make_count_kernel(rows, db_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * db_rows, LANES), jnp.int32),
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("T", "G"))
def _window_offsets(batch_sorted, tile_min, tile_max, *, T, G):
    """Per-tile window block offsets + coverage certificate.

    ``offs[t]`` is the G-aligned block index of the sorted batch from
    which DB tile t's 2G-element window starts; ``ok`` certifies every
    tile's matching span lies inside its window.
    """
    n = batch_sorted.shape[0]
    n_blocks = n // G
    left = jnp.searchsorted(batch_sorted, tile_min, side="left")
    right = jnp.searchsorted(batch_sorted, tile_max, side="right")
    offs = jnp.clip(
        (left // G).astype(jnp.int32), 0, max(n_blocks - 2, 0)
    )
    end = (offs.astype(jnp.int64) + 2) * G
    ok = jnp.all(right <= end) & jnp.all(
        left >= offs.astype(jnp.int64) * G
    )
    return offs, ok


def prepare_db_planes(db_hashes: np.ndarray, D: int = D_TILE):
    """Host-side one-time prep: pad DB to tiles, split planes, bounds.

    Returns (dbh, dbl, tile_min, tile_max, H_pad) as device arrays.
    A real DB hash equal to the 2^64-1 sentinel must be handled by the
    caller (it would also match masked batch lanes).
    """
    H = len(db_hashes)
    T = -(-H // D)
    H_pad = T * D
    dbp = np.full(H_pad, SENTINEL, dtype=np.uint64)
    dbp[:H] = db_hashes
    tile_min = dbp[::D].copy()
    # The window span certificate must cover only *real* (non-sentinel)
    # db values: sentinel pads (and a real 2^64-1 db hash, counted
    # separately by the caller) would drag every boundary tile's
    # "right" rank across the batch's masked-lane sentinel run and
    # fail the certificate spuriously.
    tiles = dbp.reshape(T, D)
    real = tiles != SENTINEL
    tile_max = np.where(real, tiles, np.uint64(0)).max(axis=1)
    none = ~real.any(axis=1)
    tile_min[none] = 0
    tile_max[none] = 0
    dbd = jnp.asarray(dbp)
    hi, lo = _split_planes(dbd)
    return (
        hi.reshape(H_pad // LANES, LANES),
        lo.reshape(H_pad // LANES, LANES),
        jnp.asarray(tile_min),
        jnp.asarray(tile_max),
        H_pad,
    )


def count_batch(
    batch_sorted, dbh, dbl, tile_min, tile_max, counts,
    D: int = D_TILE, G: int = G_WIN,
):
    """Count DB-hash occurrences in one sorted batch; add to counts.

    ``batch_sorted`` is uint64 [n] ascending with masked lanes at the
    top as 2^64-1 sentinels; n must be a multiple of G.  Returns
    (counts, ok): if ``ok`` is False the result must be discarded and
    the batch recounted via the fallback tier.
    """
    T = dbh.shape[0] * LANES // D
    offs, ok = _window_offsets(
        batch_sorted, tile_min, tile_max, T=T, G=G
    )
    wh, wl = _split_planes(batch_sorted)
    n_rows = batch_sorted.shape[0] // LANES
    call = _build_count(
        T, n_rows, D, G, jax.default_backend() != "tpu"
    )
    whr = wh.reshape(n_rows, LANES)
    wlr = wl.reshape(n_rows, LANES)
    add = call(offs, dbh, dbl, whr, wlr, whr, wlr)
    # DB pad entries are sentinels: they match masked batch lanes, but
    # their counts land in pad slots the caller strips.
    return counts + add.reshape(-1).astype(counts.dtype), ok
