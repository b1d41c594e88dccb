"""Bottom-s MinHash selection as fixed-shape sort/merge array programs.

The reference maintains the s smallest *distinct* k-mer hashes (with
multiplicities) in a heap + hash-map (``src/mash/MinHashHeap.cpp:68-146``,
``HashSet.cpp``, ``HashPriorityQueue.h``).  Selecting the bottom s distinct
values is associative and commutative, so on TPU it becomes:

  per chunk:   sort -> run-detect -> scatter first s distinct (+ counts)
  across chunks/devices:  merge two states by concat -> sort -> re-dedupe

which makes sketch construction embarrassingly parallel over chunks *and*
over devices (states merge with the same operator after an ``all_gather``).

Counts produced here are **total occurrence counts** of each surviving hash
(order-independent).  The reference's streaming heap can count slightly
differently for hashes that sit exactly at the heap boundary while it is
full (an occurrence equal to the current heap maximum is not counted,
``MinHashHeap.cpp:68-74``), and its ``-m``/``-b`` noise-filter gating is
stream-order dependent.  The sketch *hash set* itself is identical for the
default ``min_cov == 1`` path.  An exact-streaming host fallback is provided
in ``mash_tpu.native`` (ExactHeap) for byte-parity of ``-m``/``-b`` modes.

State representation: ``(hashes[s] uint64 ascending, counts[s] int64)``,
empty slots have ``counts == 0`` and hash ``EMPTY`` (2^64-1; real hashes
with that value are still tracked correctly because emptiness is defined by
``counts == 0``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# numpy (not jnp) scalar: creating a device constant at import time
# would initialize the XLA backend before jax.distributed can run
# (multi-host CLI launches must import freely pre-init); numpy uint64
# scalars are strongly typed, so jnp math treats it identically
EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)


def empty_state(s: int):
    """An empty bottom-s sketch state."""
    return (
        jnp.full((s,), EMPTY, dtype=jnp.uint64),
        jnp.zeros((s,), dtype=jnp.int64),
    )


def _fold_sorted(hs, cs, s: int):
    """Bottom-s distinct (+summed counts) of an ascending hash array.

    Args:
      hs: uint64 ``[L]`` ascending; entries with ``cs == 0`` are ignored
        (they must have been mapped to ``EMPTY`` so they sort last).
      cs: int64 ``[L]`` counts aligned with ``hs``.
      s: static sketch size.

    Returns:
      ``(H[s], C[s])`` state.
    """
    L = hs.shape[0]
    is_new = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), hs[1:] != hs[:-1]]
    )
    # Positions of the first s+1 run starts, found with top_k over negated
    # positions (a 1M-element scatter into s slots is pathologically slow
    # on TPU; top_k is a fast built-in partial sort).
    iota = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)[:, 0]
    big = jnp.int32(2**30)
    keys = jnp.where(is_new, iota, big)
    pos = -jax.lax.top_k(-keys, min(s + 1, L))[0]  # ascending run starts
    if s + 1 > L:
        pos = jnp.concatenate(
            [pos, jnp.full((s + 1 - L,), big, dtype=jnp.int32)]
        )
    in_range = pos < L
    safe = jnp.minimum(pos, L - 1)

    # exclusive count prefix: int64 jnp.cumsum lowers to a variadic
    # (hi, lo)-u32 reduce-window on TPU whose scoped-vmem footprint
    # blows up at some shapes ("should not be possible to run out of
    # scoped vmem" XLA errors); log-doubling shifted adds stay
    # elementwise and exact
    cum = cs
    d = 1
    while d < L:
        cum = cum + jnp.concatenate(
            [jnp.zeros((d,), cum.dtype), cum[:-d]]
        )
        d *= 2
    excl = cum - cs
    total = excl[-1] + cs[-1]
    EX = jnp.where(in_range, excl[safe], total)
    C = EX[1:] - EX[:-1]  # counts of runs 0..s-1
    H = jnp.where(in_range[:s], hs[safe[:s]], EMPTY)
    H = jnp.where(C > 0, H, EMPTY)
    C = jnp.maximum(C, 0)
    return H, C


@functools.partial(jax.jit, static_argnames=("s",))
def sketch_chunk(hashes, valid, *, s: int):
    """Bottom-s distinct hashes (+occurrence counts) of one hashed chunk.

    Args:
      hashes: uint64 ``[n]`` window hashes (``ops.kmers.hash_chunk``).
      valid: bool ``[n]`` window validity mask.
      s: static sketch size.
    """
    h = jnp.where(valid, hashes, EMPTY)
    c = valid.astype(jnp.int64)
    h, c = jax.lax.sort((h, c), num_keys=1)
    return _fold_sorted(h, c, s)


def candidate_budget(s: int, C: int, n: int) -> int:
    """Per-subrow candidate budget m for hierarchical bottom-s selection.

    With uniform hashes, a C-wide subrow of an n-window chunk holds
    Poisson(~1.2*s*C/n) of the globally relevant bottom hashes; a floor
    of 16 plus 6 lambdas of headroom makes an overflow (-> verified
    fallback) vanishingly rare while keeping the per-subrow selection
    tiny.  Shared by the XLA fold and the fused Pallas kernel.
    """
    lam = max(1.0, 1.2 * s * C / n)
    m = 16
    while m < 6 * lam:
        m *= 2
    return m


@functools.partial(jax.jit, static_argnames=("s", "use64"))
def sketch_chunk_batch(hashes, valid, *, s: int, use64: bool = True):
    """Exact bottom-s fold of ``[B, n]`` hashed chunks, top-k windowed.

    Semantically identical to ``vmap(sketch_chunk)`` but ~5x faster for
    large chunks: instead of fully sorting every n-element row (the
    dominant cost of sketching), candidates are selected hierarchically —
    each row is split into short subrows and an exact ``lax.top_k``
    takes the m smallest keys of each (tiny-k top_k over many short rows
    is much cheaper on TPU than one top_k over the full row) — then
    only the gathered candidate window is sorted and folded.  A per-row
    exactness certificate is verified on the full 64-bit values (see
    inline comments); a row can only be inexact for pathologically
    repetitive input (a single subrow holding more than m of the
    globally-relevant hashes), and any failure makes the whole batch
    fall back to the full-sort path inside a ``lax.cond`` — same result,
    original speed.  The fast result is never used unverified.

    Args:
      hashes: uint64 ``[B, n]``.
      valid: bool ``[B, n]``.
      s: static sketch size.
      use64: whether hashes use 64 bits (keys = high 32 bits) or fit in
        32 bits (keys = the hash itself), per ``src/mash/hash.cpp:21-35``.

    Returns:
      ``(H [B, s], C [B, s])`` stacked states.
    """
    B, n = hashes.shape
    C = 2048  # subrow width: top_k cost scales with C, so keep it small
    if n <= 16 * C or s * 8 > n:
        return jax.vmap(
            lambda h, v: sketch_chunk(h, v, s=s)
        )(hashes, valid)
    # This function reads ``hashes`` three times (selection keys, window
    # gather, exactness count); without a barrier XLA re-fuses the whole
    # upstream hash pipeline into each consumer, tripling the dominant
    # cost.  Materialize once.
    hashes, valid = jax.lax.optimization_barrier((hashes, valid))
    plain = lambda: jax.vmap(
        lambda h, v: sketch_chunk(h, v, s=s)
    )(hashes, valid)

    m = min(candidate_budget(s, C, n), C)
    R = (n + C - 1) // C

    # selection keys: high 32 hash bits (the hash itself in 32-bit mode),
    # as sign-flipped int32 so signed compares give unsigned order;
    # invalid windows get the maximum key.
    shift = jnp.uint64(32 if use64 else 0)
    hi = (hashes >> shift).astype(jnp.uint32)
    hi = jnp.where(valid, hi, jnp.uint32(0xFFFFFFFF))
    sign = jnp.int32(-(2**31))
    negkey = jax.lax.bitcast_convert_type(~hi, jnp.int32) ^ sign
    if R * C != n:
        pad = jnp.full((B, R * C - n), jnp.int32(-(2**31)), jnp.int32)
        negkey = jnp.concatenate([negkey, pad], axis=1)
    _, li = jax.lax.top_k(negkey.reshape(B * R, C), m)
    base = (
        jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)[:, 0] * C
    )
    idx = (li.reshape(B, R, m) + base[None, :, None]).reshape(B, R * m)
    # Pad-region picks clamp onto position n-1 and MUST be masked out:
    # a clamped duplicate of a valid element would otherwise corrupt
    # counts and could satisfy the all_valid_in certificate spuriously.
    is_real = idx < n
    idx = jnp.minimum(idx, n - 1)

    cand_h = jnp.take_along_axis(hashes, idx, axis=1)
    cand_v = jnp.take_along_axis(valid, idx, axis=1) & is_real
    ch = jnp.where(cand_v, cand_h, EMPTY)
    cc = cand_v.astype(jnp.int64)
    ch, cc = jax.lax.sort((ch, cc), dimension=1, num_keys=1)
    Hf, Cf = jax.vmap(lambda a, b: _fold_sorted(a, b, s))(ch, cc)

    # Exactness proof per row:
    #  (a) every valid element is in the window (tiny/filtered chunks), or
    #  (b) the fold yielded >= s distinct values AND the number of valid
    #      occurrences <= X (the s-th kept distinct) in the window equals
    #      that in the whole chunk — no occurrence of any value <= X was
    #      missed, so both the kept hash set and its counts are complete.
    # Pad-clamp duplicates cannot corrupt either count: cand_v ANDs in
    # is_real above, so clamped picks are masked invalid and excluded
    # from win_cnt; the certificate is sound because win_cnt <= full_cnt
    # always, with equality iff the window saw every occurrence <= X.
    ndist = jnp.sum(Cf > 0, axis=1)
    x = Hf[:, s - 1][:, None]  # [B, 1]
    full_cnt = jnp.sum(valid & (hashes <= x), axis=1)
    win_cnt = jnp.sum(cand_v & (cand_h <= x), axis=1)
    covered = (ndist >= s) & (win_cnt == full_cnt)
    all_valid_in = jnp.sum(cand_v, axis=1) == jnp.sum(valid, axis=1)
    exact = covered | all_valid_in
    return jax.lax.cond(
        jnp.all(exact), lambda: (Hf, Cf), plain
    )


@functools.partial(jax.jit, static_argnames=("s",))
def merge_states(state_a, state_b, *, s: int):
    """Merge two bottom-s states (associative + commutative)."""
    ha, ca = state_a
    hb, cb = state_b
    h = jnp.concatenate([ha, hb])
    c = jnp.concatenate([ca, cb])
    h, c = jax.lax.sort((h, c), num_keys=1)
    return _fold_sorted(h, c, s)


@functools.partial(jax.jit, static_argnames=("s",))
def tree_merge(states_h, states_c, *, s: int):
    """Merge ``[B, s]`` stacked states into one state.

    A single concat+sort is cheaper than a log-depth tree for the sizes at
    play (B*s elements).
    """
    h = states_h.reshape(-1)
    c = states_c.reshape(-1)
    h, c = jax.lax.sort((h, c), num_keys=1)
    return _fold_sorted(h, c, s)


def state_stats(state):
    """(size, max_hash, multiplicity_sum) of a state, as host scalars.

    Mirrors the quantities behind the reference's estimators
    (``MinHashHeap.h:44-45``): ``size`` = heap fill, ``max_hash`` = heap
    top, ``multiplicity_sum`` = sum of stored multiplicities.
    """
    h, c = state
    filled = c > 0
    size = int(jnp.sum(filled))
    if size == 0:
        return 0, 0, 0
    mx = int(h[size - 1])
    msum = int(jnp.sum(c))
    return size, mx, msum


def estimate_set_size(state, use64: bool = True) -> float:
    """Distinct-element cardinality estimate (``MinHashHeap.h:45``)."""
    size, mx, _ = state_stats(state)
    if size == 0:
        return 0.0
    bits = 64.0 if use64 else 32.0
    return (2.0 ** bits) * size / float(mx)


def estimate_multiplicity(state) -> float:
    """Average k-mer multiplicity estimate (``MinHashHeap.h:44``)."""
    size, _, msum = state_stats(state)
    if size == 0:
        return 0.0
    return msum / size
