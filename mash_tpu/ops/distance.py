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

This vectorizes as two ``searchsorted`` passes per pair — O(s log s) work
with no sequential dependence — and batches over pair tiles with ``vmap``.
Sketches are padded to a fixed width with the EMPTY sentinel (2^64-1).

Containment (``within``) uses the same machinery with the asymmetric walk
of ``src/mash/CommandContain.cpp:231-263``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

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


def _pair_common_denom(a, na, b, nb, cap):
    """(common, denom) for one sketch pair; a, b sorted uint64 [s]."""
    s = a.shape[0]
    pos = jnp.arange(s, dtype=jnp.int32)
    a_real = pos < na

    idx = jnp.searchsorted(b, a)  # number of b-elements < a[i]
    in_range = idx < nb
    b_at = jnp.where(in_range, b[jnp.minimum(idx, s - 1)], ~EMPTY)
    match = a_real & in_range & (b_at == a)

    total_matches = jnp.sum(match, dtype=jnp.int32)
    union = na + nb - total_matches
    denom = jnp.minimum(cap, union)

    cum = jnp.cumsum(match.astype(jnp.int32))  # matches among a[0..i]
    union_rank = (pos + 1) + (idx.astype(jnp.int32) + 1) - cum
    common = jnp.sum(match & (union_rank <= denom), dtype=jnp.int32)
    return common, denom


@functools.partial(jax.jit, static_argnames=("cap",))
def pairwise_common_denom(qry, nqry, ref, nref, *, cap: int):
    """All-pairs (common, denom) between two sketch matrices.

    Args:
      qry: uint64 ``[NQ, s]`` sorted, EMPTY-padded.
      nqry: int32 ``[NQ]`` real sizes.
      ref: uint64 ``[NR, s]``.
      nref: int32 ``[NR]``.
      cap: the reference's ``sketchSize`` denominator cap
        (min of the two sketch targets, ``CommandDistance.cpp:313-315``).

    Returns:
      (common, denom) int32 arrays of shape ``[NQ, NR]``.
    """
    f = jax.vmap(
        jax.vmap(_pair_common_denom, in_axes=(None, None, 0, 0, None)),
        in_axes=(0, 0, None, None, None),
    )
    return f(qry, nqry, ref, nref, cap)


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
        idx = jnp.searchsorted(r, q)
        in_range = idx < nr
        r_at = jnp.where(in_range, r[jnp.minimum(idx, s - 1)], ~EMPTY)
        match = q_real & in_range & (r_at == q)
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


def common_denom_tiled(
    qry_h,
    qry_n,
    ref_h,
    ref_n,
    cap: int,
    tile_q: int = 64,
    tile_r: int = 64,
):
    """Host-tiled wrapper bounding device memory for big pair matrices.

    Pads both sketch sets to tile multiples and loops tiles on host; each
    tile is one compiled program.  Returns numpy int32 [NQ, NR] arrays.
    """
    nq, s = qry_h.shape
    nr = ref_h.shape[0]
    common = np.zeros((nq, nr), dtype=np.int32)
    denom = np.zeros((nq, nr), dtype=np.int32)

    def padded(arr, n, tile, fill):
        m = ((n + tile - 1) // tile) * tile
        if m == n:
            return arr
        pad = np.full((m - n,) + arr.shape[1:], fill, dtype=arr.dtype)
        return np.concatenate([arr, pad], axis=0)

    qh = padded(qry_h, nq, tile_q, np.uint64(0xFFFFFFFFFFFFFFFF))
    qn = padded(qry_n, nq, tile_q, 0)
    rh = padded(ref_h, nr, tile_r, np.uint64(0xFFFFFFFFFFFFFFFF))
    rn = padded(ref_n, nr, tile_r, 0)

    for qi in range(0, qh.shape[0], tile_q):
        for ri in range(0, rh.shape[0], tile_r):
            c, d = pairwise_common_denom(
                jnp.asarray(qh[qi : qi + tile_q]),
                jnp.asarray(qn[qi : qi + tile_q]),
                jnp.asarray(rh[ri : ri + tile_r]),
                jnp.asarray(rn[ri : ri + tile_r]),
                cap=cap,
            )
            cq = min(tile_q, nq - qi)
            cr = min(tile_r, nr - ri)
            if cq > 0 and cr > 0:
                common[qi : qi + cq, ri : ri + cr] = np.asarray(c)[:cq, :cr]
                denom[qi : qi + cq, ri : ri + cr] = np.asarray(d)[:cq, :cr]
    return common, denom
