"""Pallas TPU kernel for all-pairs sorted-sketch intersection.

Computes the same (common, denom) matrices as
``mash_tpu.ops.distance.pairwise_common_denom`` (the reference semantics
of ``src/mash/CommandDistance.cpp:336-425``: merge-walk intersection with
the union-size cap), but as a VMEM-resident Pallas kernel instead of an
HBM-materialized batched sort.

Why: the XLA formulation materializes a ``[NQ*NR, 2s]`` merge buffer in
HBM and streams it through ~11 bitonic stages + a cumsum — each pair's
rows are duplicated NQ*NR times, so the op is hopelessly HBM-bandwidth
bound (~0.5M pairs/s on one chip).  Here each grid cell loads a
``[TQ, s]`` query block and a ``[TR, s]`` reference block into VMEM once
and performs all TQ*TR merges on-chip, so HBM traffic is O(N*s) instead
of O(N^2 * s).

TPU has no native uint64 lanes, so 64-bit hashes are pre-split into two
int32 planes with the *unsigned* order embedded by XOR-ing the sign bit
(``a <u b  <=>  (a ^ 0x80000000) <s (b ^ 0x80000000)``).  The merge of
two sorted rows is one bitonic-merge pass (concat with a descending
second row, then log2(2s) roll/min/max stages); matches are
neighbor-equal pairs, and the union-rank cap is applied via a lane
cumsum exactly as in the XLA kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SIGN = jnp.int32(-(2**31))

# index-map literals must be int32: a bare python 0 traces to an i64
# constant under x64, and Mosaic cannot return i64 from the block
# transform functions.
_I0 = np.int32(0)


def _roll(x, shift):
    """Lane-axis circular shift; jnp.roll lowers to a lane rotate on TPU."""
    return jnp.roll(x, shift, axis=1)


def _split_biased(x):
    """uint64 [..., s] -> (hi, lo) int32 planes with unsigned order."""
    hi = jax.lax.bitcast_convert_type(
        (x >> jnp.uint64(32)).astype(jnp.uint32), jnp.int32
    )
    lo = jax.lax.bitcast_convert_type(x.astype(jnp.uint32), jnp.int32)
    return hi ^ _SIGN, lo ^ _SIGN


def _lt64(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al < bl))


def _kernel_body(qh_ref, ql_ref, nq_ref, rh_ref, rl_ref, nr_ref,
                 common_ref, denom_ref, *, sp, tq, tr, cap, empty_hi):
    """One (TQ query rows) x (TR ref rows) tile, output transposed [TR, TQ]."""
    m = 2 * sp
    qh = qh_ref[:]
    ql = ql_ref[:]
    nq = nq_ref[:, 0]  # [TQ]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, m), 1)

    def body(j):
        # ref row j arrives pre-reversed (descending), so concat is bitonic
        rh = rh_ref[pl.ds(j, 1), :]
        rl = rl_ref[pl.ds(j, 1), :]
        nr = nr_ref[pl.ds(j, 1), 0]  # [1]
        zh = jnp.concatenate([qh, jnp.broadcast_to(rh, (tq, sp))], axis=1)
        zl = jnp.concatenate([ql, jnp.broadcast_to(rl, (tq, sp))], axis=1)

        d = sp
        while d >= 1:
            # Compare-exchange with partner i^d: compute min/max of
            # (z[i], z[i+d]) once, then lanes with bit d clear take the
            # min in place while lanes with bit d set take the max of
            # the pair below them (= roll(max, +d)).  One 64-bit compare
            # and 3 rolls per stage instead of 2 compares and 4 rolls;
            # wrapped lanes are never selected.
            nh = _roll(zh, m - d)
            nl = _roll(zl, m - d)
            lt = _lt64(zh, zl, nh, nl)
            mnh = jnp.where(lt, zh, nh)
            mnl = jnp.where(lt, zl, nl)
            mxh = jnp.where(lt, nh, zh)
            mxl = jnp.where(lt, nl, zl)
            is_lo = (lane & d) == 0
            zh = jnp.where(is_lo, mnh, _roll(mxh, d))
            zl = jnp.where(is_lo, mnl, _roll(mxl, d))
            d //= 2

        nxt_h = _roll(zh, m - 1)
        nxt_l = _roll(zl, m - 1)
        eq = (
            (zh == nxt_h)
            & (zl == nxt_l)
            # exclude only the exact EMPTY sentinel (both planes at the
            # biased max), matching the XLA kernel's `x != EMPTY`
            & (~((zh == empty_hi) & (zl == empty_hi)))
            & (lane < m - 1)
        )
        e = eq.astype(jnp.int32)
        cum = e
        d = 1
        while d < m:
            # NB: literal branches / python-int args would promote to a
            # weak int64 const under x64 and emit an i64->i32 convert,
            # which Mosaic cannot lower — keep everything int32.
            cum = cum + jnp.where(
                lane >= d, _roll(cum, d), jnp.zeros_like(cum)
            )
            d *= 2
        total = cum[:, m - 1]  # [TQ]
        denom = jnp.minimum(np.int32(cap), nq + nr - total)  # [TQ]
        cumex = cum - e
        rank = lane + 1 - cumex
        common = jnp.sum(
            eq & (rank <= denom[:, None]), axis=1, dtype=jnp.int32
        )  # [TQ]
        common_ref[pl.ds(j, 1), :] = common[None, :]
        denom_ref[pl.ds(j, 1), :] = denom[None, :].astype(jnp.int32)
        return j + np.int32(1)

    # while_loop with an int32 counter: fori_loop would lower to a scan
    # whose induction variable is i64 under x64, which Mosaic can't carry.
    jax.lax.while_loop(lambda j: j < np.int32(tr), body, np.int32(0))


def _kernel_body32(q_ref, nq_ref, r_ref, nr_ref,
                   common_ref, denom_ref, *, sp, tq, tr, cap, empty_key):
    """Single-plane variant for 32-bit hashes (k <= 16 sketches).

    Identical algorithm to ``_kernel_body`` with half the merge work:
    the hash fits one biased-int32 lane, so each bitonic stage needs one
    compare and no pair-plane selects.
    """
    m = 2 * sp
    q = q_ref[:]
    nq = nq_ref[:, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, m), 1)

    def body(j):
        r = r_ref[pl.ds(j, 1), :]
        nr = nr_ref[pl.ds(j, 1), 0]
        z = jnp.concatenate([q, jnp.broadcast_to(r, (tq, sp))], axis=1)
        d = sp
        while d >= 1:
            nxt = _roll(z, m - d)
            mn = jnp.minimum(z, nxt)
            mx = jnp.maximum(z, nxt)
            is_lo = (lane & d) == 0
            z = jnp.where(is_lo, mn, _roll(mx, d))
            d //= 2
        eq = (
            (z == _roll(z, m - 1))
            & (z != empty_key)
            & (lane < m - 1)
        )
        e = eq.astype(jnp.int32)
        cum = e
        d = 1
        while d < m:
            cum = cum + jnp.where(
                lane >= d, _roll(cum, d), jnp.zeros_like(cum)
            )
            d *= 2
        total = cum[:, m - 1]
        denom = jnp.minimum(np.int32(cap), nq + nr - total)
        cumex = cum - e
        rank = lane + 1 - cumex
        common = jnp.sum(
            eq & (rank <= denom[:, None]), axis=1, dtype=jnp.int32
        )
        common_ref[pl.ds(j, 1), :] = common[None, :]
        denom_ref[pl.ds(j, 1), :] = denom[None, :].astype(jnp.int32)
        return j + np.int32(1)

    jax.lax.while_loop(lambda j: j < np.int32(tr), body, np.int32(0))


@functools.lru_cache(maxsize=None)
def _build32(nq_t, nr_t, sp, tq, tr, cap, interpret):
    kern = functools.partial(
        _kernel_body32,
        sp=sp,
        tq=tq,
        tr=tr,
        cap=cap,
        empty_key=0x7FFFFFFF,  # biased form of the 0xFFFFFFFF pad
    )
    grid = (nq_t // tq, nr_t // tr)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, sp), lambda i, j: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 1), lambda i, j: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, sp), lambda i, j: (j, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i, j: (j, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, tq), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, tq), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nr_t, nq_t), jnp.int32),
            jax.ShapeDtypeStruct((nr_t, nq_t), jnp.int32),
        ],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _build(nq_t, nr_t, sp, tq, tr, cap, interpret):
    kern = functools.partial(
        _kernel_body,
        sp=sp,
        tq=tq,
        tr=tr,
        cap=cap,
        # EMPTY = 2^64-1: both biased planes are 0x7FFFFFFF (int32 max);
        # the kernel masks a lane only when hi AND lo match the sentinel,
        # so any real hash sharing just the top 32 bits still counts.
        empty_hi=0x7FFFFFFF,
    )
    grid = (nq_t // tq, nr_t // tr)
    flops_per_pair = 2 * sp * (int(np.log2(2 * sp)) * 14 + 30)
    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, sp), lambda i, j: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, sp), lambda i, j: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 1), lambda i, j: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, sp), lambda i, j: (j, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, sp), lambda i, j: (j, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i, j: (j, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, tq), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, tq), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nr_t, nq_t), jnp.int32),
            jax.ShapeDtypeStruct((nr_t, nq_t), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=grid[0] * grid[1] * tq * tr * flops_per_pair,
            bytes_accessed=(nq_t + nr_t) * sp * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    return call


def _pad_rows(x, mult, fill):
    n = x.shape[0]
    m = ((n + mult - 1) // mult) * mult
    if m == n:
        return x
    pad = jnp.full((m - n,) + x.shape[1:], fill, dtype=x.dtype)
    return jnp.concatenate([x, pad], axis=0)


@functools.partial(jax.jit, static_argnames=("cap", "tq", "tr"))
def pairwise_common_denom_keys32(
    qry, nqry, ref, nref, *, cap: int, tq: int = 128, tr: int = 128
):
    """Single-plane pairwise kernel over uint32 comparison keys.

    Entry for rank-compressed sketches (``distance.rank_compress``):
    ``qry``/``ref`` are uint32 ``[N, s]`` sorted key matrices with
    0xFFFFFFFF sentinel padding.  Same contract/outputs as
    ``pairwise_common_denom_pallas`` but ~1.7x faster for 64-bit hash
    inputs because the merge carries one int32 plane instead of two.
    """
    nq, s = qry.shape
    nr = ref.shape[0]
    sp = 1
    while sp < max(s, 128):
        sp *= 2
    sent = jnp.uint32(0xFFFFFFFF)
    if sp != s:
        qry = jnp.concatenate(
            [qry, jnp.full((nq, sp - s), sent, dtype=jnp.uint32)],
            axis=1,
        )
        ref = jnp.concatenate(
            [ref, jnp.full((nr, sp - s), sent, dtype=jnp.uint32)],
            axis=1,
        )
    tq = min(tq, 8 * ((nq + 7) // 8))
    tr = min(tr, 8 * ((nr + 7) // 8))
    nqa = _pad_rows(nqry.astype(jnp.int32)[:, None], tq, jnp.int32(0))
    nra = _pad_rows(nref.astype(jnp.int32)[:, None], tr, jnp.int32(0))
    qk = jax.lax.bitcast_convert_type(qry, jnp.int32) ^ _SIGN
    rk = jax.lax.bitcast_convert_type(ref[:, ::-1], jnp.int32) ^ _SIGN
    qk = _pad_rows(qk, tq, jnp.int32(0x7FFFFFFF))
    rk = _pad_rows(rk, tr, jnp.int32(0x7FFFFFFF))
    interpret = jax.default_backend() != "tpu"
    call = _build32(qk.shape[0], rk.shape[0], sp, tq, tr, cap, interpret)
    common_t, denom_t = call(qk, nqa, rk, nra)
    return common_t.T[:nq, :nr], denom_t.T[:nq, :nr]


@functools.partial(
    jax.jit, static_argnames=("cap", "tq", "tr", "use64")
)
def pairwise_common_denom_pallas(
    qry, nqry, ref, nref, *, cap: int, tq: int = 128, tr: int = 128,
    use64: bool = True
):
    """Drop-in Pallas version of ``pairwise_common_denom``.

    Args/returns identical to ``distance.pairwise_common_denom``:
    uint64 ``[NQ, s]`` / ``[NR, s]`` sorted EMPTY-padded sketch matrices
    with int32 true sizes; returns int32 ``(common, denom)`` of shape
    ``[NQ, NR]``.  With ``use64=False`` (hashes < 2^32, i.e. k <= 16
    nucleotide sketches) a single-plane kernel runs at ~2x.
    """
    nq, s = qry.shape
    nr = ref.shape[0]
    sp = 1
    while sp < max(s, 128):
        sp *= 2
    empty = jnp.uint64(0xFFFFFFFFFFFFFFFF)
    if sp != s:
        qry = jnp.concatenate(
            [qry, jnp.full((nq, sp - s), empty, dtype=jnp.uint64)], axis=1
        )
        ref = jnp.concatenate(
            [ref, jnp.full((nr, sp - s), empty, dtype=jnp.uint64)], axis=1
        )
    tq = min(tq, 8 * ((nq + 7) // 8))
    tr = min(tr, 8 * ((nr + 7) // 8))
    nqa = _pad_rows(nqry.astype(jnp.int32)[:, None], tq, jnp.int32(0))
    nra = _pad_rows(nref.astype(jnp.int32)[:, None], tr, jnp.int32(0))
    interpret = jax.default_backend() != "tpu"
    if not use64:
        # 32-bit hashes: one biased-int32 plane carries the full value
        # (the uint64 pad's low word is 0xFFFFFFFF, the 32-bit sentinel)
        qk = jax.lax.bitcast_convert_type(
            qry.astype(jnp.uint32), jnp.int32
        ) ^ _SIGN
        rk = jax.lax.bitcast_convert_type(
            ref[:, ::-1].astype(jnp.uint32), jnp.int32
        ) ^ _SIGN
        qk = _pad_rows(qk, tq, jnp.int32(0x7FFFFFFF))
        rk = _pad_rows(rk, tr, jnp.int32(0x7FFFFFFF))
        call = _build32(
            qk.shape[0], rk.shape[0], sp, tq, tr, cap, interpret
        )
        common_t, denom_t = call(qk, nqa, rk, nra)
        return (
            common_t.T[:nq, :nr],
            denom_t.T[:nq, :nr],
        )
    qh, ql = _split_biased(qry)
    rh, rl = _split_biased(ref[:, ::-1])
    qh = _pad_rows(qh, tq, jnp.int32(0x7FFFFFFF))
    ql = _pad_rows(ql, tq, jnp.int32(0x7FFFFFFF))
    rh = _pad_rows(rh, tr, jnp.int32(0x7FFFFFFF))
    rl = _pad_rows(rl, tr, jnp.int32(0x7FFFFFFF))
    call = _build(qh.shape[0], rh.shape[0], sp, tq, tr, cap, interpret)
    common_t, denom_t = call(qh, ql, nqa, rh, rl, nra)
    return (
        common_t.T[:nq, :nr],
        denom_t.T[:nq, :nr],
    )
