"""Fused Pallas TPU kernel: sequence bytes -> bottom-m sketch candidates.

The XLA sketch pipeline (``ops.kmers.hash_chunk`` + the hierarchical
fold in ``ops.sketch_ops``) spends most of its time materializing the
full 64-bit hash array in HBM and re-reading it for selection (keys,
gather, certificate).  This kernel fuses the whole per-chunk hot path in
VMEM: uppercased bytes stream in, canonical k-mers are packed and
MurmurHash3-hashed in 32-bit lane pairs (TPU has no 64-bit lanes), and
each subrow's m smallest hashes are extracted by iterative min-reduction
— only ~m/C of the data ever returns to HBM.

Outputs per subrow: the m smallest (hi, lo, valid) candidates (by the
full 64-bit hash in 64-bit mode), the next-smallest "boundary" key, and
the subrow's valid-window count.  The caller folds the candidates and
verifies the same exactness certificate as the XLA path: kept values
strictly below every subrow boundary are provably complete (an element
not extracted from its subrow is >= that subrow's boundary), and the
valid-count totals prove the all-captured case.  Fallback on failure is
the plain sort path — results are always exact.

64-bit arithmetic is emulated on int32 lanes holding uint32 bit
patterns (16-bit limb products for 32x32->64 multiplies).  Everything
stays int32: weak-int64 literals, fori_loop counters and index-map
literals would all break Mosaic under x64 (see ops/pallas_pairwise.py).

Reference semantics: ``src/mash/Sketch.cpp:512-583`` (hot loop),
``hash.cpp:10-38`` (hash width), ``MurmurHash3.cpp`` (x64_128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I0 = np.int32(0)
_SIGN32 = np.int32(-(2**31))

# MurmurHash3 x64_128 constants as (hi, lo) uint32 pairs
_C1 = (0x87C37B91, 0x114253D5)
_C2 = (0x4CF5AD43, 0x2745937F)
_F1 = (0xFF51AFD7, 0xED558CCD)
_F2 = (0xC4CEB9FE, 0x1A85EC53)


def _i32(c: int):
    """uint32 literal -> int32 bit pattern (python int, no tracing)."""
    c &= 0xFFFFFFFF
    return np.int32(c - (1 << 32)) if c >= (1 << 31) else np.int32(c)


def _shr32(x, r: int):
    """Logical right shift of uint32 bit patterns in int32 lanes."""
    if r == 0:
        return x
    return jax.lax.shift_right_logical(x, np.int32(r))


def _shl32(x, r: int):
    if r == 0:
        return x
    # Multiply instead of shift_left: Mosaic miscompiles
    # shift_left(<i32 from an unaligned lane slice of u8>, 16) to zero
    # (observed on v5e, jax 0.9); wraparound int32 multiplies are exact
    # and 2^r mod 2^32 gives identical bits for every r.
    return x * _i32(1 << r)


def _ltu32(a, b):
    """Unsigned < on uint32 bit patterns in int32 lanes."""
    return (a ^ _SIGN32) < (b ^ _SIGN32)


def _mul32_full(a, b):
    """(a * b) for uint32 bit patterns -> (hi, lo) uint32 pair.

    16-bit limb decomposition; all intermediates stay in int32 lanes
    with wraparound multiplies.
    """
    mask = _i32(0xFFFF)
    al = a & mask
    ah = _shr32(a, 16)
    bl = b & mask
    bh = _shr32(b, 16)
    p0 = al * bl  # <= (2^16-1)^2 < 2^32: full product as bit pattern
    c1 = al * bh
    c2 = ah * bl
    csum = c1 + c2  # may wrap: detect carry
    carry16 = jnp.where(_ltu32(csum, c1), _i32(1 << 16), _I0)
    lo = p0 + _shl32(csum, 16)
    carry_lo = jnp.where(_ltu32(lo, p0), np.int32(1), _I0)
    hi = ah * bh + _shr32(csum, 16) + carry16 + carry_lo
    return hi, lo


def _mul64(ah, al, bh, bl):
    """Low 64 bits of u64 product, as (hi, lo) uint32 pairs."""
    hi, lo = _mul32_full(al, bl)
    hi = hi + al * bh + ah * bl
    return hi, lo


def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = jnp.where(_ltu32(lo, al), np.int32(1), _I0)
    return ah + bh + carry, lo


def _xor64(ah, al, bh, bl):
    return ah ^ bh, al ^ bl


def _rotl64(ah, al, r: int):
    if r == 32:
        return al, ah
    if r > 32:
        ah, al = al, ah
        r -= 32
    # 0 < r < 32
    nh = _shl32(ah, r) | _shr32(al, 32 - r)
    nl = _shl32(al, r) | _shr32(ah, 32 - r)
    return nh, nl


def _shr64_33(ah, al):
    """x >> 33 for the fmix steps."""
    # (x >> 33).lo = ah >> 1 ; hi = 0
    return _I0 + jnp.zeros_like(ah), _shr32(ah, 1)


def _fmix64(h, l):
    sh, sl = _shr64_33(h, l)
    h, l = h ^ sh, l ^ sl
    h, l = _mul64(h, l, _i32(_F1[0]), _i32(_F1[1]))
    sh, sl = _shr64_33(h, l)
    h, l = h ^ sh, l ^ sl
    h, l = _mul64(h, l, _i32(_F2[0]), _i32(_F2[1]))
    sh, sl = _shr64_33(h, l)
    return h ^ sh, l ^ sl


def mmh3_words_pair(words, length: int, seed: int):
    """MurmurHash3_x64_128 h1 over little-endian packed (hi, lo) words.

    ``words``: list of ceil(length/8) (hi, lo) int32-pair arrays (same
    shape), zero-padded past ``length``.  Mirrors
    ``hashing.murmur3.mmh3_words_x64_128`` but on u32 pairs so it can run
    inside a Pallas kernel.  Returns h1 as an (hi, lo) pair.
    """
    if seed >> 32:
        raise ValueError("seed is uint32 in the reference")
    nblocks = length // 16
    # h1 = h2 = seed, zero-extended to 64 bits
    h1h = jnp.zeros_like(words[0][0])
    h1l = jnp.full_like(words[0][0], _i32(seed & 0xFFFFFFFF))
    h2h, h2l = h1h, h1l

    c1h, c1l = _i32(_C1[0]), _i32(_C1[1])
    c2h, c2l = _i32(_C2[0]), _i32(_C2[1])

    for b in range(nblocks):
        k1h, k1l = words[2 * b]
        k2h, k2l = words[2 * b + 1]
        k1h, k1l = _mul64(k1h, k1l, c1h, c1l)
        k1h, k1l = _rotl64(k1h, k1l, 31)
        k1h, k1l = _mul64(k1h, k1l, c2h, c2l)
        h1h, h1l = h1h ^ k1h, h1l ^ k1l
        h1h, h1l = _rotl64(h1h, h1l, 27)
        h1h, h1l = _add64(h1h, h1l, h2h, h2l)
        h1h, h1l = _mul64(h1h, h1l, _I0, np.int32(5))
        h1h, h1l = _add64(h1h, h1l, _I0, _i32(0x52DCE729))
        k2h, k2l = _mul64(k2h, k2l, c2h, c2l)
        k2h, k2l = _rotl64(k2h, k2l, 33)
        k2h, k2l = _mul64(k2h, k2l, c1h, c1l)
        h2h, h2l = h2h ^ k2h, h2l ^ k2l
        h2h, h2l = _rotl64(h2h, h2l, 31)
        h2h, h2l = _add64(h2h, h2l, h1h, h1l)
        h2h, h2l = _mul64(h2h, h2l, _I0, np.int32(5))
        h2h, h2l = _add64(h2h, h2l, _I0, _i32(0x38495AB5))

    tlen = length & 15
    if tlen > 8:
        k2h, k2l = words[2 * nblocks + 1]
        k2h, k2l = _mul64(k2h, k2l, c2h, c2l)
        k2h, k2l = _rotl64(k2h, k2l, 33)
        k2h, k2l = _mul64(k2h, k2l, c1h, c1l)
        h2h, h2l = h2h ^ k2h, h2l ^ k2l
    if tlen > 0:
        k1h, k1l = words[2 * nblocks]
        k1h, k1l = _mul64(k1h, k1l, c1h, c1l)
        k1h, k1l = _rotl64(k1h, k1l, 31)
        k1h, k1l = _mul64(k1h, k1l, c2h, c2l)
        h1h, h1l = h1h ^ k1h, h1l ^ k1l

    h1l = h1l ^ np.int32(length)
    h2l = h2l ^ np.int32(length)
    h1h, h1l = _add64(h1h, h1l, h2h, h2l)
    h2h, h2l = _add64(h2h, h2l, h1h, h1l)
    h1h, h1l = _fmix64(h1h, h1l)
    h2h, h2l = _fmix64(h2h, h2l)
    h1h, h1l = _add64(h1h, h1l, h2h, h2l)
    return h1h, h1l


# ---------------------------------------------------------------------------
# The fused kernel
# ---------------------------------------------------------------------------

_HALO = 128  # halo lanes appended to each subrow (>= k-1, lane-aligned)
_OUT_W = 128  # packed output width per subrow


def _complement_byte(c: int) -> int:
    from mash_tpu.ops.kmers import complement_byte

    return complement_byte(c)


def _kernel(bytes_ref, out_ref, *, C, SR, k, seed, use64,
            noncanonical, alphabet, m):
    """One [SR, C+_HALO] byte tile -> [SR, _OUT_W] packed candidates.

    Output columns: [0,m) hash hi, [m,2m) hash lo, [2m,3m) valid flag,
    col 3m = boundary key (biased int32), col 3m+1 = valid-window count.
    """
    b = bytes_ref[:].astype(jnp.int32)  # [SR, C+_HALO]

    # alphabet membership per byte (select chains; no gathers on TPU)
    ok = None
    for c in alphabet:
        eq = b == np.int32(c)
        ok = eq if ok is None else (ok | eq)
    if ok is None:
        ok = jnp.zeros(b.shape, dtype=bool)

    comp = None
    if not noncanonical:
        comp = jnp.zeros_like(b)
        for c in alphabet:
            comp = jnp.where(
                b == np.int32(c), np.int32(_complement_byte(c)), comp
            )

    # window validity over lanes [0, C): log-doubling sliding AND
    from mash_tpu.ops.kmers import window_valid

    valid = window_valid(ok, k)[:, :C]

    def fwd(j):
        return b[:, j : j + C]

    def rev(j):
        return comp[:, k - 1 - j : k - 1 - j + C]

    # canonical strand choice: memcmp(fwd, rev) <= 0, last byte first
    if noncanonical:
        choose_fwd = None
    else:
        cmp = jnp.zeros((SR, C), dtype=jnp.int32)
        for j in reversed(range(k)):
            f = fwd(j)
            r = rev(j)
            cmp = jnp.where(
                f < r,
                np.int32(-1),
                jnp.where(f > r, np.int32(1), cmp),
            )
        choose_fwd = cmp <= np.int32(0)

    # pack k-mer bytes into (hi, lo) u32 word pairs, canonical-selected
    nwords = (k + 7) // 8
    words = []
    for w in range(nwords):
        fh = None
        fl = None
        rh = None
        rl = None
        for j in range(8 * w, min(8 * w + 8, k)):
            off = j - 8 * w
            bf = fwd(j)
            if off < 4:
                t = _shl32(bf, 8 * off)
                fl = t if fl is None else (fl | t)
            else:
                t = _shl32(bf, 8 * (off - 4))
                fh = t if fh is None else (fh | t)
            if not noncanonical:
                br = rev(j)
                if off < 4:
                    t = _shl32(br, 8 * off)
                    rl = t if rl is None else (rl | t)
                else:
                    t = _shl32(br, 8 * (off - 4))
                    rh = t if rh is None else (rh | t)
        zero = jnp.zeros((SR, C), dtype=jnp.int32)
        fh = zero if fh is None else fh
        fl = zero if fl is None else fl
        if noncanonical:
            words.append((fh, fl))
        else:
            rh = zero if rh is None else rh
            rl = zero if rl is None else rl
            words.append(
                (
                    jnp.where(choose_fwd, fh, rh),
                    jnp.where(choose_fwd, fl, rl),
                )
            )

    hh, hl = mmh3_words_pair(words, k, seed)
    if not use64:
        hh = jnp.zeros_like(hh)

    # selection keys: biased int32 of the high hash half (the hash
    # itself in 32-bit mode); invalid windows get +inf
    keysrc = hh if use64 else hl
    MAXK = np.int32(2**31 - 1)
    keyb = jnp.where(valid, keysrc ^ _SIGN32, MAXK)

    lane = jax.lax.broadcasted_iota(jnp.int32, (SR, C), 1)
    BIG = np.int32(2**30)
    val_i = valid.astype(jnp.int32)

    vcount = jnp.sum(val_i, axis=1, dtype=jnp.int32)
    his = []
    los = []
    vals = []
    for _ in range(m):
        cur = jnp.min(keyb, axis=1, keepdims=True)  # [SR, 1]
        pos = jnp.min(
            jnp.where(keyb == cur, lane, BIG), axis=1, keepdims=True
        )
        sel = lane == pos  # one-hot [SR, C]
        # The selection key IS the extracted hash's key half (hi in
        # 64-bit mode, the whole hash in 32-bit mode), so that half
        # unbiases straight out of ``cur`` — only the OTHER half needs
        # a one-hot extraction sum.  Exhausted rounds (cur == MAXK)
        # yield a garbage value either way; vals == 0 discards them.
        # NB: dtype=int32 — a default jnp.sum accumulator is i64 under
        # x64, which Mosaic cannot lower
        ext_key = cur[:, 0] ^ _SIGN32
        if use64:
            his.append(ext_key)
            los.append(
                jnp.sum(jnp.where(sel, hl, _I0), axis=1, dtype=jnp.int32)
            )
        else:
            his.append(jnp.zeros_like(ext_key))
            los.append(ext_key)
        # Candidate validity derives from the extracted key: invalid
        # lanes carry MAXK, and re-extracted (exhausted) lanes see MAXK
        # too, so they report 0.  A *valid* window whose key genuinely
        # equals MAXK (hash hi-32 == 0xFFFFFFFF) is conservatively
        # dropped here; sum(cand_v) then undercounts sum(vcount), the
        # all-captured certificate fails, and the exact fallback runs —
        # sound, and it keeps the loop two passes cheaper per round.
        vals.append((cur[:, 0] != MAXK).astype(jnp.int32))
        keyb = jnp.where(sel, MAXK, keyb)
    boundary = jnp.min(keyb, axis=1)  # (m+1)-th smallest key (or MAX)

    # Assemble the packed output with masked column broadcasts: a
    # jnp.stack of ~50 [SR] vectors would cost a sublane->lane relayout
    # per column; broadcasting each vector across lanes and selecting
    # its column is much cheaper on the VPU.
    lane_out = jax.lax.broadcasted_iota(jnp.int32, (SR, _OUT_W), 1)
    out = jnp.zeros((SR, _OUT_W), jnp.int32)
    for col, vec in enumerate(his + los + vals + [boundary, vcount]):
        out = jnp.where(lane_out == np.int32(col), vec[:, None], out)
    out_ref[:] = out


@functools.lru_cache(maxsize=None)
def _build(rows, C, SR, k, seed, use64, noncanonical, alphabet, m,
           interpret):
    kern = functools.partial(
        _kernel,
        C=C,
        SR=SR,
        k=k,
        seed=seed,
        use64=use64,
        noncanonical=noncanonical,
        alphabet=alphabet,
        m=m,
    )
    return pl.pallas_call(
        kern,
        grid=(rows // SR,),
        in_specs=[
            pl.BlockSpec(
                (SR, C + _HALO),
                lambda i: (i, _I0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (SR, _OUT_W), lambda i: (i, _I0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, _OUT_W), jnp.int32),
        interpret=interpret,
    )


def hash_select_tiles(tiles, *, k, seed, use64, noncanonical, alphabet,
                      m, SR=64):
    """Run the fused kernel over [rows, C+_HALO] uppercased byte tiles.

    Returns (cand_hi, cand_lo, cand_valid [rows, m] int32,
    boundary [rows], vcount [rows]).
    """
    rows, W = tiles.shape
    C = W - _HALO
    assert rows % SR == 0, (rows, SR)
    assert 3 * m + 2 <= _OUT_W
    interpret = jax.default_backend() != "tpu"
    call = _build(
        rows, C, SR, k, seed, use64, noncanonical, tuple(alphabet), m,
        interpret,
    )
    out = call(tiles)
    return (
        out[:, :m],
        out[:, m : 2 * m],
        out[:, 2 * m : 3 * m],
        out[:, 3 * m],
        out[:, 3 * m + 1],
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "alphabet",
        "k",
        "seed",
        "use64",
        "noncanonical",
        "preserve_case",
        "s",
    ),
)
def sketch_chunks_pallas(
    chunks,
    *,
    alphabet: tuple,
    k: int,
    seed: int,
    use64: bool,
    noncanonical: bool,
    preserve_case: bool,
    s: int,
):
    """Fused bytes -> bottom-s states for a [B, L] chunk batch.

    Semantically identical to ``hash_chunk`` + ``sketch_chunk_batch``
    (same exactness-certificate + fallback pattern); the fast path runs
    the fused Pallas kernel so the full hash array never exists.
    """
    from mash_tpu.ops import sketch_ops
    from mash_tpu.ops.kmers import hash_chunk, uppercase
    from mash_tpu.ops.sketch_ops import EMPTY, _fold_sorted

    B, L = chunks.shape
    n = L - k + 1
    C = 2048
    SR = 32

    def plain():
        h, v = hash_chunk(
            chunks,
            alphabet=alphabet,
            k=k,
            seed=seed,
            use64=use64,
            noncanonical=noncanonical,
            preserve_case=preserve_case,
        )
        return jax.vmap(
            lambda hh, vv: sketch_ops.sketch_chunk(hh, vv, s=s)
        )(h, v)

    if n <= 8 * C or s * 8 > n or k > _HALO + 1:
        return plain()

    m = sketch_ops.candidate_budget(s, C, n)
    # the packed-output budget is the binding constraint (m > 3C/4
    # would need m > 1536, far beyond what 3m+2 <= _OUT_W=128 allows)
    if 3 * m + 2 > _OUT_W:
        return plain()

    seq = uppercase(chunks, preserve_case)
    R = (n + C - 1) // C
    padL = R * C + C
    seq = jnp.pad(seq, ((0, 0), (0, padL - L)))
    main = seq[:, : R * C].reshape(B, R, C)
    halo = seq[:, C : C + R * C].reshape(B, R, C)[:, :, :_HALO]
    tiles = jnp.concatenate([main, halo], axis=2).reshape(
        B * R, C + _HALO
    )
    rows = B * R
    rpad = (-rows) % SR
    if rpad:
        tiles = jnp.concatenate(
            [tiles, jnp.zeros((rpad, C + _HALO), jnp.uint8)], axis=0
        )

    hi, lo, vb, boundary, vcount = hash_select_tiles(
        tiles,
        k=k,
        seed=seed,
        use64=use64,
        noncanonical=noncanonical,
        alphabet=alphabet,
        m=m,
        SR=SR,
    )
    hi = hi[:rows]
    lo = lo[:rows]
    vb = vb[:rows]
    boundary = boundary[:rows]
    vcount = vcount[:rows]

    u = lambda x: jax.lax.bitcast_convert_type(x, jnp.uint32).astype(
        jnp.uint64
    )
    cand_h = ((u(hi) << jnp.uint64(32)) | u(lo)).reshape(B, R * m)
    cand_v = (vb > 0).reshape(B, R * m)
    ch = jnp.where(cand_v, cand_h, EMPTY)
    cc = cand_v.astype(jnp.int64)
    ch, cc = jax.lax.sort((ch, cc), dimension=1, num_keys=1)
    Hf, Cf = jax.vmap(lambda a, b: _fold_sorted(a, b, s))(ch, cc)

    # certificate (see sketch_ops.sketch_chunk_batch): an element not
    # extracted from its subrow has key >= that subrow's boundary, so
    # strict key(X) < min(boundary) proves every occurrence <= X was
    # captured; equal valid-count totals prove the all-captured case.
    ndist = jnp.sum(Cf > 0, axis=1)
    shift = jnp.uint64(32 if use64 else 0)
    key_x = jax.lax.bitcast_convert_type(
        (Hf[:, s - 1] >> shift).astype(jnp.uint32), jnp.int32
    ) ^ _SIGN32
    minb = jnp.min(boundary.reshape(B, R), axis=1)
    covered = (ndist >= s) & (key_x < minb)
    all_in = jnp.sum(vcount.reshape(B, R), axis=1) == jnp.sum(
        cand_v, axis=1
    )
    exact = covered | all_in
    return jax.lax.cond(jnp.all(exact), lambda: (Hf, Cf), plain)


def sketch_chunks_auto(
    chunks,
    *,
    alphabet: tuple,
    k: int,
    seed: int,
    use64: bool,
    noncanonical: bool,
    preserve_case: bool,
    s: int,
):
    """Backend-dispatched bytes -> bottom-s states for [B, L] chunks.

    TPU: the fused Pallas kernel (the hash array never exists in HBM).
    Elsewhere: XLA ``hash_chunk`` + the hierarchical ``sketch_chunk_batch``
    (Pallas interpret mode would be orders of magnitude slower).
    """
    if jax.default_backend() == "tpu":
        return sketch_chunks_pallas(
            chunks,
            alphabet=alphabet,
            k=k,
            seed=seed,
            use64=use64,
            noncanonical=noncanonical,
            preserve_case=preserve_case,
            s=s,
        )
    from mash_tpu.ops import sketch_ops
    from mash_tpu.ops.kmers import hash_chunk

    h, v = hash_chunk(
        chunks,
        alphabet=alphabet,
        k=k,
        seed=seed,
        use64=use64,
        noncanonical=noncanonical,
        preserve_case=preserve_case,
    )
    return sketch_ops.sketch_chunk_batch(h, v, s=s, use64=use64)
