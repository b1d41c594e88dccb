"""Batched k-mer extraction, canonicalization and hashing on device.

The reference walks each sequence k-mer-at-a-time on the CPU
(``src/mash/Sketch.cpp:512-583``: uppercase pass, reverse complement,
bad-character skipping, canonical ``min(fwd, revcomp)`` by ``memcmp``, then
MurmurHash3 per k-mer).  Here the same semantics become a fixed-shape array
program: every window position of a chunk is processed in parallel on the
VPU, invalid windows (containing non-alphabet bytes, padding, or sequence
separators) are masked instead of skipped, and the per-k-mer hash is a fully
unrolled MurmurHash3 over packed 64-bit words.

TPU-specific design notes:
- no gathers: alphabet membership and complementation are compare/select
  chains over the (static, small) alphabet — table lookups via ``take``
  are an order of magnitude slower than |alphabet| elementwise compares;
- window validity is a log-doubling sliding AND (5 steps for k<=32)
  instead of a cumsum scan;
- the byte length k is static, so MurmurHash3's block/tail structure
  unrolls into straight-line u64 ops (XLA emulates u64 with u32 pairs).

Chunking contract (host side, see ``mash_tpu.core.engine``):
- sequences are concatenated with a 0x00 separator byte between records;
  0x00 is never in an alphabet, so windows crossing record boundaries are
  automatically invalid — the same trick the reference's ``screen`` uses
  with ``*`` separators (``src/mash/CommandScreen.cpp:258-261``);
- consecutive chunks of one stream overlap by k-1 bytes so no window is
  lost at a chunk boundary;
- the tail chunk is padded with 0x00.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from mash_tpu.hashing.murmur3 import mmh3_words_x64_128

# DNA complement for bytes 'A'..'Z', exactly the reference's table
# (``src/mash/Sketch.cpp:1071-1098``).  Ambiguity codes map to their
# IUPAC complements; non-IUPAC letters map to 'N'.
_COMPLEMENT_AZ = "TVGHNNCDNNMNKNNNNYSAABWNRN"


def complement_byte(c: int) -> int:
    """Complement of one uppercase byte (0 if not a letter)."""
    if ord("A") <= c <= ord("Z"):
        return ord(_COMPLEMENT_AZ[c - ord("A")])
    return 0


def complement_lut() -> np.ndarray:
    """256-entry byte -> complement-byte table (0 for non-letters).

    Only uppercase A-Z get complements, matching the reference where the
    uppercase pass runs before ``reverseComplement``
    (``src/mash/Sketch.cpp:524-537``).  Kept for host-side oracles; the
    device path uses select chains instead.
    """
    lut = np.zeros(256, dtype=np.uint8)
    for i, c in enumerate(_COMPLEMENT_AZ):
        lut[ord("A") + i] = ord(c)
    return lut


def alphabet_lut(alphabet: tuple) -> np.ndarray:
    """256-entry 0/1 table from a ``SketchParams.alphabet`` tuple."""
    return np.asarray(alphabet, dtype=np.uint8)


def alphabet_bytes(alphabet: tuple) -> tuple:
    """Static tuple of member byte values from an alphabet table."""
    return tuple(i for i in range(256) if alphabet[i])


def unpack_chunks(packed, chunk_len: int):
    """Reconstruct ``[B, chunk_len]`` byte chunks from packed ingest rows.

    The native packer (``native/mash_native.cpp`` ``Ingest::pack_row``)
    ships 2-bit ACGT codes (``chunk_len/4`` bytes, little-endian within
    each byte) followed by a per-position validity bitmask
    (``chunk_len/8`` bytes).  Valid positions reconstruct their exact
    (case-folded) base byte; invalid positions become 0x00, which is
    never in an alphabet, so downstream window masking is unchanged.
    This is the device half of the 2.67x host->device transfer
    compression.
    """
    B = packed.shape[0]
    L = chunk_len
    p2 = packed[:, : L // 4]
    pm = packed[:, L // 4 :]
    sh4 = (jnp.arange(4, dtype=jnp.uint8) * 2)[None, None, :]
    codes = ((p2[:, :, None] >> sh4) & jnp.uint8(3)).reshape(B, L)
    sh8 = jnp.arange(8, dtype=jnp.uint8)[None, None, :]
    valid = ((pm[:, :, None] >> sh8) & jnp.uint8(1)).reshape(B, L)
    c = codes.astype(jnp.int32)
    # inverse of (byte >> 1) & 3 over {A,C,G,T}: 0->A 1->C 2->T 3->G
    byte = 65 + 2 * c + 15 * (c == 2).astype(jnp.int32)
    return jnp.where(valid == 1, byte.astype(jnp.uint8), jnp.uint8(0))


def uppercase(seq, preserve_case: bool):
    """Uppercase pass replicating ``Sketch.cpp:524-530``.

    The reference compares ``char`` (signed), so bytes >= 0x80 are negative
    and never shifted; we replicate by testing the int8 view.
    """
    if preserve_case:
        return seq
    signed = seq.astype(jnp.int8)
    lower = (signed > 96) & (signed < 123)
    return jnp.where(lower, seq - jnp.uint8(32), seq)


def window_valid(ok, k: int):
    """valid[i] = all(ok[i:i+k]) via log-doubling sliding AND."""
    n = ok.shape[-1] - k + 1
    acc = ok
    width = 1  # acc[i] == all(ok[i:i+width])
    while width < k:
        step = min(width, k - width)
        acc = acc[..., : acc.shape[-1] - step] & acc[..., step:]
        width += step
    return acc[..., :n]


@functools.partial(
    jax.jit,
    static_argnames=(
        "alphabet",
        "k",
        "seed",
        "use64",
        "noncanonical",
        "preserve_case",
    ),
)
def hash_chunk(
    seq,
    *,
    alphabet: tuple,
    k: int,
    seed: int,
    use64: bool,
    noncanonical: bool,
    preserve_case: bool,
):
    """Hash every k-mer window of ``seq``.

    Args:
      seq: uint8 array ``[..., L]`` of sequence bytes (with separators /
        padding as 0x00).
      alphabet: static tuple of member byte values (``alphabet_bytes``).
      k: static k-mer size (1..32).
      seed: hash seed (uint32 semantics).
      use64: keep 64-bit hashes; otherwise low 32 bits
        (``src/mash/hash.cpp:21-35``).
      noncanonical: skip canonicalization (strand-specific).
      preserve_case: skip the uppercase pass.

    Returns:
      ``(hashes, valid)`` with shape ``[..., L-k+1]``: uint64 hash per
      window and a bool mask of windows whose bytes are all in the
      alphabet.
    """
    assert 1 <= k <= 32, k
    L = seq.shape[-1]
    n = L - k + 1
    assert n >= 1, (L, k)

    seq = uppercase(seq, preserve_case)

    # alphabet membership: |alphabet| compares (no gather)
    ok = None
    for c in alphabet:
        eq = seq == jnp.uint8(c)
        ok = eq if ok is None else (ok | eq)
    if ok is None:
        ok = jnp.zeros(seq.shape, dtype=bool)
    valid = window_valid(ok, k)

    def window_bytes_fwd(j):
        return seq[..., j : j + n]

    if noncanonical:
        window_bytes_rev = None
    else:
        comp = complement_seq(seq, alphabet)

        def window_bytes_rev(j):
            # rc k-mer byte j = complement(seq[i + k-1-j])
            return comp[..., k - 1 - j : k - 1 - j + n]

    h1 = hash_from_byte_fns(
        window_bytes_fwd,
        window_bytes_rev,
        k=k,
        seed=seed,
        use64=use64,
        noncanonical=noncanonical,
    )
    return h1, valid


def complement_seq(seq, alphabet: tuple):
    """Per-byte complement via a select chain over the alphabet.

    Non-alphabet bytes map to 0 (their windows are masked anyway),
    replicating the uppercase-then-complement order of
    ``src/mash/Sketch.cpp:524-537, 1100-1106``.
    """
    comp = jnp.zeros_like(seq)
    for c in alphabet:
        comp = jnp.where(
            seq == jnp.uint8(c),
            jnp.uint8(complement_byte(c)),
            comp,
        )
    return comp


def hash_from_byte_fns(
    fwd, rev, *, k: int, seed: int, use64: bool, noncanonical: bool
):
    """Canonicalize + MurmurHash3 given per-position byte accessors.

    ``fwd(j)`` / ``rev(j)`` return the j-th byte of every window's
    forward / reverse-complement k-mer (arrays of one common shape), so
    the canonicalize+hash core is reusable with either sliced or
    gathered byte access.
    """
    if noncanonical:
        choose_fwd = None
    else:
        # memcmp(fwd, rev) <= 0 ranking, folded last byte first
        # (``Sketch.cpp:569-571``).
        f0 = fwd(0)
        cmp = jnp.zeros(f0.shape, dtype=jnp.int8)
        for j in reversed(range(k)):
            f = fwd(j) if j else f0
            r = rev(j)
            cmp = jnp.where(
                f < r, jnp.int8(-1), jnp.where(f > r, jnp.int8(1), cmp)
            )
        choose_fwd = cmp <= 0

    nwords = (k + 7) // 8
    words = []
    for m in range(nwords):
        wf = None
        wr = None
        for j in range(8 * m, min(8 * m + 8, k)):
            shift = jnp.uint64(8 * (j - 8 * m))
            bf = fwd(j).astype(jnp.uint64) << shift
            wf = bf if wf is None else (wf | bf)
            if not noncanonical:
                br = rev(j).astype(jnp.uint64) << shift
                wr = br if wr is None else (wr | br)
        if noncanonical:
            words.append(wf)
        else:
            words.append(jnp.where(choose_fwd, wf, wr))

    h1, _ = mmh3_words_x64_128(words, k, jnp.uint64(seed), xp=jnp)
    if not use64:
        h1 = h1 & jnp.uint64(0xFFFFFFFF)
    return h1


# ---------------------------------------------------------------------------
# Host-side oracle used by tests: the straightforward per-k-mer walk.
# ---------------------------------------------------------------------------

def hash_sequence_py(seq: bytes, params) -> list:
    """Reference-semantics k-mer walk (oracle for tests).

    Replicates ``addMinHashes`` (``src/mash/Sketch.cpp:512-583``): uppercase,
    bad-char skip, canonical min(fwd, revcomp), MurmurHash3.  Returns the
    hash of every valid window in order.
    """
    from mash_tpu.hashing.murmur3 import hash_kmer_py

    k = params.kmer_size
    if not params.preserve_case:
        seq = bytes(c - 32 if 96 < c < 123 else c for c in seq)
    comp = complement_lut()
    rev = bytes(comp[c] for c in reversed(seq))
    out = []
    n = len(seq)
    for i in range(n - k + 1):
        kmer_fwd = seq[i : i + k]
        if not all(params.alphabet[c] for c in kmer_fwd):
            continue
        if params.noncanonical:
            kmer = kmer_fwd
        else:
            kmer_rev = rev[n - i - k : n - i]
            kmer = kmer_fwd if kmer_fwd <= kmer_rev else kmer_rev
        out.append(hash_kmer_py(kmer, params.seed, params.use64))
    return out
