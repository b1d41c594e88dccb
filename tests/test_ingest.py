"""Differential tests for the native streaming ingest pipeline.

The C++ parser/packer (``mash_ingest_*``) must produce chunk rows whose
k-mer hash multiset matches the pure-Python record path
(``io.fastx.parse_fastx`` + ``core.engine.chunk_stream``), plus matching
record metadata — across FASTA/FASTQ, CRLF, multi-line records, short
records, gzip, and arbitrary feed-block boundaries.
"""

from __future__ import annotations

import gzip
import io
import os
import random

import numpy as np
import pytest

from mash_tpu.native import load_library, NativeIngest
from mash_tpu.io.fastx import parse_fastx

pytestmark = pytest.mark.skipif(
    load_library() is None, reason="native library unavailable"
)


def _random_fasta(rng, n_rec, maxlen=300, crlf=False, multiline=True):
    out = []
    for i in range(n_rec):
        name = "seq%d" % i
        comment = (
            " some comment %d" % i if rng.random() < 0.5 else ""
        )
        ln = rng.randrange(0, maxlen)
        # sprinkle interior whitespace/control bytes: kseq drops any
        # non-graphic byte inside sequences, and both parsers must agree
        seq = "".join(
            rng.choice("ACGTNacgt ACGTN\tACGT\x01ACGT")
            for _ in range(ln)
        )
        eol = "\r\n" if crlf else "\n"
        out.append(">" + name + comment + eol)
        if multiline and ln > 0:
            w = rng.randrange(10, 80)
            for j in range(0, ln, w):
                out.append(seq[j : j + w] + eol)
        else:
            out.append(seq + eol)
    return "".join(out).encode()


def _random_fastq(rng, n_rec, maxlen=200, crlf=False):
    out = []
    eol = "\r\n" if crlf else "\n"
    for i in range(n_rec):
        ln = rng.randrange(0, maxlen)
        seq = "".join(
            rng.choice("ACGTN ACGTN\tACGTN") for _ in range(ln)
        )
        # quality can contain '@', '>' and '+' at line starts
        qual = "".join(
            rng.choice("@>+!IJKLMNOP") for _ in range(ln)
        )
        out.append("@read%d c%d%s" % (i, i, eol))
        out.append(seq + eol)
        out.append(("+" if rng.random() < 0.5 else "+read%d" % i) + eol)
        out.append(qual + eol)
    return "".join(out).encode()


def _reference_rows(data: bytes, k: int, chunk_len: int):
    """Expected packing via the pure-Python record path."""
    from mash_tpu.core.engine import chunk_stream

    records = [r for r in parse_fastx(io.BytesIO(data))]
    kept = [r for r in records if len(r.seq) >= k]
    seqs = [r.seq for r in records]  # ingest packs short records too
    rows = []
    for chunk, used in chunk_stream(seqs, k, chunk_len):
        row = chunk[:used] + b"\x00" * (chunk_len - used)
        rows.append(np.frombuffer(row, dtype=np.uint8))
    meta = {
        "count": len(kept),
        "total_len": sum(len(r.seq) for r in kept),
        "skipped": any(len(r.seq) < k for r in records),
        "first_header": (
            (kept[0].name + " " + kept[0].comment).rstrip()
            if kept and kept[0].comment
            else (kept[0].name if kept else "")
        ),
    }
    return rows, meta


def _kmer_multiset(rows, k: int, chunk_len: int):
    """All valid k-mer windows across rows (the overlap-invariant view)."""
    from collections import Counter

    # Rows overlap by exactly k-1 bytes, so no window fits fully inside
    # the overlap: counting per-row windows never double-counts, and
    # boundary-spanning windows appear exactly once (in the later row).
    c = Counter()
    for row in rows:
        b = bytes(row)
        for i in range(chunk_len - k + 1):
            w = b[i : i + k]
            if b"\x00" in w:
                continue
            c[w] += 1
    return c


def _ingest_rows(data: bytes, k: int, chunk_len: int, block: int):
    ing = NativeIngest(chunk_len, k)
    rows = []
    for i in range(0, len(data), block):
        r = ing.feed(data[i : i + block])
        if r.shape[0]:
            rows.append(r)
    r = ing.finish()
    if r.shape[0]:
        rows.append(r)
    allr = (
        np.concatenate(rows, axis=0)
        if rows
        else np.zeros((0, chunk_len), np.uint8)
    )
    return [allr[i] for i in range(allr.shape[0])], ing


@pytest.mark.parametrize("kind", ["fasta", "fastq"])
@pytest.mark.parametrize("crlf", [False, True])
@pytest.mark.parametrize("block", [7, 113, 1 << 12, 1 << 20])
def test_ingest_matches_python_path(kind, crlf, block):
    rng = random.Random(hash((kind, crlf, block)) & 0xFFFF)
    k = 21
    chunk_len = 1 << 12
    if kind == "fasta":
        data = _random_fasta(rng, 40, crlf=crlf)
    else:
        data = _random_fastq(rng, 40, crlf=crlf)

    exp_rows, exp_meta = _reference_rows(data, k, chunk_len)
    got_rows, ing = _ingest_rows(data, k, chunk_len, block)

    # metadata parity
    assert ing.count == exp_meta["count"]
    assert ing.total_len == exp_meta["total_len"]
    assert ing.skipped == exp_meta["skipped"]

    # k-mer multiset parity (chunk boundaries may differ because the
    # packer also emits short records, which contribute no windows)
    exp_k = _kmer_multiset(exp_rows, k, chunk_len)
    got_k = _kmer_multiset(got_rows, k, chunk_len)
    assert exp_k == got_k


def test_ingest_first_header_and_ordinal():
    k = 21
    data = (
        b">shorty\nACGT\n"
        b">first_valid a comment here\n" + b"A" * 50 + b"\n"
        b">second\n" + b"C" * 40 + b"\n"
    )
    rows, ing = _ingest_rows(data, k, 64, 16)
    assert ing.count == 2
    assert ing.skipped is True
    assert ing.first_ordinal == 1
    assert ing.first_header == "first_valid a comment here"


def test_ingest_gzip_pipeline(tmp_path):
    rng = random.Random(7)
    data = _random_fastq(rng, 200)
    gz = tmp_path / "reads.fastq.gz"
    gz.write_bytes(gzip.compress(data))

    from mash_tpu.io.ingest import IngestPipeline

    k = 21
    chunk_len = 1 << 12
    pipe = IngestPipeline([str(gz)], k, chunk_len, batch_rows=4)
    rows = []
    for batch in pipe.batches():
        assert batch.shape == (4, chunk_len)
        for r in batch:
            if r.any():
                rows.append(r)
    exp_rows, exp_meta = _reference_rows(data, k, chunk_len)
    assert _kmer_multiset(rows, k, chunk_len) == _kmer_multiset(
        exp_rows, k, chunk_len
    )
    assert pipe.metas[0].count == exp_meta["count"]


@pytest.mark.parametrize("pack_mode", [1, 2])
def test_packed_rows_reconstruct(pack_mode):
    """Device unpack of packed rows == raw rows with invalids zeroed."""
    import jax.numpy as jnp

    from mash_tpu.ops.kmers import unpack_chunks

    rng = random.Random(11)
    k = 21
    chunk_len = 1 << 12
    data = _random_fasta(rng, 30, maxlen=600)
    raw_rows, _ = _ingest_rows(data, k, chunk_len, 1 << 12)
    ing = NativeIngest(chunk_len, k, pack_mode)
    packed = []
    for i in range(0, len(data), 4096):
        r = ing.feed(data[i : i + 4096])
        if r.shape[0]:
            packed.append(r)
    r = ing.finish()
    if r.shape[0]:
        packed.append(r)
    pk = np.concatenate(packed, axis=0)
    assert pk.shape[1] == chunk_len // 4 + chunk_len // 8

    got = np.asarray(unpack_chunks(jnp.asarray(pk), chunk_len))
    exp = np.stack(raw_rows)
    # expected reconstruction: valid ACGT bytes (case folded for mode 1)
    # survive, everything else -> 0
    e = exp.copy()
    if pack_mode == 1:
        low = (e >= ord("a")) & (e <= ord("z"))
        e = np.where(low, e - 32, e)
    validset = np.isin(e, np.frombuffer(b"ACGT", dtype=np.uint8))
    e = np.where(validset, e, 0)
    np.testing.assert_array_equal(got, e)


@pytest.mark.parametrize("pack_mode", [1, 2])
def test_pack_scalar_matches_avx2(tmp_path, pack_mode):
    """The scalar (SWAR) pack path and the AVX2 path produce identical
    rows.  CI runs on AVX2 hosts where the scalar fallback is otherwise
    never exercised; MASH_INGEST_NO_AVX2 forces it in a subprocess (the
    dispatch choice is latched per process)."""
    import subprocess
    import sys

    rng = random.Random(77)
    k = 21
    chunk_len = 1 << 12
    # mixed content: ACGT, lowercase, IUPAC/invalid neighbours of the
    # valid codes (B after C, U after T, @ after A, ...) and binary junk
    pieces = []
    for i in range(40):
        n = rng.randrange(100, 900)
        seq = bytes(
            rng.choice(b"ACGTacgtNBUu@`bdfhn\x00\xff") for _ in range(n)
        )
        pieces.append(b">r%d\n" % i + seq + b"\n")
    data = b"".join(pieces)
    f = tmp_path / "mix.fna"
    f.write_bytes(data)

    script = (
        "import sys, numpy as np\n"
        "sys.path.insert(0, %r)\n"
        "from mash_tpu.native import NativeIngest\n"
        "data = open(%r, 'rb').read()\n"
        "ing = NativeIngest(%d, %d, %d)\n"
        "rows = []\n"
        "for i in range(0, len(data), 4096):\n"
        "    r = ing.feed(data[i:i+4096])\n"
        "    if r.shape[0]: rows.append(r)\n"
        "r = ing.finish()\n"
        "if r.shape[0]: rows.append(r)\n"
        "np.concatenate(rows, axis=0).tofile(sys.argv[1])\n"
    ) % (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        str(f), chunk_len, k, pack_mode,
    )

    outs = {}
    for label, env_extra in (
        ("avx2", {}),
        ("scalar", {"MASH_INGEST_NO_AVX2": "1"}),
    ):
        out = tmp_path / ("rows_" + label + ".bin")
        env = dict(os.environ, **env_extra)
        subprocess.run(
            [sys.executable, "-c", script, str(out)],
            check=True, env=env,
        )
        outs[label] = out.read_bytes()
    assert outs["avx2"] == outs["scalar"] and len(outs["avx2"]) > 0


def test_packed_sketch_parity(tmp_path):
    """Packed fast path == raw record path on the full sketch."""
    from mash_tpu.core.engine import SketchEngine, sketch_records_concat
    from mash_tpu.core.loader import _sketch_file_fast
    from mash_tpu.core.params import default_nucleotide_params
    from mash_tpu.io.fastx import read_fastx

    rng = random.Random(5)
    data = _random_fasta(rng, 50, maxlen=3000)
    f = tmp_path / "g.fna"
    f.write_bytes(data)

    params = default_nucleotide_params()
    engine = SketchEngine(params, chunk_len=1 << 14)
    ref_slow, _s, _c, _k = sketch_records_concat(
        engine, read_fastx(str(f)), str(f), is_stdin=False
    )
    # _sketch_file_fast picks packed mode for the ACGT alphabet
    ref_fast, _s2, _c2, _k2 = _sketch_file_fast(engine, str(f))
    np.testing.assert_array_equal(ref_fast.hashes, ref_slow.hashes)
    np.testing.assert_array_equal(ref_fast.counts, ref_slow.counts)


def test_ingest_sketch_parity_with_record_path(tmp_path):
    """End to end: fast pipeline fold == record-path fold (same hash set)."""
    from mash_tpu.core.engine import SketchEngine, sketch_records_concat
    from mash_tpu.core.loader import _sketch_file_fast
    from mash_tpu.core.params import default_nucleotide_params
    from mash_tpu.io.fastx import read_fastx

    rng = random.Random(3)
    data = _random_fasta(rng, 60, maxlen=4000, multiline=True)
    f = tmp_path / "g.fna"
    f.write_bytes(data)

    params = default_nucleotide_params()
    engine = SketchEngine(params, chunk_len=1 << 14)
    ref_slow, _s, count_slow, _sk = sketch_records_concat(
        engine, read_fastx(str(f)), str(f), is_stdin=False
    )
    ref_fast, _s2, count_fast, _sk2 = _sketch_file_fast(engine, str(f))
    assert count_fast == count_slow
    np.testing.assert_array_equal(ref_fast.hashes, ref_slow.hashes)
    np.testing.assert_array_equal(ref_fast.counts, ref_slow.counts)
    assert ref_fast.length == ref_slow.length
    assert ref_fast.comment == ref_slow.comment
    assert ref_fast.name == ref_slow.name


def test_ingest_long_header_matches_python_path(tmp_path):
    """Headers past any internal buffer size must survive verbatim:
    fast-path name/comment == record-path name/comment (ADVICE r2:
    the native parser used to cap the captured header at 8 KiB while
    the Python path keeps it unbounded)."""
    from mash_tpu.core.engine import SketchEngine, sketch_records_concat
    from mash_tpu.core.loader import _sketch_file_fast
    from mash_tpu.core.params import default_nucleotide_params
    from mash_tpu.io.fastx import read_fastx

    rng = random.Random(5)
    name = "seq" + "".join(rng.choice("abcxyz") for _ in range(20))
    comment = "".join(rng.choice("abcdefgh ") for _ in range(20_000))
    data = (
        (">" + name + " " + comment + "\n").encode()
        + b"ACGTACGTACGTACGTACGTACGTACGTACGT" * 64
        + b"\n"
    )
    f = tmp_path / "longhdr.fna"
    f.write_bytes(data)

    params = default_nucleotide_params()
    engine = SketchEngine(params, chunk_len=1 << 12)
    ref_slow, _s, _c, _k = sketch_records_concat(
        engine, read_fastx(str(f)), str(f), is_stdin=False
    )
    ref_fast, _s2, _c2, _k2 = _sketch_file_fast(engine, str(f))
    assert len(ref_fast.comment) > 8192
    assert ref_fast.name == ref_slow.name
    assert ref_fast.comment == ref_slow.comment


def test_ingest_rejects_out_of_range_k():
    """flush_row keeps the k-1 overlap in a fixed 64-byte buffer; the
    constructor must reject k that would overflow it (ADVICE r2)."""
    with pytest.raises(RuntimeError):
        NativeIngest(1 << 12, 65)
    with pytest.raises(RuntimeError):
        NativeIngest(1 << 12, 0)
    NativeIngest(1 << 12, 64)  # boundary ok


@pytest.mark.parametrize(
    "data",
    [
        # truncated FASTQ: first record missing its '+' line — the
        # next '@' header must start a new record (kseq.h:183), not be
        # swallowed into the sequence
        b"@r1\nACGTACGTACGTACGTACGTACGT\n"
        b"@r2\nAAAACCCCGGGGTTTTAAAACCCC\n+\nIIIIIIIIIIIIIIIIIIIIIIII\n",
        # '+' line after a FASTA record: kseq reads a quality section
        # sized by the sequence, then resumes at the next marker
        b">a\nACGTACGTACGTACGTACGTACGTACGT\n+\n"
        b"IIIIIIIIIIIIIIIIIIIIIIIIIIII\n>b\nCCCCGGGGTTTTAAAACCCCGGGGTTTT\n",
        # FASTA record terminated by an '@' header (format switch)
        b">a\nACGTACGTACGTACGTACGTACGTACGT\n"
        b"@r\nAAAACCCCGGGGTTTTAAAACCCCGGGG\n+\n"
        b"IIIIIIIIIIIIIIIIIIIIIIIIIIII\n",
    ],
    ids=["fastq-missing-plus", "fasta-plus-line", "fasta-then-fastq"],
)
def test_ingest_malformed_records_match_python(data):
    """kseq's three sequence terminators on malformed input: the
    native ingest and the Python parser must agree (both yield two
    records; headers never leak into sequences)."""
    k = 21
    chunk_len = 1 << 10
    exp_rows, exp_meta = _reference_rows(data, k, chunk_len)
    got_rows, ing = _ingest_rows(data, k, chunk_len, 13)
    assert ing.count == exp_meta["count"] == 2
    assert ing.total_len == exp_meta["total_len"]
    assert _kmer_multiset(got_rows, k, chunk_len) == _kmer_multiset(
        exp_rows, k, chunk_len
    )
