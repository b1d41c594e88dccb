"""Cap'n Proto .msh roundtrip and JSON dump byte-parity."""

import numpy as np
import pytest

from mash_tpu.core.params import default_nucleotide_params
from mash_tpu.core.sketch import SketchRef
from mash_tpu.io import capnp_msh
from mash_tpu.io.formatting import json_dump, parse_json_dump


def _toy_refs():
    return [
        SketchRef(
            name="a.fna",
            comment="first genome",
            length=12345,
            hashes=np.array([10, 500, 700000], dtype=np.uint64),
            counts=np.array([1, 2, 3], dtype=np.uint32),
            counts_sorted=True,
        ),
        SketchRef(
            name="b.fna",
            comment="",
            length=99,
            hashes=np.array([7], dtype=np.uint64),
        ),
    ]


@pytest.mark.parametrize("seed", [42, 7])
@pytest.mark.parametrize("store_counts", [False, True])
def test_roundtrip(tmp_path, seed, store_counts):
    p = default_nucleotide_params(seed=seed)
    p.counts = store_counts
    path = str(tmp_path / "toy.msh")
    refs = _toy_refs()
    capnp_msh.write_msh(path, p, refs)

    hdr, n = capnp_msh.read_msh_header(path)
    assert n == 2
    assert hdr.kmer_size == p.kmer_size
    assert hdr.seed == seed
    assert hdr.min_hashes_per_window == p.min_hashes_per_window
    assert hdr.alphabet_string() == "ACGT"
    assert hdr.use64
    assert hdr.counts == store_counts

    m = capnp_msh.read_msh(path)
    assert [r.name for r in m.references] == ["a.fna", "b.fna"]
    assert [r.comment for r in m.references] == ["first genome", ""]
    assert [r.length for r in m.references] == [12345, 99]
    np.testing.assert_array_equal(m.references[0].hashes, refs[0].hashes)
    np.testing.assert_array_equal(m.references[1].hashes, refs[1].hashes)
    if store_counts:
        np.testing.assert_array_equal(
            m.references[0].counts, refs[0].counts
        )
        assert m.references[0].counts_sorted
    else:
        assert m.references[0].counts is None


def test_roundtrip_32bit(tmp_path):
    p = default_nucleotide_params(kmer_size=12, seed=42)
    assert not p.use64
    path = str(tmp_path / "toy32.msh")
    refs = [
        SketchRef(
            name="x",
            comment="c",
            length=5,
            hashes=np.array([3, 0xFFFFFFFF], dtype=np.uint64),
        )
    ]
    capnp_msh.write_msh(path, p, refs)
    m = capnp_msh.read_msh(path)
    assert not m.params.use64
    np.testing.assert_array_equal(m.references[0].hashes, refs[0].hashes)


def test_load_truncation(tmp_path):
    p = default_nucleotide_params()
    path = str(tmp_path / "big.msh")
    refs = [
        SketchRef(
            name="x",
            comment="",
            length=1,
            hashes=np.arange(100, dtype=np.uint64),
        )
    ]
    capnp_msh.write_msh(path, p, refs)
    m = capnp_msh.read_msh(path, max_hashes=10)
    assert len(m.references[0].hashes) == 10


def test_golden_genomes_json_roundtrip(tmp_path, reference_test_dir):
    """Reconstruct genomes.msh from the golden dump; dump must byte-match."""
    golden = (reference_test_dir / "ref" / "genomes.json").read_text()
    params, refs = parse_json_dump(golden)
    assert params.kmer_size == 21 and params.seed == 42
    # through the .msh writer/reader
    path = str(tmp_path / "genomes.msh")
    capnp_msh.write_msh(path, params, refs)
    m = capnp_msh.read_msh(path, max_hashes=params.min_hashes_per_window)
    out = json_dump(m.params, m.references)
    assert out == golden


def test_golden_reads_json_roundtrip(tmp_path, reference_test_dir):
    golden = (reference_test_dir / "ref" / "reads.json").read_text()
    params, refs = parse_json_dump(golden)
    path = str(tmp_path / "reads.msh")
    capnp_msh.write_msh(path, params, refs)
    m = capnp_msh.read_msh(path, max_hashes=params.min_hashes_per_window)
    assert json_dump(m.params, m.references) == golden


def test_corrupt_msh_diagnostics(tmp_path):
    """Damaged .msh files raise CorruptMshError naming the file, and
    the CLI reports it as an ERROR line instead of a traceback."""
    import contextlib
    import io
    import sys

    from mash_tpu.__main__ import main

    p = default_nucleotide_params()
    path = str(tmp_path / "good.msh")
    capnp_msh.write_msh(path, p, _toy_refs())
    good = open(path, "rb").read()

    cases = {
        # header claims more segments than the file holds
        "segtable": b"\x05\x00\x00\x00\x01\x00",
        # truncated mid-message
        "truncated": good[: max(8, len(good) // 3)],
        # wild bytes after a valid segment count
        "garbage": good[:8] + b"\xff" * 64,
    }
    for name, data in cases.items():
        bad = tmp_path / ("%s.msh" % name)
        bad.write_bytes(data)
        with pytest.raises(capnp_msh.CorruptMshError) as ei:
            capnp_msh.read_msh(str(bad))
        assert str(bad) in str(ei.value)
        err = io.StringIO()
        with contextlib.redirect_stderr(err):
            rc = main(["info", str(bad)])
        assert rc == 1
        assert "ERROR:" in err.getvalue()
        assert "corrupt or truncated" in err.getvalue()


def test_read_msh_accepts_prefetched_bytes(tmp_path):
    p = default_nucleotide_params()
    path = str(tmp_path / "pref.msh")
    capnp_msh.write_msh(path, p, _toy_refs())
    data = open(path, "rb").read()
    hdr, n = capnp_msh.read_msh_header(path, data=data)
    m = capnp_msh.read_msh(path, data=data)
    assert n == len(m.references) == 2
    np.testing.assert_array_equal(
        m.references[0].hashes, _toy_refs()[0].hashes
    )


def test_parse_json_dump_with_counts_roundtrip():
    """Counts-bearing dumps are deliberately invalid JSON (missing
    comma before "counts", commas keyed to the hash count —
    CommandInfo.cpp:268-276); parse_json_dump repairs and reads them,
    and sets params.counts so a rewrite keeps the counts."""
    p = default_nucleotide_params()
    p.counts = True
    refs = _toy_refs()  # first ref has counts
    text = json_dump(p, refs)
    import json

    import pytest

    with pytest.raises(json.JSONDecodeError):
        json.loads(text)  # the reference's format quirk, by design
    p2, refs2 = parse_json_dump(text)
    assert p2.counts is True
    np.testing.assert_array_equal(refs2[0].hashes, refs[0].hashes)
    np.testing.assert_array_equal(refs2[0].counts, refs[0].counts)
    assert refs2[1].counts is None
