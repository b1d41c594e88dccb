"""End-to-end byte parity with the reference's golden test outputs.

Mirrors the reference's ``make test`` (``Makefile.in:94-115``): sketch the
bundled read sets, dump JSON, compute distances and screen containment,
and diff against ``test/ref/*`` byte-for-byte.  The genome sketches are
reconstructed from the golden JSON dump (their FASTA sources are tutorial
downloads, not bundled).
"""

import contextlib
import io

import pytest

from mash_tpu.__main__ import main
from mash_tpu.io import capnp_msh
from mash_tpu.io.formatting import parse_json_dump


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, reference_test_dir):
    """Reconstruct genomes.msh and sketch reads.msh once."""
    d = tmp_path_factory.mktemp("golden")
    golden = (reference_test_dir / "ref" / "genomes.json").read_text()
    params, refs = parse_json_dump(golden)
    capnp_msh.write_msh(str(d / "genomes.msh"), params, refs)
    rc = main(
        [
            "sketch",
            "-r",
            "-I",
            "reads",
            str(reference_test_dir / "reads1.fastq"),
            str(reference_test_dir / "reads2.fastq"),
            "-o",
            str(d / "reads.msh"),
        ]
    )
    assert rc == 0
    return d


def _capture(args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(args)
    return rc, buf.getvalue()


def test_reads_sketch_json(workdir, reference_test_dir):
    """`mash info -d reads.msh` vs test/ref/reads.json (testSketch)."""
    rc, out = _capture(["info", "-d", str(workdir / "reads.msh")])
    assert rc == 0
    assert out == (reference_test_dir / "ref" / "reads.json").read_text()


def test_dist(workdir, reference_test_dir):
    """`mash dist genomes.msh reads.msh` vs test/ref/genomes.dist."""
    rc, out = _capture(
        [
            "dist",
            str(workdir / "genomes.msh"),
            str(workdir / "reads.msh"),
        ]
    )
    assert rc == 0
    assert out == (
        reference_test_dir / "ref" / "genomes.dist"
    ).read_text()


def test_screen(workdir, reference_test_dir):
    """`mash screen genomes.msh reads*.fastq` vs test/ref/screen."""
    rc, out = _capture(
        [
            "screen",
            str(workdir / "genomes.msh"),
            str(reference_test_dir / "reads1.fastq"),
            str(reference_test_dir / "reads2.fastq"),
        ]
    )
    assert rc == 0
    assert out == (reference_test_dir / "ref" / "screen").read_text()


def test_genomes_info_dump(workdir, reference_test_dir):
    """Round-trip of the reconstructed genome sketches through info -d."""
    rc, out = _capture(["info", "-d", str(workdir / "genomes.msh")])
    assert rc == 0
    assert out == (
        reference_test_dir / "ref" / "genomes.json"
    ).read_text()


def test_dist_reconstructed_vs_each_other(workdir):
    """Distances among the three E. coli genomes match the tutorial values
    (``doc/sphinx/tutorials.rst:56-57``): genome1 vs genome3 at 0.0222766
    is not pinned there, but g1-g2 is."""
    rc, out = _capture(
        [
            "dist",
            str(workdir / "genomes.msh"),
            str(workdir / "genomes.msh"),
        ]
    )
    assert rc == 0
    lines = [ln.split("\t") for ln in out.strip().split("\n")]
    # self-distances are zero with full sharing
    for i in range(3):
        row = lines[i * 3 + i]
        assert row[2] == "0" and row[4] == "1000/1000"
    # the documented g1 vs g2 distance
    g12 = lines[1]
    assert g12[2] == "0.0222766" and g12[4] == "456/1000"
