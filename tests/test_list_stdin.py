"""``-l`` (file-of-file-names) and stdin (``-``) input paths.

Reference: ``-l`` list handling per command (``CommandSketch.cpp``,
``CommandDist.cpp`` — each query file contains one path per line,
via ``splitFile``), stdin naming (empty name, comment ``-``-style
behavior in ``Sketch::initFromFiles``/``sketchFile``).
"""

from __future__ import annotations

import io

import numpy as np
import pytest

from mash_tpu.__main__ import main
from mash_tpu.io import capnp_msh
from conftest import run_cli as _run


FNA1 = b">a one\n" + b"ACGTTGCAACGTTGCAATGCCGTA" * 8 + b"\n"
FNA2 = b">b two\n" + b"TTGACGTCAGGTTGCAACGTACCA" * 8 + b"\n"


@pytest.fixture()
def two_files(tmp_path):
    f1 = tmp_path / "a.fna"
    f2 = tmp_path / "b.fna"
    f1.write_bytes(FNA1)
    f2.write_bytes(FNA2)
    return str(f1), str(f2)


def test_sketch_list_input_matches_direct(tmp_path, two_files):
    f1, f2 = two_files
    lst = tmp_path / "files.txt"
    lst.write_text("%s\n%s\n" % (f1, f2))

    direct = str(tmp_path / "direct.msh")
    listed = str(tmp_path / "listed.msh")
    _run(["sketch", "-k", "12", "-s", "50", "-o", direct, f1, f2])
    _run(["sketch", "-l", "-k", "12", "-s", "50", "-o", listed,
          str(lst)])
    a = capnp_msh.read_msh(direct)
    b = capnp_msh.read_msh(listed)
    assert [r.name for r in a.references] == [
        r.name for r in b.references
    ]
    for ra, rb in zip(a.references, b.references):
        np.testing.assert_array_equal(ra.hashes, rb.hashes)


def test_dist_list_input_matches_direct(tmp_path, two_files):
    f1, f2 = two_files
    ref = str(tmp_path / "ref.msh")
    _run(["sketch", "-k", "12", "-s", "50", "-o", ref, f1])
    lst = tmp_path / "q.txt"
    lst.write_text("%s\n%s\n" % (f1, f2))
    direct = _run(["dist", ref, f1, f2])
    listed = _run(["dist", "-l", ref, str(lst)])
    assert direct == listed
    assert len(direct.strip().splitlines()) == 2


def test_sketch_stdin(tmp_path, monkeypatch, two_files):
    f1, _f2 = two_files

    class FakeStdin:
        def __init__(self, data):
            self.buffer = io.BytesIO(data)

    import sys

    monkeypatch.setattr(sys, "stdin", FakeStdin(FNA1))
    out = str(tmp_path / "stdin.msh")
    _run(["sketch", "-k", "12", "-s", "50", "-o", out, "-"])
    sk = capnp_msh.read_msh(out)
    assert len(sk.references) == 1

    # same content from a file: identical hash set, file-derived name
    ref_file = str(tmp_path / "file.msh")
    _run(["sketch", "-k", "12", "-s", "50", "-o", ref_file, f1])
    skf = capnp_msh.read_msh(ref_file)
    np.testing.assert_array_equal(
        sk.references[0].hashes, skf.references[0].hashes
    )
    assert skf.references[0].name == f1
    assert sk.references[0].name != skf.references[0].name
