"""Windowed minmer mode and the find command."""

import contextlib
import io

import numpy as np
import pytest

from mash_tpu.__main__ import main
from mash_tpu.native import minmer_positions
from mash_tpu.native.pyheap import py_minmers


def test_minmer_sweep_matches_oracle():
    rng = np.random.default_rng(0)
    for trial in range(15):
        n = int(rng.integers(5, 300))
        window = int(rng.integers(1, 40))
        mins = int(rng.integers(1, 6))
        hs = rng.integers(0, 40, size=n).astype(np.uint64)
        np_, nh = minmer_positions(hs, window, mins)
        pp, ph = py_minmers(hs, window, mins)
        np.testing.assert_array_equal(np_, pp)
        np.testing.assert_array_equal(nh, ph)


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory):
    d = tmp_path_factory.mktemp("find")
    rng = np.random.default_rng(42)
    genome = rng.choice(
        np.frombuffer(b"ACGT", dtype=np.uint8), size=30000
    ).tobytes()
    ref = d / "ref.fna"
    with open(ref, "wb") as f:
        f.write(b">chr1 test genome\n")
        for i in range(0, len(genome), 70):
            f.write(genome[i : i + 70] + b"\n")
    q = genome[12000:14000]
    comp = {65: 84, 84: 65, 67: 71, 71: 67}
    qrc = bytes(comp[c] for c in reversed(q))
    qry = d / "q.fna"
    with open(qry, "wb") as f:
        f.write(b">qfwd\n" + q + b"\n>qrev\n" + qrc + b"\n")
    return d, str(ref), str(qry)


def _run(args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(args)
    return rc, buf.getvalue()


def test_find_locates_query(synthetic):
    _d, ref, qry = synthetic
    rc, out = _run(["find", "-L", "1000", ref, qry])
    assert rc == 0
    lines = [l.split("\t") for l in out.strip().split("\n")]
    assert len(lines) == 2
    fwd = next(l for l in lines if l[0] == "qfwd")
    rev = next(l for l in lines if l[0] == "qrev")
    assert fwd[1] == "chr1" and fwd[4] == "+"
    assert rev[1] == "chr1" and rev[4] == "-"
    # hit falls inside the planted region
    assert 12000 <= int(fwd[2]) and int(fwd[3]) < 14000
    assert fwd[5] == "1"


def test_find_via_msw_roundtrip(synthetic):
    d, ref, qry = synthetic
    msw = str(d / "refw.msw")
    rc, _ = _run(
        ["sketch", "-W", "-L", "1000", "-s", "10", "-o", msw, ref]
    )
    assert rc == 0
    rc1, direct = _run(["find", "-L", "1000", "-s", "10", ref, qry])
    rc2, viamsw = _run(["find", msw, qry])
    assert rc1 == 0 and rc2 == 0
    assert viamsw == direct


def test_find_best_limits_output(synthetic):
    _d, ref, qry = synthetic
    rc, out = _run(
        ["find", "-L", "1000", "-t", "0.01", "-b", "1", ref, qry]
    )
    assert rc == 0
    lines = out.strip().split("\n")
    # one best hit per query record
    assert len(lines) <= 2


def test_find_rejects_msh(synthetic, tmp_path):
    _d, ref, qry = synthetic
    rc, _ = _run(["find", "x.msh", qry])
    assert rc == 1
