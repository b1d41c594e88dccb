"""``mash within`` full-output parity against a transcribed oracle.

The oracle below is a literal, tests-only transcription of the
reference's containment walk and output loop
(``/root/reference/src/mash/CommandContain.cpp:179-263``):
``containSketches`` (the merge walk that sets score and error) plus
``writeOutput`` (pair enumeration order — query-outer, ref-inner — and
the ``pair->error <= error`` threshold filter).  Nothing else in the
repo derives from it; the production path is ``ops.distance.
pairwise_containment`` + ``commands/contain.py``.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mash_tpu.core.params import default_nucleotide_params
from mash_tpu.core.sketch import SketchRef
from mash_tpu.io import capnp_msh
from mash_tpu.io.formatting import cpp_double
from conftest import run_cli as _run_within


def _contain_sketches_oracle(ref_h: np.ndarray, qry_h: np.ndarray):
    """Literal transcription of containSketches
    (CommandContain.cpp:231-263).  Returns (score, error)."""
    common = 0
    denom = min(len(ref_h), len(qry_h))
    i = 0
    j = 0
    steps = 0
    while steps < denom and i < len(ref_h):
        if ref_h[i] < qry_h[j]:
            i += 1
            steps -= 1
        elif qry_h[j] < ref_h[i]:
            j += 1
        else:
            i += 1
            j += 1
            common += 1
        steps += 1
    if j == 0:
        return float("nan"), float("inf")
    return float(common) / j, 1.0 / math.sqrt(j)


def _write_output_oracle(refs, qrys, error_max: float) -> str:
    """writeOutput semantics (CommandContain.cpp:179-202): pairs in
    (query i, ref j) order with j fastest; filter error <= threshold;
    fields score, error, ref name, query name."""
    out = []
    for q in qrys:
        for r in refs:
            score, err = _contain_sketches_oracle(r.hashes, q.hashes)
            if err <= error_max:
                out.append(
                    "%s\t%s\t%s\t%s\n"
                    % (cpp_double(score), cpp_double(err), r.name, q.name)
                )
    return "".join(out)


def _mk_refs(rng, names, sizes, pool):
    refs = []
    for name, s in zip(names, sizes):
        take = rng.choice(len(pool), size=s, replace=False)
        h = pool[take]
        priv = rng.random(s) < 0.35
        h[priv] = rng.integers(
            0, 2**62, size=int(priv.sum()), dtype=np.int64
        ).astype(np.uint64)
        refs.append(
            SketchRef(
                name=name,
                comment="",
                length=int(rng.integers(10**4, 10**6)),
                hashes=np.sort(np.unique(h)),
                counts=None,
            )
        )
    return refs


@pytest.fixture(scope="module")
def within_fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("within")
    rng = np.random.default_rng(77)
    pool = np.sort(
        np.unique(
            rng.integers(0, 2**62, size=4000, dtype=np.int64).astype(
                np.uint64
            )
        )
    )
    params = default_nucleotide_params()
    params.min_hashes_per_window = 1000

    # asymmetric sizes: bounds 1/sqrt(j) straddle the default 0.05
    # threshold (s=100 -> 0.1 filtered; s=1000 -> ~0.0316 kept)
    refs = _mk_refs(rng, ["refA", "refB"], [1000, 700], pool)
    qrys = _mk_refs(rng, ["qryX", "qryY", "qryZ"], [1000, 400, 100], pool)
    # one query fully inside refA: exact score-1 rows
    qrys[1] = SketchRef(
        name="qryY",
        comment="",
        length=12345,
        hashes=refs[0].hashes[:400].copy(),
        counts=None,
    )
    ref_path = str(d / "ref.msh")
    qry_path = str(d / "qry.msh")
    capnp_msh.write_msh(ref_path, params, refs)
    capnp_msh.write_msh(qry_path, params, qrys)
    return refs, qrys, ref_path, qry_path


@pytest.mark.parametrize("threshold", [None, 0.2, 0.0001])
def test_within_output_matches_transcription(within_fixture, threshold):
    refs, qrys, ref_path, qry_path = within_fixture
    argv = ["within", ref_path, qry_path]
    error_max = 0.05
    if threshold is not None:
        argv = ["within", "-e", str(threshold), ref_path, qry_path]
        error_max = threshold
    got = _run_within(argv)
    exp = _write_output_oracle(refs, qrys, error_max)
    assert got == exp
    if threshold is None:
        # the fixture is built so the default threshold both keeps and
        # drops rows; guard that the test is actually discriminating
        n_all = len(_write_output_oracle(refs, qrys, 1.0).splitlines())
        n_kept = len(got.splitlines())
        assert 0 < n_kept < n_all


def test_within_self_containment_rows(within_fixture):
    refs, _q, ref_path, _qp = within_fixture
    got = _run_within(["within", ref_path, ref_path])
    # diagonal rows must be exact 1s
    for r in refs:
        assert "1\t" in got
        line = "1\t%s\t%s\t%s\n" % (
            cpp_double(1.0 / math.sqrt(len(r.hashes))),
            r.name,
            r.name,
        )
        assert line in got
