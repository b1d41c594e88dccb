"""Streamed dist (row-stripe pipeline) parity with the full-matrix path."""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pytest

import mash_tpu.commands.dist as dist_mod
from mash_tpu.__main__ import main
from mash_tpu.core.params import default_nucleotide_params
from mash_tpu.core.sketch import SketchRef
from mash_tpu.io import capnp_msh


def _make_msh(path, rng, n, s, pool):
    params = default_nucleotide_params()
    params.min_hashes_per_window = s
    refs = []
    for i in range(n):
        take = rng.choice(len(pool), size=s, replace=False)
        h = pool[take]
        priv = rng.random(s) < 0.4
        h[priv] = rng.integers(
            0, 2**62, size=int(priv.sum()), dtype=np.int64
        ).astype(np.uint64)
        refs.append(
            SketchRef(
                name="s%02d" % i,
                comment="c%d" % i,
                length=int(rng.integers(10**5, 10**7)),
                hashes=np.sort(np.unique(h)),
                counts=None,
            )
        )
    capnp_msh.write_msh(str(path), params, refs)


@pytest.fixture(scope="module")
def msh_pair(tmp_path_factory):
    rng = np.random.default_rng(29)
    s = 150
    pool = np.sort(
        rng.integers(0, 2**62, size=5 * s, dtype=np.int64).astype(
            np.uint64
        )
    )
    d = tmp_path_factory.mktemp("dist")
    ref = d / "ref.msh"
    qry = d / "qry.msh"
    _make_msh(ref, rng, 30, s, pool)
    _make_msh(qry, rng, 24, s, pool)
    return str(ref), str(qry)


def _run(args):
    so = io.StringIO()
    with contextlib.redirect_stdout(so):
        rc = main(args)
    assert rc == 0
    return so.getvalue()


@pytest.mark.parametrize(
    "extra", [[], ["-t"], ["-d", "0.4", "-v", "0.5"]]
)
def test_dist_streamed_matches_full(msh_pair, extra, monkeypatch):
    ref, qry = msh_pair
    args = ["dist"] + extra + [ref, qry]

    monkeypatch.setattr(dist_mod, "STREAM_MIN_CELLS", 10**12)
    full = _run(args)
    monkeypatch.setattr(dist_mod, "STREAM_MIN_CELLS", 10)
    streamed = _run(args)
    assert streamed == full
    assert full.strip()  # sanity: output is non-empty
