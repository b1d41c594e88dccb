"""Streamed triangle (stripe pipeline + native formatter) parity.

The streamed path must produce byte-identical output to the full-matrix
path for both PHYLIP and edge-list modes, including the max-p-value
stderr line.
"""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pytest

import mash_tpu.commands.triangle as tri_mod
from mash_tpu.__main__ import main
from mash_tpu.core.params import default_nucleotide_params
from mash_tpu.core.sketch import SketchRef
from mash_tpu.io import capnp_msh


@pytest.fixture(scope="module")
def msh_file(tmp_path_factory):
    """A .msh with 40 random sketches with varying overlap."""
    rng = np.random.default_rng(17)
    params = default_nucleotide_params()
    s = 200
    params.min_hashes_per_window = s
    base = np.sort(
        rng.integers(0, 2**62, size=4 * s, dtype=np.int64).astype(
            np.uint64
        )
    )
    refs = []
    for i in range(40):
        # mix shared and private hashes so common varies incl. 0
        if i % 7 == 0:
            h = rng.integers(
                0, 2**62, size=s, dtype=np.int64
            ).astype(np.uint64)
        else:
            take = rng.choice(len(base), size=s, replace=False)
            h = base[take]
            priv = rng.random(s) < 0.3
            h[priv] = rng.integers(
                0, 2**62, size=int(priv.sum()), dtype=np.int64
            ).astype(np.uint64)
        h = np.unique(h)
        refs.append(
            SketchRef(
                name="g%02d" % i,
                comment="c%d" % i,
                length=int(rng.integers(10**6, 10**7)),
                hashes=np.sort(h),
                counts=None,
            )
        )
    path = tmp_path_factory.mktemp("tri") / "t.msh"
    capnp_msh.write_msh(str(path), params, refs)
    return str(path)


def _run(args):
    so, se = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(so), contextlib.redirect_stderr(se):
        rc = main(args)
    assert rc == 0
    return so.getvalue(), se.getvalue()


@pytest.mark.parametrize("mode", ["phylip", "edge", "edge_filtered"])
def test_streamed_matches_full(msh_file, mode, monkeypatch):
    args = ["triangle", msh_file]
    if mode == "edge":
        args.insert(1, "-E")
    elif mode == "edge_filtered":
        args[1:1] = ["-E", "-d", "0.4", "-v", "0.5"]

    monkeypatch.setattr(tri_mod, "STREAM_MIN_SKETCHES", 10**9)
    full_out, full_err = _run(args)
    monkeypatch.setattr(tri_mod, "STREAM_MIN_SKETCHES", 8)
    stream_out, stream_err = _run(args)

    assert stream_out == full_out
    # stderr carries the max p-value line in phylip mode
    assert stream_err == full_err
