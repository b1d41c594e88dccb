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


def test_common_only_fast_path_matches_packed():
    """Full sketches (n == cap) take the uint16 common-only readback;
    the reattached ``denom == cap`` packing must equal the general
    packed path cell for cell (non-triangle and triangle)."""
    from mash_tpu.ops import distance as dist_ops
    from mash_tpu.ops.distance import stream_pair_stripes

    rng = np.random.default_rng(33)
    s = 64
    n = 70  # not a multiple of any block size: exercises pad trimming
    pool = np.sort(
        rng.integers(0, 2**62, size=6 * s, dtype=np.int64).astype(
            np.uint64
        )
    )
    H = np.empty((n, s), dtype=np.uint64)
    for i in range(n):
        H[i] = np.sort(rng.choice(pool, size=s, replace=False))
    sizes = np.full(n, s, dtype=np.int32)

    def collect(qn, rn, triangle):
        out = {}
        for i0, stripe in stream_pair_stripes(
            H, qn, H, rn, cap=s, use64=True, triangle=triangle
        ):
            out[i0] = stripe
        return out

    # general path forced by a single non-full size (row n-1 only, so
    # every other cell is identical work)
    sizes_mixed = sizes.copy()
    sizes_mixed[-1] = s - 1
    for triangle in (False, True):
        fast = collect(sizes, sizes, triangle)
        slow = collect(sizes_mixed, sizes_mixed, triangle)
        assert fast.keys() == slow.keys()
        for i0, st in fast.items():
            sl = slow[i0]
            assert st.shape == sl.shape and st.dtype == np.uint32
            # rows/cols not involving the perturbed last sketch agree
            r_hi = min(st.shape[0], n - 1 - i0)
            c_hi = min(st.shape[1], n - 1)
            if r_hi > 0 and c_hi > 0:
                np.testing.assert_array_equal(
                    st[:r_hi, :c_hi], sl[:r_hi, :c_hi]
                )
            # fast-path denominators are cap everywhere
            assert (st >> 16 == s).all()
