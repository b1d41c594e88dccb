"""``dist -m 2`` over the bundled fastqs — the BASELINE reads-mode
config (VERDICT r2 missing/weak #8).

No reference golden exists for ``-m 2`` (the reference's make test only
covers ``-m 1`` reads mode), so this pins three things instead:

1. determinism — two full CLI runs produce identical bytes;
2. cross-implementation consistency — the native ``ExactHeap`` and the
   pure-Python ``PyExactHeap`` (independent implementations of
   ``MinHashHeap.cpp:68-146`` min-copy gating) produce the same sketch
   and therefore the same dist table;
3. a repo-golden — the output is pinned byte-for-byte so any future
   change to ``-m`` semantics is a visible diff
   (``tests/goldens/dist_m2.txt``).
"""

from __future__ import annotations

import os

import pytest

from mash_tpu.io import capnp_msh
from mash_tpu.io.formatting import parse_json_dump
from conftest import run_cli as _capture

GOLDEN = os.path.join(
    os.path.dirname(__file__), "goldens", "dist_m2.txt"
)


def _run_m2(d, reference_test_dir, tag):
    out_msh = str(d / ("reads_m2_%s.msh" % tag))
    _capture(
        [
            "sketch", "-r", "-m", "2", "-I", "reads",
            str(reference_test_dir / "reads1.fastq"),
            str(reference_test_dir / "reads2.fastq"),
            "-o", out_msh,
        ]
    )
    golden = (reference_test_dir / "ref" / "genomes.json").read_text()
    params, refs = parse_json_dump(golden)
    gen = str(d / "genomes.msh")
    if not os.path.exists(gen):
        capnp_msh.write_msh(gen, params, refs)
    return _capture(["dist", gen, out_msh])


def test_dist_m2_pinned(tmp_path, reference_test_dir, monkeypatch):
    native_out = _run_m2(tmp_path, reference_test_dir, "a")
    again = _run_m2(tmp_path, reference_test_dir, "b")
    assert native_out == again  # determinism

    # cross-implementation: force the pure-Python heap
    import mash_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "load_library", lambda: None)
    py_out = _run_m2(tmp_path, reference_test_dir, "py")
    assert py_out == native_out

    # sanity: -m 2 keeps only multi-copy k-mers, so the sketch differs
    # from the default -m 1 run
    monkeypatch.undo()
    m1_msh = str(tmp_path / "reads_m1.msh")
    _capture(
        [
            "sketch", "-r", "-I", "reads",
            str(reference_test_dir / "reads1.fastq"),
            str(reference_test_dir / "reads2.fastq"),
            "-o", m1_msh,
        ]
    )
    m1 = capnp_msh.read_msh(m1_msh).references[0]
    m2 = capnp_msh.read_msh(
        str(tmp_path / "reads_m2_a.msh")
    ).references[0]
    assert not (
        len(m1.hashes) == len(m2.hashes)
        and (m1.hashes == m2.hashes).all()
    )

    # repo-golden pin
    golden = open(GOLDEN).read()
    assert native_out == golden
