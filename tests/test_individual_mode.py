"""Individual-mode (-i) sketching: batched path parity + CLI flow."""

from __future__ import annotations

import contextlib
import io
import random

import numpy as np

from mash_tpu.__main__ import main
from mash_tpu.core.engine import (
    SketchEngine,
    sketch_records_individual,
)
from mash_tpu.core.params import default_nucleotide_params
from mash_tpu.io.fastx import read_fastx


def _write_fasta(path, rng, n_rec, maxlen):
    with open(path, "w") as f:
        for i in range(n_rec):
            ln = rng.randrange(0, maxlen)
            seq = "".join(rng.choice("ACGTN") for _ in range(ln))
            f.write(">ctg%d c%d\n%s\n" % (i, i, seq))


def test_individual_batched_matches_per_record(tmp_path):
    rng = random.Random(21)
    f = tmp_path / "multi.fna"
    _write_fasta(str(f), rng, 60, 5000)

    params = default_nucleotide_params()
    engine = SketchEngine(params, chunk_len=1 << 14)

    refs = list(sketch_records_individual(engine, read_fastx(str(f))))
    slow = []
    for rec in read_fastx(str(f)):
        if len(rec.seq) < params.kmer_size:
            continue
        state = engine.sketch_seqs([rec.seq])
        slow.append(
            engine.state_to_ref(
                state, rec.name, rec.comment or "", len(rec.seq)
            )
        )
    assert len(refs) == len(slow)
    for a, b in zip(refs, slow):
        assert a.name == b.name
        assert a.comment == b.comment
        assert a.length == b.length
        np.testing.assert_array_equal(a.hashes, b.hashes)
        np.testing.assert_array_equal(a.counts, b.counts)


def test_individual_cli_roundtrip(tmp_path):
    rng = random.Random(8)
    f = tmp_path / "multi.fna"
    _write_fasta(str(f), rng, 25, 2000)
    out = tmp_path / "multi"

    so = io.StringIO()
    with contextlib.redirect_stdout(so):
        rc = main(["sketch", "-i", str(f), "-o", str(out)])
    assert rc == 0

    so = io.StringIO()
    with contextlib.redirect_stdout(so):
        rc = main(["info", str(out) + ".msh"])
    assert rc == 0
    body = so.getvalue()
    # one row per record with >= k valid-window potential
    n_expected = sum(
        1 for r in read_fastx(str(f)) if len(r.seq) >= 21
    )
    assert body.count("ctg") >= n_expected


def test_individual_mode_all_short_records_warns(tmp_path, capsys):
    """-i on a file whose records are all shorter than k reports the
    same WARNING as the concat path, not a generic read error."""
    import pytest

    from mash_tpu.core.loader import init_from_files
    from mash_tpu.core.params import default_nucleotide_params

    f = tmp_path / "short.fna"
    f.write_text(">a\nACGT\n>b\nGGG\n")
    params = default_nucleotide_params()
    params.concatenated = False  # individual mode
    with pytest.raises(SystemExit):
        init_from_files([str(f)], params)
    err = capsys.readouterr().err
    assert "shorter than the k-mer size" in err
    assert "ERROR: reading" not in err
