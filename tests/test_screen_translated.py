"""6-frame translated screen: amino-acid DB vs nucleotide queries.

The reference translates read chunks into all six frames when the DB
sketch uses the protein alphabet (``CommandScreen.cpp:516-582``, codon
table :625-809).  A DNA sequence screened against the sketch of its own
translation must therefore be (near-)fully contained.
"""

import contextlib
import io

import numpy as np
import pytest

from mash_tpu.__main__ import main
from mash_tpu.ops.screen_ops import translate_frames

_CODON = {
    "TTT": "F", "TTC": "F", "TTA": "L", "TTG": "L",
    "CTT": "L", "CTC": "L", "CTA": "L", "CTG": "L",
    "ATT": "I", "ATC": "I", "ATA": "I", "ATG": "M",
    "GTT": "V", "GTC": "V", "GTA": "V", "GTG": "V",
    "TCT": "S", "TCC": "S", "TCA": "S", "TCG": "S",
    "CCT": "P", "CCC": "P", "CCA": "P", "CCG": "P",
    "ACT": "T", "ACC": "T", "ACA": "T", "ACG": "T",
    "GCT": "A", "GCC": "A", "GCA": "A", "GCG": "A",
    "TAT": "Y", "TAC": "Y", "TAA": "*", "TAG": "*",
    "CAT": "H", "CAC": "H", "CAA": "Q", "CAG": "Q",
    "AAT": "N", "AAC": "N", "AAA": "K", "AAG": "K",
    "GAT": "D", "GAC": "D", "GAA": "E", "GAG": "E",
    "TGT": "C", "TGC": "C", "TGA": "*", "TGG": "W",
    "CGT": "R", "CGC": "R", "CGA": "R", "CGG": "R",
    "AGT": "S", "AGC": "S", "AGA": "R", "AGG": "R",
    "GGT": "G", "GGC": "G", "GGA": "G", "GGG": "G",
}


def _translate(dna: str) -> str:
    return "".join(
        _CODON[dna[i : i + 3]]
        for i in range(0, len(dna) - 2, 3)
    )


def _run(args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        try:
            rc = main(args)
        except SystemExit as e:
            rc = int(e.code or 0)
    return rc, buf.getvalue()


def test_translate_frames_matches_codon_table():
    rng = np.random.default_rng(0)
    dna = "".join(rng.choice(list("ACGT"), size=99))
    frame0 = translate_frames(
        np.frombuffer(dna.encode(), dtype=np.uint8)
    )[0]
    assert frame0.tobytes().decode() == _translate(dna)


def test_translated_screen_contains_source_dna(tmp_path):
    rng = np.random.default_rng(1)
    dna = "".join(rng.choice(list("ACGT"), size=3000))
    protein = _translate(dna).replace("*", "K")  # avoid stop codons
    # back-translate the stop-free protein deterministically so DNA and
    # protein stay consistent
    inv = {}
    for codon, aa in _CODON.items():
        inv.setdefault(aa, codon)
    dna2 = "".join(inv[aa] for aa in protein)

    faa = tmp_path / "prot.faa"
    faa.write_text(">p1 test protein\n%s\n" % protein)
    fna = tmp_path / "dna.fna"
    fna.write_text(">d1 coding sequence\n%s\n" % dna2)

    db = tmp_path / "prot.msh"
    rc, _ = _run(["sketch", "-a", "-s", "200", "-o", str(db), str(faa)])
    assert rc == 0
    rc, out = _run(["screen", str(db), str(fna)])
    assert rc == 0, out
    line = out.splitlines()[0]
    identity = float(line.split("\t")[0])
    shared = line.split("\t")[1]
    # frame 0 of the DNA is exactly the protein: full containment
    assert identity > 0.99, out
    num, den = shared.split("/")
    assert int(num) == int(den), out
