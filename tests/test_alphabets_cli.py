"""CLI round-trips for non-ACGT alphabets: ``sketch -a`` (protein) and
``-z`` (custom alphabet) through a ``.msh`` file, ``info -d``, and
``dist`` (VERDICT r2 missing #5).

Reference behavior: alphabet handling in ``Sketch.cpp:1108-1137``
(alphabet string persisted in the capnp header), protein defaults
``sketchParameterSetup.cpp:68-80`` (``-a`` implies ``-n`` and k=9
unless ``-k`` is given), and ``use64 = |alphabet|^k > 2^32``
(``hash.cpp``).
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from mash_tpu.io import capnp_msh
from conftest import run_cli as _run


PROTEIN_FASTA = (
    ">prot1 a protein\n"
    "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSGAEKAVQVKVKA"
    "LPDAQFEVVHSLAKWKRQTLGQHDFSAGEGLYTHMKALRPDEDRLSPLHSVYVDQWDWERV\n"
    ">prot2 another\n"
    "MSKIVKIIGREIIDSRGNPTVEAEVHLEGGFVGMAAAPSGASTGSREALELRDGDKSRFLG"
    "KGVTKAVAAVNGPIAQALIGKDAKDQAGIDKIMIDLDGTENKSKFGANAILAVSLANAKAA\n"
)


@pytest.fixture(scope="module")
def protein_msh(tmp_path_factory):
    d = tmp_path_factory.mktemp("alpha")
    fna = d / "prot.faa"
    fna.write_text(PROTEIN_FASTA)
    out = str(d / "prot.msh")
    _run(["sketch", "-a", "-i", "-s", "100", "-o", out, str(fna)])
    return str(fna), out


def test_protein_sketch_params_persist(protein_msh):
    _fna, msh = protein_msh
    sk = capnp_msh.read_msh(msh)
    p = sk.params
    assert p.alphabet_string() == "ACDEFGHIKLMNPQRSTVWY"
    assert p.kmer_size == 9          # -a default (no -k)
    assert p.noncanonical is True    # -a implies -n
    assert p.use64 is True           # 20^9 > 2^32
    assert len(sk.references) == 2
    assert all(len(r.hashes) > 0 for r in sk.references)


def test_protein_info_dump_alphabet(protein_msh):
    _fna, msh = protein_msh
    out = _run(["info", "-d", msh])
    j = json.loads(out)
    assert j["alphabet"] == "ACDEFGHIKLMNPQRSTVWY"
    assert j["kmer"] == 9
    assert j["canonical"] is False


def test_protein_dist_self(protein_msh):
    _fna, msh = protein_msh
    out = _run(["dist", msh, msh])
    lines = out.strip().splitlines()
    assert len(lines) == 4  # 2x2 pairs
    for ln in lines:
        ref, qry, d, p, shared = ln.split("\t")
        if ref == qry:
            assert d == "0"
            num, den = shared.split("/")
            assert num == den


def test_protein_kmer_override(tmp_path):
    """-a with an explicit -k keeps the user's k (setup.cpp:68-80)."""
    fna = tmp_path / "p.faa"
    fna.write_text(PROTEIN_FASTA)
    out = str(tmp_path / "p.msh")
    _run(["sketch", "-a", "-k", "7", "-s", "50", "-o", out, str(fna)])
    sk = capnp_msh.read_msh(out)
    assert sk.params.kmer_size == 7
    assert sk.params.alphabet_string() == "ACDEFGHIKLMNPQRSTVWY"


@pytest.mark.parametrize(
    "alpha,k,expect64",
    [
        ("ACGTN", 21, True),   # 5^21 > 2^32
        ("AC", 12, False),     # 2^12 < 2^32 -> 32-bit hashes
    ],
)
def test_custom_alphabet_roundtrip(tmp_path, alpha, k, expect64):
    rng = np.random.default_rng(3)
    letters = np.frombuffer(alpha.encode(), dtype=np.uint8)
    seq = rng.choice(letters, size=400).tobytes().decode()
    fna = tmp_path / "z.fna"
    fna.write_text(">z1 custom\n%s\n>z2 other\n%s\n" % (seq, seq[::-1]))
    out = str(tmp_path / "z.msh")
    _run(
        ["sketch", "-z", alpha, "-k", str(k), "-s", "60", "-o", out,
         str(fna)]
    )
    sk = capnp_msh.read_msh(out)
    # the alphabet persists as a membership table (Sketch.h:67), so the
    # string round-trips in sorted ASCII order
    sorted_alpha = "".join(sorted(set(alpha)))
    assert sk.params.alphabet_string() == sorted_alpha
    assert sk.params.noncanonical is True  # custom alphabets imply -n
    assert sk.params.use64 is expect64
    assert all(len(r.hashes) > 0 for r in sk.references)
    if not expect64:
        assert all(
            int(r.hashes.max()) < 2**32 for r in sk.references
        )
    # info -d reports the custom alphabet; dist self-distance is 0
    j = json.loads(_run(["info", "-d", out]))
    assert j["alphabet"] == sorted_alpha
    dist_out = _run(["dist", out, out])
    for ln in dist_out.strip().splitlines():
        ref, qry, d, _p, _s = ln.split("\t")
        if ref == qry:
            assert d == "0"
