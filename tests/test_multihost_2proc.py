"""Real 2-process multi-host execution (jax.distributed over CPU).

Spawns two coordinator-connected worker processes (4 virtual CPU
devices each — 8 global) running the actual CLI under the documented
``MASH_TPU_COORDINATOR`` launch environment, then asserts the
cross-host assembly rules against single-process runs:

- pooled ``sketch -r`` over sharded inputs writes a byte-identical
  ``.msh`` (including the elected globally-first-record comment, which
  is deliberately placed on rank 1's shard);
- streamed ``dist``/``triangle`` row stripes partition exactly across
  ranks (round-robin by block) and concatenate to the single-process
  output; only rank 0 emits the PHYLIP header and Max p-value line;
- ``screen`` count vectors sum across hosts and only rank 0 writes.

This executes ``multihost.py``'s allgather/merge/election helpers with
``process_count() == 2`` — the non-degenerate paths the in-suite tests
cannot reach.  Skips if the coordinator port cannot be bound or the
platform lacks multi-process support.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

import mash_tpu.commands.dist as dist_mod
import mash_tpu.commands.triangle as tri_mod
from mash_tpu.__main__ import main
from mash_tpu.core.params import default_nucleotide_params
from mash_tpu.core.sketch import SketchRef
from mash_tpu.io import capnp_msh

REPO = str(pathlib.Path(__file__).resolve().parent.parent)
WORKER = str(pathlib.Path(__file__).resolve().parent / "multihost_worker.py")

K = 21
S = 64
N_REFS = 70  # 3 row stripes of 32 on the workers' 4-device meshes
N_QRY = 40  # 2 row stripes


def _skip_or_fail(reason: str) -> None:
    """Environment-degradation skips fail loudly in strict CI.

    These tests have two legitimate skip paths (coordinator port bind
    failure, worker timeout); a regression could otherwise silently
    park the only real 2-process multihost coverage as 'skipped' while
    the suite still reads green.  Set MASH_TPU_REQUIRE_2PROC=1 in CI to
    turn the skips into failures.
    """
    import pytest

    if os.environ.get("MASH_TPU_REQUIRE_2PROC") == "1":
        raise AssertionError(
            "2-proc multihost path degraded (strict mode): " + reason
        )
    pytest.skip(reason)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _mk_reads(path, seed, n_reads=120, rl=100, first_short=False,
              first_long_comment=False):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    tag = pathlib.Path(path).stem
    with open(path, "wb") as f:
        if first_short:
            # shorter than k: skipped, so this file's first VALID
            # record is ordinal 1 — the naming election must not pick
            # ordinal-0-invalid records
            f.write(b"@%s_short too_short\nACGT\n+\nIIII\n" % tag.encode())
        for i in range(n_reads):
            seq = rng.choice(bases, size=rl).tobytes()
            comment = b"c%d" % i
            if first_long_comment and i == 0:
                # > 8 KiB: the elected name/comment payload must cross
                # hosts untruncated (no fixed allgather buffer cap)
                comment += b" " + b"x" * 9000
            f.write(
                b"@%s_r%d %s\n%s\n+\n%s\n"
                % (tag.encode(), i, comment, seq, b"I" * rl)
            )


def _mk_msh(path, n, seed):
    rng = np.random.default_rng(seed)
    params = default_nucleotide_params()
    params.kmer_size = K
    params.min_hashes_per_window = S
    pool = np.sort(
        rng.integers(0, 2**62, size=8 * S, dtype=np.int64).astype(
            np.uint64
        )
    )
    refs = []
    for i in range(n):
        h = np.unique(rng.choice(pool, size=S, replace=False))
        refs.append(
            SketchRef(
                name="g%03d" % i,
                comment="c%d" % i,
                length=int(rng.integers(10**5, 10**6)),
                hashes=np.sort(h),
                counts=None,
            )
        )
    capnp_msh.write_msh(path, params, refs)


def _run_single(args):
    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out):
        with contextlib.redirect_stderr(err):
            rc = main(args)
    assert rc in (0, None), (args, rc, err.getvalue())
    return out.getvalue(), err.getvalue()


@pytest.fixture(scope="module")
def tw(tmp_path_factory):
    """Fixture dir + 2-worker run results + single-process baselines."""
    root = tmp_path_factory.mktemp("mh2")
    reads = []
    for i in range(4):
        p = str(root / ("f%d.fastq" % i))
        _mk_reads(
            p, seed=50 + i, first_short=(i == 0),
            first_long_comment=(i == 1),
        )
        reads.append(p)
    refs_msh = str(root / "refs.msh")
    qry_msh = str(root / "qry.msh")
    _mk_msh(refs_msh, N_REFS, seed=7)
    _mk_msh(qry_msh, N_QRY, seed=8)
    # screen DB: sketches of the read files themselves so counts hit
    db_msh = str(root / "db.msh")
    _run_single(["sketch", "-k", str(K), "-s", str(S), "-o", db_msh]
                + reads)
    # taxscreen: tiny taxonomy + a taxid-commented DB over the reads
    tax_dir = root / "tax"
    tax_dir.mkdir()
    (tax_dir / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n562\t|\t1\t|\tspecies\t|\n"
    )
    (tax_dir / "names.dmp").write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n"
        "562\t|\tEscherichia coli\t|\t\t|\tscientific name\t|\n"
    )
    tax_db = str(root / "taxdb.msh")
    _run_single(
        ["sketch", "-k", str(K), "-s", str(S), "-r", "-I", "pool",
         "-C", "taxid 562", "-o", tax_db] + reads
    )

    outdir = root / "out"
    outdir.mkdir()
    cfg = {
        "repo": REPO,
        "outdir": str(outdir),
        "read_files": reads,
        "refs_msh": refs_msh,
        "qry_msh": qry_msh,
        "screen_db": db_msh,
        "tax_dir": str(tax_dir),
        "tax_db": tax_db,
    }
    cfg_path = str(root / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            MASH_TPU_COORDINATOR="localhost:%d" % port,
            MASH_TPU_NUM_PROCESSES="2",
            MASH_TPU_PROCESS_ID=str(rank),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, cfg_path],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    try:
        outs = [p.communicate(timeout=600) for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        _skip_or_fail("multi-process workers timed out")
    for rank, (p, (so, se)) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            if "initialize" in se or "bind" in se.lower():
                _skip_or_fail(
                    "distributed init unavailable: %s" % se[-500:]
                )
            raise AssertionError(
                "worker %d failed rc=%d\n%s" % (rank, p.returncode, se)
            )
    for rank in range(2):
        assert (outdir / ("rank%d.done" % rank)).exists()

    # single-process baselines with the same streamed-path forcing
    old_d, old_t = dist_mod.STREAM_MIN_CELLS, tri_mod.STREAM_MIN_SKETCHES
    dist_mod.STREAM_MIN_CELLS = 0
    tri_mod.STREAM_MIN_SKETCHES = 0
    try:
        single = {
            "dist": _run_single(["dist", refs_msh, qry_msh]),
            "dist_t": _run_single(["dist", "-t", refs_msh, qry_msh]),
            "triangle": _run_single(["triangle", refs_msh]),
            "triangle_edge": _run_single(["triangle", "-E", refs_msh]),
            "screen": _run_single(["screen", db_msh] + reads),
            "within": _run_single(
                ["within", "-e", "1", refs_msh, qry_msh]
            ),
            "taxscreen": _run_single(
                ["taxscreen", "-t", str(tax_dir), tax_db] + reads
            ),
        }
    finally:
        dist_mod.STREAM_MIN_CELLS = old_d
        tri_mod.STREAM_MIN_SKETCHES = old_t
    exp_msh = str(root / "expected.msh")
    _run_single(["sketch", "-r", "-I", "pooled", "-o", exp_msh] + reads)
    return {
        "outdir": outdir,
        "single": single,
        "exp_msh": exp_msh,
        "cfg": cfg,
    }


def _rank_out(tw, rank, scenario):
    return (tw["outdir"] / ("rank%d_%s.out" % (rank, scenario))).read_text()


def _rank_err(tw, rank, scenario):
    return (tw["outdir"] / ("rank%d_%s.err" % (rank, scenario))).read_text()


def test_pooled_sketch_matches_single_process(tw):
    got = (tw["outdir"] / "pooled.msh").read_bytes()
    exp = pathlib.Path(tw["exp_msh"]).read_bytes()
    assert got == exp


def test_pooled_sketch_elected_comment(tw):
    """The comment must come from the globally-first VALID record —
    f1's record 0 (on rank 1's shard), because f0's record 0 is
    shorter than k."""
    msh = capnp_msh.read_msh(str(tw["outdir"] / "pooled.msh"))
    ref = msh.references[0]
    assert "f1_r0 c0" in ref.comment, ref.comment[:120]
    # the elected record's >8 KiB comment crossed hosts untruncated
    assert len(ref.comment) > 9000
    assert ("x" * 9000) in ref.comment  # full header, " [...]" suffix


def test_dist_stripes_partition_and_concatenate(tw):
    single_lines = tw["single"]["dist"][0].splitlines()
    assert len(single_lines) == N_QRY * N_REFS
    r0 = _rank_out(tw, 0, "dist").splitlines()
    r1 = _rank_out(tw, 1, "dist").splitlines()
    # stripe 0 (rows 0-31) -> rank 0; stripe 1 (rows 32-39) -> rank 1
    assert r0 == single_lines[: 32 * N_REFS]
    assert r1 == single_lines[32 * N_REFS :]


def test_dist_table_header_once(tw):
    """`dist -t`: the #query header belongs to rank 0 only, so the
    concatenated per-rank outputs equal the single-process table."""
    single = tw["single"]["dist_t"][0]
    r0 = _rank_out(tw, 0, "dist_t")
    r1 = _rank_out(tw, 1, "dist_t")
    assert r0.startswith("#query\t")
    assert not r1.startswith("#query")
    assert r0 + r1 == single


def test_triangle_header_and_rows(tw):
    single_lines = tw["single"]["triangle"][0].splitlines()
    r0 = _rank_out(tw, 0, "triangle").splitlines()
    r1 = _rank_out(tw, 1, "triangle").splitlines()
    # header block (count + first name) only on rank 0
    assert r0[:2] == single_lines[:2]
    assert not r1 or not r1[0].startswith("\t")
    body = single_lines[2:]  # rows 1..N-1 in order
    # rank 0 owns row blocks 0 and 2: rows 1-31 and 64-69
    assert r0[2:] == body[:31] + body[63:]
    assert r1 == body[31:63]
    # Max p-value from rank 0 only, equal to the single-process one
    sp = [
        ln
        for ln in tw["single"]["triangle"][1].splitlines()
        if "Max p-value" in ln
    ]
    assert sp and sp[0] in _rank_err(tw, 0, "triangle")
    assert "Max p-value" not in _rank_err(tw, 1, "triangle")


def test_triangle_edge_rows_partition(tw):
    single_lines = tw["single"]["triangle_edge"][0].splitlines()
    r0 = _rank_out(tw, 0, "triangle_edge").splitlines()
    r1 = _rank_out(tw, 1, "triangle_edge").splitlines()
    assert sorted(r0 + r1) == sorted(single_lines)
    assert not (set(r0) & set(r1))


def test_screen_counts_sum_rank0_writes(tw):
    single = tw["single"]["screen"][0]
    r0 = _rank_out(tw, 0, "screen")
    r1 = _rank_out(tw, 1, "screen")
    assert sorted(r0.splitlines()) == sorted(single.splitlines())
    assert r1 == ""
    assert len(r0.splitlines()) > 0  # the DB must actually hit


def test_within_rank0_only(tw):
    """within is rank-0 gated: one copy of the full output."""
    assert _rank_out(tw, 0, "within") == tw["single"]["within"][0]
    assert _rank_out(tw, 1, "within") == ""
    assert len(_rank_out(tw, 0, "within").splitlines()) > 0


def test_taxscreen_counts_sum_rank0_writes(tw):
    """taxscreen shards the pool, sums counts, and rank 0 writes the
    report identical to the single-process run."""
    single = tw["single"]["taxscreen"][0]
    r0 = _rank_out(tw, 0, "taxscreen")
    r1 = _rank_out(tw, 1, "taxscreen")
    assert r0 == single
    assert r1 == ""
    assert "Escherichia coli" in r0
