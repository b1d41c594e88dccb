"""Building SketchSets from mixed inputs (.msh files or sequence files).

Equivalent of ``Sketch::initFromFiles`` / ``initFromReads``
(``src/mash/Sketch.cpp:96-253``): sketch files are parameter-checked,
adopted (first file, unless parameters are enforced) and loaded with
truncation; sequence files are sketched per-file (concatenated) or
per-record (individual mode) through the device engine.
"""

from __future__ import annotations

import sys
from typing import List, Optional

import numpy as np

from mash_tpu.core.engine import (
    SketchEngine,
    sketch_records_concat,
    sketch_records_exact,
)
from mash_tpu.core.params import SketchParams
from mash_tpu.core.sketch import (
    SketchRef,
    SketchSet,
    check_compatibility,
)
from mash_tpu.io import capnp_msh
from mash_tpu.io.fastx import read_fastx, read_fastx_multi

SUFFIX_SKETCH = ".msh"
SUFFIX_SKETCH_WINDOWED = ".msw"


def has_suffix(path: str, suffix: str) -> bool:
    return path.endswith(suffix)


def is_sketch_file(path: str, windowed: bool = False) -> bool:
    return has_suffix(
        path, SUFFIX_SKETCH_WINDOWED if windowed else SUFFIX_SKETCH
    )


def adopt_params_from_msh(params: SketchParams, path: str,
                          data: bytes | None = None) -> int:
    """Adopt header parameters from a sketch file; returns reference count.

    Mirrors ``Sketch::initParametersFromCapnp`` (``Sketch.cpp:255-324``):
    copies k, error, sketch size, window size, flags, seed, counts presence
    and alphabet into ``params``.
    """
    other, n = capnp_msh.read_msh_header(path, data=data)
    params.kmer_size = other.kmer_size
    params.error = other.error
    params.min_hashes_per_window = other.min_hashes_per_window
    params.window_size = other.window_size
    params.concatenated = other.concatenated
    params.noncanonical = other.noncanonical
    params.preserve_case = other.preserve_case
    params.counts = other.counts
    params.seed = other.seed
    params.set_alphabet(other.alphabet_string())
    return n


def needs_exact_streaming(params: SketchParams) -> bool:
    """Whether sketching must use the exact stream-order path.

    The batch bottom-s fold produces identical hash SETS for the default
    settings, but ``-m``/``-b``/``-c`` gating and stored multiplicities
    (``-M``) depend on stream order (``MinHashHeap.cpp:68-146``), so those
    modes run the device-hash + native-heap hybrid.
    """
    return (
        params.reads
        and (
            params.min_cov > 1
            or params.memory_bound > 0
            or params.target_cov > 0
        )
    ) or params.counts


def _sketch_concat(engine, records, file_name, is_stdin):
    if needs_exact_streaming(engine.params):
        return sketch_records_exact(engine, records, file_name, is_stdin)
    return sketch_records_concat(engine, records, file_name, is_stdin)


def _fast_batch_rows() -> int:
    import jax

    n_dev = len(jax.local_devices())
    rows = 32 if jax.default_backend() == "tpu" else 8
    if n_dev > 1 and rows % n_dev:
        rows = n_dev * ((rows + n_dev - 1) // n_dev)
    return rows


def _fast_ingest_ok(params: SketchParams, paths) -> bool:
    """Fast path preconditions: order-free fold + native parser + real files."""
    from mash_tpu.io.ingest import fast_ingest_eligible

    if needs_exact_streaming(params) or params.windowed:
        return False
    return fast_ingest_eligible(paths)


def _sketch_paths_fast(engine: SketchEngine, paths: List[str]):
    """Sketch one or more files into one state via the overlapped pipeline.

    For the plain nucleotide alphabet the host packs rows to 2-bit codes
    + validity bitmask (2.67x smaller transfers); other alphabets ship
    raw bytes.  Returns (state, metas).
    """
    from mash_tpu.io.ingest import IngestPipeline
    from mash_tpu.utils import tunnel

    # Connection-state hygiene at the file boundary (not a performance
    # mechanism — see utils/tunnel.py); all prior device state is
    # host-side here, so the reset is free.
    tunnel.new_transfer_epoch()

    p = engine.params
    pack = 0
    if p.alphabet_string() == "ACGT":
        pack = 2 if p.preserve_case else 1
    rows = _fast_batch_rows()
    pipe = IngestPipeline(
        paths, p.kmer_size, engine.chunk_len, rows, pack_mode=pack
    )
    try:
        state = engine.fold_batches(
            engine.empty_state(), pipe.batches(), rows,
            packed=bool(pack),
        )
    finally:
        pipe.close()
    return state, pipe.metas


def _sketch_file_fast(engine: SketchEngine, path: str):
    """Fast-path equivalent of ``sketch_records_concat`` for one file."""
    state, metas = _sketch_paths_fast(engine, [path])
    meta = metas[0]
    p = engine.params
    name, comment = meta.name_comment(is_stdin=False)
    if meta.count == 0:
        name, comment = path, ""
    total_len = meta.total_len
    if p.reads:
        if p.genome_size != 0:
            total_len = p.genome_size
        else:
            total_len = int(engine.estimate_set_size(state))
    if meta.count > 1:
        comment = "[%d seqs] %s [...]" % (meta.count, comment)
    ref = engine.state_to_ref(state, name, comment, total_len)
    return ref, state, meta.count, meta.skipped


def _fast_pool_metas(metas):
    """Pooled count/skipped + the local first-valid-record candidate.

    ``best`` is ``(first_ordinal, file_index)`` — the record's
    round-robin position key (the reference visits record ``r`` of file
    ``f`` at position ``(r, f)``, ``Sketch.cpp:1200-1270``) — or None
    when no file had a valid record.
    """
    count = sum(m.count for m in metas)
    skipped = any(m.skipped for m in metas)
    best = min(
        (
            (m.first_ordinal, i)
            for i, m in enumerate(metas)
            if m.first_ordinal >= 0
        ),
        default=None,
    )
    return count, skipped, best


def _sketch_reads_fast(engine: SketchEngine, files: List[str],
                       first_name: str):
    """Pooled reads-mode sketch over all files via the fast pipeline.

    The bottom-s fold is order-independent, so files stream sequentially
    instead of the reference's record round-robin
    (``Sketch.cpp:1200-1270``); the first-record naming is reconstructed
    in round-robin order from per-file metadata (see
    :func:`_fast_pool_metas`).
    """
    p = engine.params
    state, metas = _sketch_paths_fast(engine, files)
    count, skipped, best = _fast_pool_metas(metas)
    is_stdin = first_name == ""
    if best is None:
        name, comment = first_name, ""
    else:
        meta = metas[best[1]]
        name, comment = meta.name_comment(is_stdin=is_stdin)
        if not is_stdin:
            name = first_name
    if p.genome_size != 0:
        total_len = p.genome_size
    else:
        total_len = int(engine.estimate_set_size(state))
    if count > 1:
        comment = "[%d seqs] %s [...]" % (count, comment)
    ref = engine.state_to_ref(state, name, comment, total_len)
    return ref, state, count, skipped


def init_from_files(
    files: List[str],
    params: SketchParams,
    verbosity: int = 0,
    enforce_parameters: bool = False,
    contain: bool = False,
    engine: Optional[SketchEngine] = None,
) -> SketchSet:
    """Load/sketch every input into one SketchSet (``Sketch::initFromFiles``).

    Parameter adoption from the first ``.msh`` file mutates only the
    SketchSet's own parameter copy, never the caller's ``params`` — the
    reference's Sketch copies ``parametersNew`` into a member before
    adopting (``Sketch.cpp:107,124``), and commands explicitly inherit the
    fields they want afterwards.
    """
    params = params.copy()
    sketch_set = SketchSet(params)
    err = sys.stderr

    for i, path in enumerate(files):
        if is_sketch_file(path, params.windowed):
            # one read serves header inspection, parameter adoption and
            # the full load (multi-GB DB sketches must not be slurped
            # three times; the reference mmaps once, Sketch.cpp:922)
            with open(path, "rb") as f:
                data = f.read()
            other, _ = capnp_msh.read_msh_header(path, data=data)
            if i == 0 and not enforce_parameters:
                adopt_params_from_msh(params, path, data=data)
            if not check_compatibility(
                params, other, path, enforce_size=not contain
            ):
                continue
            msh = capnp_msh.read_msh(
                path, max_hashes=params.min_hashes_per_window,
                data=data,
            )
            del data
            for j, ref in enumerate(msh.references):
                positions = None
                if j < len(msh.position_hashes):
                    positions = msh.position_hashes[j]
                sketch_set.add(ref, positions)
        else:
            if engine is None:
                engine = SketchEngine(params)
            if verbosity > 0:
                if path == "-":
                    err.write("Sketching from stdin...\n")
                else:
                    err.write("Sketching %s...\n" % path)
            if params.concatenated:
                if _fast_ingest_ok(params, [path]):
                    ref, _state, count, skipped = _sketch_file_fast(
                        engine, path
                    )
                else:
                    records = read_fastx(path)
                    ref, _state, count, skipped = _sketch_concat(
                        engine, records, path, is_stdin=(path == "-")
                    )
                if ref.length == 0:
                    if skipped:
                        err.write(
                            "\nWARNING: All fasta records in %s were "
                            "shorter than the k-mer size (%d).\n"
                            % (path, params.kmer_size)
                        )
                    else:
                        err.write(
                            '\nERROR: Did not find fasta records in '
                            '"%s".\n' % path
                        )
                    raise SystemExit(1)
                sketch_set.add(ref)
            else:
                # individual mode: one sketch per record
                # (``sketchFileBySequence`` + ``sketchSequence``)
                any_record = False
                exact = needs_exact_streaming(params)
                if not params.windowed and not exact:
                    # batched device path: rows of same-bucket records
                    # per dispatch instead of one round trip each
                    from mash_tpu.core.engine import (
                        sketch_records_individual,
                    )

                    stats: dict = {}
                    for ref in sketch_records_individual(
                        engine, read_fastx(path), stats=stats
                    ):
                        any_record = True
                        sketch_set.add(ref)
                    if not any_record:
                        if stats.get("skipped"):
                            err.write(
                                "\nWARNING: All fasta records in %s "
                                "were shorter than the k-mer size "
                                "(%d).\n" % (path, params.kmer_size)
                            )
                        else:
                            err.write(
                                "\nERROR: reading %s.\n" % path
                            )
                        raise SystemExit(1)
                    continue
                for rec in read_fastx(path):
                    if len(rec.seq) < params.kmer_size:
                        continue
                    any_record = True
                    if params.windowed:
                        pos, hh = engine.windowed_positions(rec.seq)
                        sketch_set.add(
                            SketchRef(
                                name=rec.name,
                                comment=rec.comment or "",
                                length=len(rec.seq),
                            ),
                            np.stack(
                                [
                                    pos.astype(np.uint64),
                                    hh,
                                ],
                                axis=1,
                            )
                            if len(pos)
                            else None,
                        )
                    elif exact:
                        from mash_tpu.native import ExactHeap

                        h, v = engine.hash_bytes(rec.seq)
                        heap = ExactHeap(
                            params.sketch_size,
                            params.min_cov if params.reads else 1,
                            params.memory_bound,
                            params.use64,
                        )
                        heap.insert(h[v])
                        hh, cc = heap.extract()
                        sketch_set.add(
                            SketchRef(
                                name=rec.name,
                                comment=rec.comment or "",
                                length=len(rec.seq),
                                hashes=hh,
                                counts=cc,
                                counts_sorted=True,
                            )
                        )
                if not any_record:
                    err.write("\nERROR: reading %s.\n" % path)
                    raise SystemExit(1)
    return sketch_set


def init_from_reads(
    files: List[str],
    params: SketchParams,
    engine: Optional[SketchEngine] = None,
) -> SketchSet:
    """Reads mode: one pooled sketch over all files (``initFromReads``).

    Under a multi-process runtime the file list is sharded round-robin
    across hosts and the per-host bottom-s states merge exactly (the
    fold is associative); every host ends with the identical pooled
    sketch.
    """
    from mash_tpu.parallel import multihost as mh

    if engine is None:
        engine = SketchEngine(params)
    sketch_set = SketchSet(params)
    first_name = files[0] if files and files[0] != "-" else ""
    distributed = mh.process_count() > 1
    local_files = mh.shard_paths(files) if distributed else files
    if distributed and not needs_exact_streaming(params):
        s = params.sketch_size
        P, pid = mh.process_count(), mh.process_index()
        is_stdin = first_name == ""
        # local candidate for the globally-first valid record: key is
        # its round-robin position (record ordinal, *global* file
        # index); the shard is paths[pid::P], so local file i is
        # global file pid + i*P
        loc_key = (-1, 0)
        loc_name, loc_comment = "", ""
        if local_files and _fast_ingest_ok(params, local_files):
            state, metas = _sketch_paths_fast(engine, local_files)
            count, skipped, best = _fast_pool_metas(metas)
            if best is not None:
                m = metas[best[1]]
                loc_name, loc_comment = m.name_comment(
                    is_stdin=is_stdin
                )
                loc_key = (best[0], pid + best[1] * P)
        elif local_files:
            seen = {}

            def _gen():
                for rec, r, fi in read_fastx_multi(
                    local_files, round_robin=True, with_pos=True
                ):
                    if (
                        "best" not in seen
                        and len(rec.seq) >= params.kmer_size
                    ):
                        seen["best"] = (r, fi, rec)
                    yield rec

            _ref, state, count, skipped = _sketch_concat(
                engine, _gen(), first_name, is_stdin=is_stdin
            )
            if "best" in seen:
                r, fi, rec = seen["best"]
                if is_stdin:
                    loc_name = rec.name
                    loc_comment = rec.comment or ""
                else:
                    loc_comment = (
                        rec.name + " " + (rec.comment or "")
                    )
                loc_key = (r, pid + fi * P)
        else:
            state = engine.empty_state()
            count, skipped = 0, False
        # elect the globally-first record's header for naming
        # (reference: first record of the round-robin walk over ALL
        # files, Sketch.cpp:1200-1270 — not rank 0's local first)
        payload = mh.elect_min_with_payload(
            loc_key[0],
            loc_key[1],
            loc_name.encode("utf-8")
            + b"\x00"
            + loc_comment.encode("utf-8"),
        )
        if payload:
            nm, _, cm = payload.partition(b"\x00")
            g_name = nm.decode("utf-8", "replace")
            comment = cm.decode("utf-8", "replace")
        else:
            g_name, comment = "", ""
        state = mh.merge_states_across_hosts(state, s)
        count, _tl, skipped = mh.reduce_meta_across_hosts(
            count, 0, skipped
        )
        if params.genome_size != 0:
            total_len = params.genome_size
        else:
            total_len = int(engine.estimate_set_size(state))
        if count > 1:
            comment = "[%d seqs] %s [...]" % (count, comment)
        ref = engine.state_to_ref(
            state,
            g_name if is_stdin else first_name,
            comment,
            total_len,
        )
    elif _fast_ingest_ok(params, files):
        ref, state, count, skipped = _sketch_reads_fast(
            engine, files, first_name
        )
    else:
        records = read_fastx_multi(files, round_robin=True)
        ref, state, count, skipped = _sketch_concat(
            engine, records, first_name, is_stdin=(first_name == "")
        )
    if ref.length == 0:
        if skipped:
            sys.stderr.write(
                "\nWARNING: All fasta records in input files were shorter "
                "than the k-mer size (%d).\n" % params.kmer_size
            )
        else:
            sys.stderr.write(
                '\nERROR: Did not find fasta records in "input files".\n'
            )
        raise SystemExit(1)
    sketch_set.add(ref)
    if needs_exact_streaming(params):
        set_size = state.set_size()
        mult = state.multiplicity()
    else:
        set_size = engine.estimate_set_size(state)
        mult = engine.estimate_multiplicity(state)
    sys.stderr.write("Estimated genome size: %s\n" % _cpp_sci(set_size))
    sys.stderr.write("Estimated coverage:    %s\n" % _cpp_sci(mult))
    if params.target_cov > 0:
        sys.stderr.write("Reads used:            %d\n" % count)
    return sketch_set


def _cpp_sci(x: float) -> str:
    from mash_tpu.io.formatting import cpp_double

    return cpp_double(x)
