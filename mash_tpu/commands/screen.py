"""``mash screen`` (reference ``CommandScreen.cpp``).

Streams mixture files read-packed into chunks (the reference's 1 MiB
``*``-separated blocks, ``CommandScreen.cpp:192-270``), hashes them on
device, counts DB membership with a sorted-array binary search +
scatter-add, and estimates mixture cardinality with the bottom-s fold.
Identity/p-value/median post-processing happens on host.
"""

from __future__ import annotations

import sys
from typing import Iterator, List

import numpy as np
import jax.numpy as jnp

from mash_tpu.cli.command import Command, Option
from mash_tpu.core import stats
from mash_tpu.core.loader import (
    SUFFIX_SKETCH,
    has_suffix,
    init_from_files,
)
from mash_tpu.core.params import ALPHABET_PROTEIN, SketchParams
from mash_tpu.io.fastx import read_fastx_multi
from mash_tpu.io.formatting import cpp_double
from mash_tpu.ops import screen_ops, sketch_ops

# Two pad buckets only (tiny inputs / full chunks): every bucket shape
# costs a full XLA compile of the screen fold on a cold cache, and a
# typical stream uses one size anyway — a mid-size tail chunk padding
# up to 1 MiB wastes far less than a third compile
# (compile-latency budget, round-2).
_BUCKETS = (1 << 14, 1 << 20)


def _packed_chunks(records, k: int, chunk_len: int) -> Iterator[bytes]:
    """Pack whole records into ~chunk_len blocks with 0x00 separators.

    No record spans two chunks and records shorter than k are dropped,
    mirroring ``CommandScreen.cpp:224-261``.
    """
    buf = bytearray()
    for rec in records:
        ln = len(rec.seq)
        if ln < k:
            continue
        if buf and len(buf) + ln + 1 > chunk_len:
            yield bytes(buf)
            buf.clear()
        if buf:
            buf.append(0)
        buf += rec.seq
    if buf:
        yield bytes(buf)


def stream_fold(fold, counts, state, records, k, trans, chunk_len=1 << 20):
    """Drive a screen fold over packed record chunks.

    Shared by ``screen`` and ``taxscreen``: packs records into
    0x00-separated ~1MiB chunks (the reference's '*'-separated blocks,
    ``CommandScreen.cpp:192-270``), optionally 6-frame translates them,
    and folds each through the device step.  Returns
    ``(counts, state, saw_any)``.

    ``saw_any`` reflects record PRESENCE, not k-validity: the reference
    counts every record (``CommandTaxScreen.cpp:331``) and only errors
    when none exist at all — a pool of records all shorter than k gets
    the no-valid-k-mers WARNING and a report, not an error.
    """
    seen = {"any": False}

    def _tracked(rs):
        for rec in rs:
            seen["any"] = True
            yield rec

    for raw in _packed_chunks(_tracked(records), k, chunk_len):
        if trans:
            arr = np.frombuffer(raw, dtype=np.uint8)
            arr = np.where(
                (arr > 96) & (arr < 123), arr - 32, arr
            ).astype(np.uint8)
            for frame in screen_ops.translate_frames(arr):
                if len(frame) < k:
                    continue
                padded = _pad_to_bucket(frame.tobytes(), chunk_len)
                counts, state = fold(
                    counts,
                    state,
                    jnp.asarray(np.frombuffer(padded, np.uint8)),
                )
        else:
            padded = _pad_to_bucket(raw, chunk_len)
            counts, state = fold(
                counts,
                state,
                jnp.asarray(np.frombuffer(padded, np.uint8)),
            )
    return counts, state, seen["any"]


# The fast-ingest pipeline applies to non-translated screens only; the
# reference's record-per-chunk packing and the pipeline's k-1-overlap
# rows count every k-mer window exactly once either way, so counts and
# cardinality are unchanged.  Size/availability gating is shared
# (``io.ingest.fast_ingest_eligible``).


def stream_fold_fast(fold, counts, state, files, k, params,
                     chunk_len=1 << 20, batch_rows=None):
    """Overlapped-ingest drive of a screen fold (raw or packed rows)."""
    import jax

    from mash_tpu.core.loader import _fast_batch_rows
    from mash_tpu.io.ingest import IngestPipeline
    from mash_tpu.ops.kmers import unpack_chunks

    if batch_rows is None:
        # one batching policy for sketch and screen (32 rows on TPU,
        # rounded to the local device count)
        batch_rows = _fast_batch_rows()
    pack = 0
    if params.alphabet_string() == "ACGT":
        pack = 2 if params.preserve_case else 1
    pipe = IngestPipeline(
        files, k, chunk_len, batch_rows, pack_mode=pack
    )
    unpack = (
        jax.jit(lambda b: unpack_chunks(b, chunk_len)) if pack else None
    )
    # One dispatch per [batch_rows, L] batch where the fold supports it
    # (plain and big-DB tiers); per-row only as a fallback (the mesh-
    # sharded fold keeps its own per-chunk collective layout).
    fold_rows = getattr(fold, "fold_rows", None)
    try:
        for batch in pipe.batches():
            dev = jax.device_put(batch)
            if unpack is not None:
                dev = unpack(dev)
            if fold_rows is not None:
                counts, state = fold_rows(counts, state, dev)
            else:
                for r in range(batch_rows):
                    counts, state = fold(counts, state, dev[r])
    finally:
        pipe.close()
    # record presence, not k-validity: a skipped (too-short) record
    # still counts as "saw input" (see stream_fold)
    saw_any = any(m.count > 0 or m.skipped for m in pipe.metas)
    return counts, state, saw_any


def _pad_to_bucket(chunk: bytes, chunk_len: int) -> bytes:
    for b in _BUCKETS:
        if len(chunk) <= b:
            return chunk + b"\x00" * (b - len(chunk))
    m = ((len(chunk) + chunk_len - 1) // chunk_len) * chunk_len
    return chunk + b"\x00" * (m - len(chunk))


class CommandScreen(Command):
    name = "screen"
    summary = (
        "Determine whether query sequences are within a larger mixture of "
        "sequences."
    )
    description = (
        "Determine how well query sequences are contained within a "
        "mixture of sequences. The queries must be formatted as a single "
        "Mash sketch file (.msh), created with the `mash sketch` command. "
        "The <mixture> files can be contigs or reads, in fasta or fastq, "
        'gzipped or not, and "-" can be given for <mixture> to read from '
        "standard input. The <mixture> sequences are assumed to be "
        "nucleotides, and will be 6-frame translated if the <queries> are "
        "amino acids. The output fields are [identity, shared-hashes, "
        "median-multiplicity, p-value, query-ID, query-comment], where "
        "median-multiplicity is computed for shared hashes, based on the "
        "number of observations of those hashes within the mixture."
    )
    argument_string = "<queries>.msh <mixture> [<mixture>] ..."

    def __init__(self):
        super().__init__()
        self.use_option("help")
        self.use_option("threads")
        self.add_option(
            "winning!",
            Option(
                Option.BOOLEAN,
                "w",
                "",
                "Winner-takes-all strategy for identity estimates. After "
                "counting hashes for each query, hashes that appear in "
                "multiple queries will be removed from all except the one "
                "with the best identity (ties broken by larger query), and "
                "other identities will be reduced. This removes output "
                "redundancy, providing a rough compositional outline.",
                "",
            ),
        )
        self.add_option(
            "identity",
            Option(
                Option.NUMBER,
                "i",
                "Output",
                "Minimum identity to report. Inclusive unless set to zero, "
                "in which case only identities greater than zero (i.e. "
                "with at least one shared hash) will be reported. Set to "
                "-1 to output everything.",
                "0",
                -1.0,
                1.0,
            ),
        )
        self.add_option(
            "pvalue",
            Option(
                Option.NUMBER,
                "v",
                "Output",
                "Maximum p-value to report.",
                "1.0",
                0.0,
                1.0,
            ),
        )

    def run(self) -> int:
        if len(self.arguments) < 2 or self.get_option("help").active:
            self.print_help()
            return 0

        err = sys.stderr
        out = sys.stdout
        if not has_suffix(self.arguments[0], SUFFIX_SKETCH):
            err.write(
                "ERROR: %s does not look like a sketch (.msh)\n"
                % self.arguments[0]
            )
            raise SystemExit(1)
        # '-' (stdin) may only be the first mixture argument
        # (CommandScreen.cpp:240-244)
        for f, arg in enumerate(self.arguments[1:]):
            if arg == "-" and f > 0:
                err.write("ERROR: '-' for stdin must be first query\n")
                raise SystemExit(1)

        pvalue_max = self.get_option("pvalue").get_argument_as_number()
        identity_min = self.get_option("identity").get_argument_as_number()

        params = SketchParams()
        sketch = init_from_files([self.arguments[0]], params)
        params.parallelism = int(
            self.get_option("threads").get_argument_as_number()
        )
        # stream-hashing parameters come from the DB sketch
        # (CommandScreen.cpp:81-91)
        params.kmer_size = sketch.params.kmer_size
        params.noncanonical = sketch.params.noncanonical
        params.preserve_case = sketch.params.preserve_case
        params.seed = sketch.params.seed
        params.min_hashes_per_window = (
            sketch.params.min_hashes_per_window
        )
        alphabet = sketch.params.alphabet_string()
        params.set_alphabet(alphabet)
        trans = alphabet == ALPHABET_PROTEIN

        err.write("Loading %s...\n" % self.arguments[0])
        refs = sketch.references
        db_hashes, seg_starts, ref_ids = screen_ops.build_db_table(
            [r.hashes for r in refs]
        )
        err.write("   %d distinct hashes.\n" % len(db_hashes))

        n_inputs = len(self.arguments) - 1
        err.write(
            "%s%s...\n"
            % (
                "Translating from " if trans else "Streaming from ",
                self.arguments[1]
                if n_inputs == 1
                else "%d inputs" % n_inputs,
            )
        )

        s = params.min_hashes_per_window
        k = params.kmer_size
        from mash_tpu.utils import tunnel

        # Connection-state hygiene before the DB upload + read
        # streaming (not a performance mechanism — see
        # utils/tunnel.py); everything device-resident is created
        # below.
        tunnel.new_transfer_epoch()
        fold, counts, finalize_counts = screen_ops.make_screen_fold_auto(
            params, db_hashes, s
        )
        state = sketch_ops.empty_state(s)

        from mash_tpu.parallel import multihost as mh

        distributed = mh.process_count() > 1
        input_files = self.arguments[1:]
        if distributed:
            # shard the mixture across hosts; counts are plain per-hash
            # totals and the cardinality state merges associatively, so
            # cross-host reduction at the end is exact
            input_files = mh.shard_paths(input_files)

        from mash_tpu.io.ingest import fast_ingest_eligible

        use_fast = not trans and fast_ingest_eligible(input_files)
        if use_fast:
            counts, state, saw_any = stream_fold_fast(
                fold, counts, state, input_files, k, params
            )
        else:
            records = read_fastx_multi(input_files, round_robin=True)
            # record length gate: translated mode packs by nucleotide
            # length >= k, matching l >= kmerSize in the reference (the
            # translated k-mer needs 3k bases, but the gate is on bases,
            # as there).
            counts, state, saw_any = stream_fold(
                fold, counts, state, records, k, trans
            )

        if distributed:
            state = mh.merge_states_across_hosts(state, s)
            _c, _t, saw_any = mh.reduce_meta_across_hosts(
                0, 0, saw_any
            )

        if not saw_any:
            err.write("\nERROR: Did not find sequence records in inputs\n")
            raise SystemExit(1)

        set_size = int(sketch_ops.estimate_set_size(state, params.use64))
        err.write(
            "   Estimated distinct%s k-mers in mixture: %d\n"
            % (" (translated)" if trans else "", set_size)
        )
        if set_size == 0:
            err.write("WARNING: no valid k-mers in input.\n")

        err.write("Summing shared...\n")
        counts_host = finalize_counts(counts)
        if distributed:
            counts_host = mh.sum_counts_across_hosts(counts_host)
            if mh.process_index() != 0:
                return 0  # rank 0 formats/writes the report
        min_cov = 1
        shared, depths = screen_ops.tally_shared(
            counts_host, seg_starts, ref_ids, len(refs), min_cov
        )

        kmer_space = sketch.params.kmer_space
        if self.get_option("winning!").active:
            err.write("Reallocating to winners...\n")
            scores = np.array(
                [
                    stats.screen_identity(
                        int(shared[i]), len(refs[i].hashes), k
                    )
                    for i in range(len(refs))
                ]
            )
            lengths = np.array([r.length for r in refs], dtype=np.int64)
            shared, depths = screen_ops.winner_takes_all(
                counts_host, seg_starts, ref_ids, scores, lengths, min_cov
            )

        err.write("Computing coverage medians...\n")
        depths = [np.sort(d) for d in depths]

        err.write("Writing output...\n")
        for i, ref in enumerate(refs):
            sh = int(shared[i])
            if sh == 0 and identity_min >= 0.0:
                continue
            identity = stats.screen_identity(sh, len(ref.hashes), k)
            if identity < identity_min:
                continue
            pvalue = stats.pvalue_within(
                sh, set_size, kmer_space, len(ref.hashes)
            )
            if pvalue > pvalue_max:
                continue
            median = int(depths[i][sh // 2]) if sh > 0 else 0
            out.write(
                "%s\t%d/%d\t%d\t%s\t%s\t%s\n"
                % (
                    cpp_double(identity),
                    sh,
                    len(ref.hashes),
                    median,
                    cpp_double(pvalue),
                    ref.name,
                    ref.comment,
                )
            )
        return 0
