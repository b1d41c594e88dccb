"""``mash taxscreen`` (reference ``CommandTaxScreen.cpp``).

Same streaming containment pipeline as ``screen`` (shared device kernels),
followed by per-hash LCA assignment and a Kraken-style clade report.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import jax.numpy as jnp

from mash_tpu.cli.command import Command, Option
from mash_tpu.commands.screen import stream_fold
from mash_tpu.core.loader import (
    SUFFIX_SKETCH,
    has_suffix,
    init_from_files,
)
from mash_tpu.core.params import ALPHABET_PROTEIN, SketchParams
from mash_tpu.io.fastx import read_fastx_multi
from mash_tpu.ops import screen_ops, sketch_ops
from mash_tpu.taxonomy import TaxCounts, TaxDB, rollup_counts


class CommandTaxScreen(Command):
    name = "taxscreen"
    summary = "Create Kraken-style taxonomic report based on mash screen."
    description = (
        "Create Kraken-style taxonomic report based on how well query "
        "sequences are contained within a pool of sequences. The queries "
        "must be formatted as a single Mash sketch file (.msh), created "
        "with the `mash sketch` command. The <pool> files can be contigs "
        "or reads, in fasta or fastq, gzipped or not, and \"-\" can be "
        "given for <pool> to read from standard input. The <pool> "
        "sequences are assumed to be nucleotides, and will be 6-frame "
        "translated if the <queries> are amino acids. The output fields "
        "are [total percent of hashes, number of contained hashes in the "
        "clade, number of contained hashes in the taxon, total number of "
        "hashes in the clade, total number of hashes in the taxon, rank, "
        "taxonomy ID, padded name]."
    )
    argument_string = "<queries>.msh <pool> [<pool>] ..."

    def __init__(self):
        super().__init__()
        self.use_option("help")
        self.use_option("threads")
        # NB: the reference declares -i/-v but never applies them in
        # taxscreen (CommandTaxScreen.cpp:73-74 reads the values and no
        # code uses them); they are accepted-but-inert here for parity.
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
        self.add_option(
            "mapping-file",
            Option(
                Option.STRING,
                "m",
                "",
                "Mapping file from reference name to taxonomy ID",
                "",
            ),
        )
        self.add_option(
            "taxonomy-dir",
            Option(
                Option.STRING,
                "t",
                "",
                "Directory containing NCBI taxonomy dump",
                ".",
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

        # '-' (stdin) may only be the first pool argument
        # (CommandTaxScreen.cpp:240-244)
        for f, arg in enumerate(self.arguments[1:]):
            if arg == "-" and f > 0:
                err.write("ERROR: '-' for stdin must be first query\n")
                raise SystemExit(1)

        taxonomy_dir = self.get_option("taxonomy-dir").argument
        mapping_file = self.get_option("mapping-file").argument

        params = SketchParams()
        sketch = init_from_files([self.arguments[0]], params)
        params.parallelism = int(
            self.get_option("threads").get_argument_as_number()
        )
        params.kmer_size = sketch.params.kmer_size
        params.noncanonical = sketch.params.noncanonical
        params.preserve_case = sketch.params.preserve_case
        params.seed = sketch.params.seed
        params.min_hashes_per_window = (
            sketch.params.min_hashes_per_window
        )
        params.set_alphabet(sketch.params.alphabet_string())
        trans = sketch.params.alphabet_string() == ALPHABET_PROTEIN

        names_dump = os.path.join(taxonomy_dir, "names.dmp")
        nodes_dump = os.path.join(taxonomy_dir, "nodes.dmp")
        if not os.path.exists(names_dump) or not os.path.exists(nodes_dump):
            err.write(
                "Could not find a file names.dmp or nodes.dmp in directory "
                "%s\n To download the required taxonomy files into the "
                "current directory, use the following commands:\n"
                "   wget ftp://ftp.ncbi.nih.gov/pub/taxonomy/"
                "taxdump.tar.gz\n   tar xvvf taxdump.tar.gz\n\n"
                % taxonomy_dir
            )
            raise SystemExit(1)
        err.write("Loading taxonomy files ...\n")
        taxdb = TaxDB(names_dump, nodes_dump)

        err.write("Reading mapping file ...\n")
        refs = sketch.references
        reference_tax_ids = [0] * len(refs)
        if mapping_file:
            ref_tax_map = {}
            with open(mapping_file) as f:
                for line in f:
                    parts = line.rstrip("\n").split(None, 1)
                    if len(parts) != 2:
                        continue
                    try:
                        tax_id = int(parts[0])
                    except ValueError:
                        # the reference's `mappingFile >> taxID` stream
                        # extraction fails and stops reading here
                        # (CommandTaxScreen.cpp:128); match that rather
                        # than crashing
                        break
                    # emplace keeps the FIRST occurrence of a name
                    # (CommandTaxScreen.cpp:132)
                    ref_tax_map.setdefault(parts[1], tax_id)
            for i, ref in enumerate(refs):
                reference_tax_ids[i] = ref_tax_map.get(ref.name, 0)
        for i, ref in enumerate(refs):
            if reference_tax_ids[i] == 0:
                # stream-extraction semantics: each "taxid" token reads
                # the next word as an int; a FAILED extraction zeroes
                # the value and ends the scan (C++11 operator>>,
                # CommandTaxScreen.cpp:152-156)
                words = ref.comment.split()
                j = 0
                while j < len(words):
                    if words[j] == "taxid":
                        try:
                            reference_tax_ids[i] = int(words[j + 1])
                        except (ValueError, IndexError):
                            reference_tax_ids[i] = 0
                            break
                        j += 2
                    else:
                        j += 1
            if reference_tax_ids[i] == 0:
                err.write(
                    "Could not find taxID for reference %s in comment "
                    "field or mapping file!\n" % ref.name
                )

        err.write("Loading %s...\n" % self.arguments[0])
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
        # streaming (same note as CommandScreen; not a performance
        # mechanism — see utils/tunnel.py)
        tunnel.new_transfer_epoch()
        fold, counts_dev, finalize_counts = (
            screen_ops.make_screen_fold_auto(params, db_hashes, s)
        )
        state = sketch_ops.empty_state(s)

        from mash_tpu.parallel import multihost as mh

        distributed = mh.process_count() > 1
        input_files = self.arguments[1:]
        if distributed:
            # same multi-host story as screen: shard the pool across
            # hosts; counts sum and the cardinality state merges
            # associatively, so the cross-host reduction is exact
            input_files = mh.shard_paths(input_files)
        from mash_tpu.commands.screen import stream_fold_fast
        from mash_tpu.io.ingest import fast_ingest_eligible

        use_fast = not trans and fast_ingest_eligible(input_files)
        if use_fast:
            counts_dev, state, saw_any = stream_fold_fast(
                fold, counts_dev, state, input_files, k, params
            )
        else:
            records = read_fastx_multi(input_files, round_robin=True)
            counts_dev, state, saw_any = stream_fold(
                fold, counts_dev, state, records, k, trans
            )
        if distributed:
            state = mh.merge_states_across_hosts(state, s)
            _c, _t, saw_any = mh.reduce_meta_across_hosts(
                0, 0, saw_any
            )
        if not saw_any:
            err.write("\nERROR: Did not find sequence records in inputs\n")
            raise SystemExit(1)

        set_size = int(
            sketch_ops.estimate_set_size(state, params.use64)
        )
        err.write(
            "   Estimated distinct%s k-mers in pool: %d\n"
            % (" (translated)" if trans else "", set_size)
        )
        if set_size == 0:
            err.write("WARNING: no valid k-mers in input.\n")

        err.write("Assigning LCA taxIDs to hashes ...\n")
        counts_host = finalize_counts(counts_dev)
        if distributed:
            counts_host = mh.sum_counts_across_hosts(counts_host)
            if mh.process_index() != 0:
                return 0  # rank 0 formats/writes the report
        min_cov = 1
        tax_ids_arr = np.array(reference_tax_ids, dtype=np.int64)

        counts: dict = {}
        for h_idx in range(len(db_hashes)):
            lca = 0
            for e in range(seg_starts[h_idx], seg_starts[h_idx + 1]):
                lca = taxdb.lca(int(tax_ids_arr[ref_ids[e]]), lca)
            tc = counts.setdefault(lca, TaxCounts())
            tc.tax_hash_count += 1
            if counts_host[h_idx] >= min_cov:
                tc.tax_count += 1

        total_count, total_hash_count = rollup_counts(taxdb, counts)

        err.write("Writing output...\n")
        taxdb.write_report(out, counts, total_count, total_hash_count)
        return 0
