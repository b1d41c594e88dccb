"""Worker process for the real 2-process multi-host test.

Launched (one per rank) by ``test_multihost_2proc.py`` with the
``MASH_TPU_COORDINATOR`` / ``MASH_TPU_NUM_PROCESSES`` /
``MASH_TPU_PROCESS_ID`` environment the CLI's multi-host launch
documents, on a CPU backend with 4 virtual devices per process.  Runs
the distributed CLI scenarios and captures each rank's stdout/stderr
per scenario so the parent can assert the cross-host assembly rules:

- ``sketch -r``: every host folds its file shard; rank 0 writes the
  pooled ``.msh`` (identical to a single-process run, including the
  elected globally-first-record naming).
- ``dist`` / ``triangle`` (streamed): each rank emits only the row
  stripes it owns; rank 0 alone emits the PHYLIP header block.
- ``screen``: per-host counts are summed; rank 0 alone writes the
  report.

Usage: python multihost_worker.py <config.json>
"""

import contextlib
import io
import json
import os
import sys

CFG = json.load(open(sys.argv[1]))
RANK = int(os.environ["MASH_TPU_PROCESS_ID"])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, CFG["repo"])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mash_tpu.parallel import multihost as mh  # noqa: E402

assert mh.maybe_init_distributed(), "distributed init failed"
assert mh.process_count() == 2, mh.process_count()
assert mh.process_index() == RANK

import mash_tpu.commands.dist as dist_mod  # noqa: E402
import mash_tpu.commands.triangle as tri_mod  # noqa: E402
from mash_tpu.__main__ import main  # noqa: E402

# force the streamed (stripe-owned) paths at test sizes
dist_mod.STREAM_MIN_CELLS = 0
tri_mod.STREAM_MIN_SKETCHES = 0

outdir = CFG["outdir"]


def run(scenario, args):
    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out):
        with contextlib.redirect_stderr(err):
            rc = main(args)
    assert rc in (0, None), (scenario, rc, err.getvalue())
    base = os.path.join(outdir, "rank%d_%s" % (RANK, scenario))
    with open(base + ".out", "w") as f:
        f.write(out.getvalue())
    with open(base + ".err", "w") as f:
        f.write(err.getvalue())


run(
    "sketch",
    [
        "sketch",
        "-r",
        "-I",
        "pooled",
        "-o",
        os.path.join(outdir, "pooled.msh"),
    ]
    + CFG["read_files"],
)
run("dist", ["dist", CFG["refs_msh"], CFG["qry_msh"]])
run("dist_t", ["dist", "-t", CFG["refs_msh"], CFG["qry_msh"]])
run("triangle", ["triangle", CFG["refs_msh"]])
run("triangle_edge", ["triangle", "-E", CFG["refs_msh"]])
run("screen", ["screen", CFG["screen_db"]] + CFG["read_files"])
run("within", ["within", "-e", "1", CFG["refs_msh"], CFG["qry_msh"]])
run(
    "taxscreen",
    ["taxscreen", "-t", CFG["tax_dir"], CFG["tax_db"]]
    + CFG["read_files"],
)

with open(os.path.join(outdir, "rank%d.done" % RANK), "w") as f:
    f.write("ok")
