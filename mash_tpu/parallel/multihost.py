"""Multi-host (multi-process) execution over DCN + ICI.

The reference is strictly single-node (pthreads only; SURVEY §5), so
this layer is the TPU-native extension: N hosts, each driving its local
devices, coordinated by ``jax.distributed``.  The design keeps all
cross-host communication to tiny, associative merges:

- **sketch** (reads mode / pooled): input files are sharded across
  hosts (``shard_paths``); each host folds its shard through its local
  device mesh; the per-host bottom-s states (s * 12 bytes) are
  all-gathered and folded — exact, because the bottom-s fold is
  associative and commutative.
- **screen**: same input sharding; per-host DB-occurrence count vectors
  are summed across hosts (counts are plain per-hash totals); the
  cardinality state merges like sketch states.
- **triangle / dist**: row stripes are statically owned round-robin by
  process index (``owns_stripe``); each host computes and emits only
  its stripes, so output sharding needs no communication at all
  (concatenate per-host outputs in stripe order).

Launch: run the same CLI on every host with

    MASH_TPU_COORDINATOR=host0:8476
    MASH_TPU_NUM_PROCESSES=N
    MASH_TPU_PROCESS_ID=<0..N-1>

(or under standard TPU-pod orchestration where
``jax.distributed.initialize()`` auto-detects).  Single-process runs
are the degenerate case of every helper here, which is how the driver
dry-runs this code path on a virtual mesh.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np


def maybe_init_distributed() -> bool:
    """Initialize ``jax.distributed`` from the environment (idempotent).

    Returns True if a multi-process runtime was (or already is)
    initialized; False for plain single-process runs.
    """
    import jax

    coord = os.environ.get("MASH_TPU_COORDINATOR")
    if not coord:
        # Standard TPU-pod orchestration (no MASH_TPU_* vars): the pod
        # runtime advertises its worker set; let jax auto-detect.  Only
        # attempted when multiple workers are actually advertised —
        # plain single-host runs must not pay an init attempt.  A
        # failure here must NOT silently degrade N hosts into N
        # independent full runs racing on the output, so it propagates.
        hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if "," not in hosts:
            return False
        try:
            jax.distributed.initialize()
        except RuntimeError:
            if jax.process_count() <= 1:  # not already-initialized
                raise
        return True
    n_s = os.environ.get("MASH_TPU_NUM_PROCESSES")
    pid_s = os.environ.get("MASH_TPU_PROCESS_ID")
    if n_s is None or pid_s is None:
        raise SystemExit(
            "ERROR: MASH_TPU_COORDINATOR is set but %s is missing "
            "(a multi-process launch needs MASH_TPU_COORDINATOR, "
            "MASH_TPU_NUM_PROCESSES and MASH_TPU_PROCESS_ID on every "
            "host)."
            % (
                "MASH_TPU_NUM_PROCESSES"
                if n_s is None
                else "MASH_TPU_PROCESS_ID"
            )
        )
    n = int(n_s)
    pid = int(pid_s)
    if not 0 <= pid < n:
        raise SystemExit(
            "ERROR: MASH_TPU_PROCESS_ID %d outside [0, %d)." % (pid, n)
        )
    try:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=n, process_id=pid
        )
    except RuntimeError:
        # tolerate ONLY double-initialization; a real init failure
        # (bad coordinator, port clash) must not silently degrade N
        # hosts into N independent full runs racing on the output
        if jax.process_count() != n:
            raise
    return True


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def shard_paths(paths: Sequence[str]) -> List[str]:
    """This host's round-robin shard of the input files."""
    return list(paths)[process_index() :: process_count()]


def merge_states_across_hosts(state, s: int):
    """Exact cross-host merge of per-host bottom-s sketch states.

    All-gathers the tiny per-host states and folds them locally; every
    host ends with the identical global state (deterministic: the fold
    is order-free).
    """
    if process_count() == 1:
        return state
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from mash_tpu.ops import sketch_ops

    gh = multihost_utils.process_allgather(np.asarray(state[0]))
    gc = multihost_utils.process_allgather(np.asarray(state[1]))
    return sketch_ops.tree_merge(
        jnp.asarray(gh), jnp.asarray(gc), s=s
    )


def sum_counts_across_hosts(counts: np.ndarray) -> np.ndarray:
    """Sum per-host screen count vectors (host numpy in, numpy out).

    The cross-host sum can exceed the per-host dtype even though each
    shard fits, so it runs in 64 bits and SATURATES at the dtype max
    rather than wrapping (the reference's uint32 atomics would wrap,
    but it has no multi-node mode to compare against —
    ``CommandScreen.h:106``).
    """
    if process_count() == 1:
        return counts
    from jax.experimental import multihost_utils

    g = multihost_utils.process_allgather(np.asarray(counts))
    tot = np.asarray(g).astype(np.uint64).sum(axis=0)
    lim = np.uint64(np.iinfo(counts.dtype).max)
    return np.minimum(tot, lim).astype(counts.dtype)


def reduce_meta_across_hosts(count: int, total_len: int,
                             skipped: bool) -> tuple:
    """Sum record-count metadata for pooled (reads-mode) sketching."""
    if process_count() == 1:
        return count, total_len, skipped
    from jax.experimental import multihost_utils

    g = multihost_utils.process_allgather(
        np.array([count, total_len, int(skipped)], dtype=np.int64)
    )
    tot = g.sum(axis=0)
    return int(tot[0]), int(tot[1]), bool(tot[2])


def local_device_counts() -> np.ndarray:
    """Every process's local device count (allgathered).

    Stripe geometry (``distance.stream_pair_stripes`` ``row_block``)
    must be identical on every host, so it is derived from ALL hosts'
    device counts, not the local one — heterogeneous slices would
    otherwise disagree on stripe boundaries and ownership.
    """
    import jax

    n = len(jax.local_devices())
    if process_count() == 1:
        return np.array([n], dtype=np.int64)
    from jax.experimental import multihost_utils

    g = multihost_utils.process_allgather(
        np.array([n], dtype=np.int64)
    )
    return np.asarray(g).reshape(-1)


def elect_min_with_payload(key0: int, key1: int,
                           payload: bytes) -> bytes:
    """Global argmin over ``(key0, key1)`` with a bytes payload.

    Every host contributes a candidate (``key0 < 0`` means "no
    candidate"); all hosts return the payload of the lexicographically
    smallest key pair, ties broken by process index.  Used to elect the
    globally-first valid input record for reads-mode naming (the
    reference names the pooled sketch after the first record of the
    round-robin walk over *all* files, ``Sketch.cpp:1200-1270``).
    Returns ``b""`` when no host has a candidate.
    """
    if process_count() == 1:
        return payload if key0 >= 0 else b""
    from jax.experimental import multihost_utils

    INF = np.int64(2**62)
    keys = np.array(
        [
            INF if key0 < 0 else np.int64(key0),
            np.int64(key1),
            np.int64(len(payload)),
        ],
        dtype=np.int64,
    )
    gk = multihost_utils.process_allgather(keys)
    gk = np.asarray(gk).reshape(-1, 3)
    # size the payload buffer to the global maximum so nothing is
    # truncated (headers can exceed any fixed cap; the native parser
    # keeps them unbounded for the same parity reason)
    max_len = max(int(gk[:, 2].max()), 1)
    buf = np.zeros(max_len, dtype=np.uint8)
    pb = np.frombuffer(payload, dtype=np.uint8)
    buf[: len(pb)] = pb
    gp = multihost_utils.process_allgather(buf)
    gp = np.asarray(gp).reshape(-1, max_len)
    w = int(
        np.lexsort(
            (np.arange(gk.shape[0]), gk[:, 1], gk[:, 0])
        )[0]
    )
    if gk[w, 0] >= INF:
        return b""
    return gp[w, : int(gk[w, 2])].tobytes()


def owns_stripe(i0: int, row_block: int) -> bool:
    """Static round-robin stripe ownership for triangle/dist output."""
    return (i0 // row_block) % process_count() == process_index()


def max_across_hosts(x: float) -> float:
    """Global max of a per-host scalar (e.g. triangle's peak p-value)."""
    if process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    g = multihost_utils.process_allgather(
        np.array([x], dtype=np.float64)
    )
    return float(g.max())
