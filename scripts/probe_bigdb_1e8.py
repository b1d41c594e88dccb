"""Diagnose the H=1e8 big-DB tier's HBM footprint on the real chip.

bench.py's bigdb group hit RESOURCE_EXHAUSTED at H=1e8 (2026-08-19);
this probe reproduces it stepwise with memory_stats() printed between
stages so the failing allocation is attributable.  Knobs:

    python scripts/probe_bigdb_1e8.py [H] [K_cap]

K_cap overrides the counter's batch size (smaller batches -> smaller
slab sort transients) to find the largest K that fits at H=1e8.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def stats(tag):
    import jax

    d = jax.devices()[0]
    ms = d.memory_stats() or {}
    inuse = ms.get("bytes_in_use", 0) / (1 << 30)
    limit = ms.get("bytes_limit", 0) / (1 << 30)
    peak = ms.get("peak_bytes_in_use", 0) / (1 << 30)
    print(
        "[%s] in_use=%.2fGiB peak=%.2fGiB limit=%.2fGiB"
        % (tag, inuse, peak, limit),
        flush=True,
    )


def force(*arrays):
    """Honest completion: fetch a scalar that data-depends on every
    array (block_until_ready is an async ACK on the dev tunnel)."""
    import jax.numpy as jnp

    flat = jnp.concatenate(
        [jnp.asarray(a).ravel()[:1].astype(jnp.float32) for a in arrays]
    )
    return float(jnp.sum(flat))


def main():
    import jax
    import jax.numpy as jnp

    from mash_tpu.core.params import default_nucleotide_params
    from mash_tpu.ops.screen_ops import BigDBCounter

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    k_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    print("platform:", jax.devices()[0].platform, flush=True)
    stats("init")

    rng = np.random.default_rng(2)
    db = np.unique(
        rng.integers(0, 2**63, size=H, dtype=np.int64).astype(
            np.uint64
        )
    )
    print("db ready H=%d" % len(db), flush=True)
    t0 = time.perf_counter()
    counter = BigDBCounter(default_nucleotide_params(), db, s=1000)
    if k_cap:
        counter.K = min(counter.K, k_cap)
        counter.k_eff = counter.K
    print(
        "counter K=%d wblk=%d rw=%d upload %.1fs"
        % (counter.K, counter.wblk, counter.rw, time.perf_counter() - t0),
        flush=True,
    )
    stats("db uploaded")

    n = 1 << 20
    ndist = 16
    hs = rng.integers(0, 2**63, size=(ndist, n), dtype=np.int64).astype(
        np.uint64
    )
    for j in range(ndist):
        hs[j, : n // 4] = db[rng.choice(len(db), size=n // 4)]
    hds = [jnp.asarray(hs[j]) for j in range(ndist)]
    vd = jnp.asarray(np.ones(n, dtype=bool))
    force(*hds)
    stats("chunks uploaded")

    t0 = time.perf_counter()
    counter.add(hds[0], vd)
    counter.flush()
    force(counter.counts)
    print("first flush (compile+exec, forced) %.1fs" % (time.perf_counter() - t0),
          flush=True)
    stats("after first flush")

    t0 = time.perf_counter()
    nch = counter.K
    for i in range(nch):
        counter.add(hds[i % ndist], vd)
    counter.flush()
    force(counter.counts)
    dt = time.perf_counter() - t0
    print(
        "steady (forced): %.1fM hashes/s  fallbacks=%d"
        % (nch * n / dt / 1e6, counter.fallback_count()),
        flush=True,
    )
    stats("after steady batch")


if __name__ == "__main__":
    main()
