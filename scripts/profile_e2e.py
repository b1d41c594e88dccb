"""Profile the end-to-end sketch pipeline: parse vs transfer vs fold.

Splits the e2e CLI sketch time (VERDICT r2 task 1) into stages by
running the same 256 Mbase ingest under different upload/fold
strategies on the real chip:

  A. drain      — parse+pack only (no device ops)
  B. upload     — parse+pack + back-to-back async device_puts (no fold)
  C. current    — put+fold interleaved, one pair per batch (fold_batches)
  D. prefetch N — puts issued eagerly, folds lag N batches behind
  E. burst N    — alternate a burst of N puts with N folds

Usage:  python scripts/profile_e2e.py [--small]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from mash_tpu.core.engine import SketchEngine
from mash_tpu.core.params import default_nucleotide_params
from mash_tpu.io.ingest import IngestPipeline


def make_pipe(path, engine, rows):
    p = engine.params
    return IngestPipeline(
        [path], p.kmer_size, engine.chunk_len, rows, pack_mode=1
    )


def run(name, fn, path, engine, rows, total, reps=2):
    best = 0.0
    for _ in range(reps):
        pipe = make_pipe(path, engine, rows)
        t0 = time.perf_counter()
        fn(pipe, engine, rows)
        dt = time.perf_counter() - t0
        best = max(best, total / dt)
        print(
            "  %-12s %6.2fs  %8.1f Mbases/s" % (name, dt, total / dt / 1e6),
            flush=True,
        )
    return best


def strat_drain(pipe, engine, rows):
    n = 0
    for b in pipe.batches():
        n += b.shape[0]
    return n


def strat_upload(pipe, engine, rows):
    devs = [jax.device_put(b, engine.device) for b in pipe.batches()]
    for d in devs:
        d.block_until_ready()
    return len(devs)


def strat_current(pipe, engine, rows):
    state = engine.fold_batches(
        engine.empty_state(), pipe.batches(), rows, packed=True
    )
    np.asarray(state[0])


def strat_prefetch(depth):
    def f(pipe, engine, rows):
        from collections import deque

        fold = engine._fold_batch_fn(rows, packed=True)
        state = engine.empty_state()
        q = deque()
        for b in pipe.batches():
            q.append(jax.device_put(b, engine.device))
            if len(q) > depth:
                state = fold(state, q.popleft())
        while q:
            state = fold(state, q.popleft())
        np.asarray(state[0])

    return f


def strat_burst(n):
    def f(pipe, engine, rows):
        fold = engine._fold_batch_fn(rows, packed=True)
        state = engine.empty_state()
        group = []
        for b in pipe.batches():
            group.append(jax.device_put(b, engine.device))
            if len(group) == n:
                for d in group:
                    state = fold(state, d)
                group = []
        for d in group:
            state = fold(state, d)
        np.asarray(state[0])

    return f


def main():
    small = "--small" in sys.argv
    sys.path.insert(0, "/root/repo")
    import bench

    if small:
        path, total = bench._e2e_fasta(n_records=64)
    else:
        path, total = bench._e2e_fasta()
    params = default_nucleotide_params()
    engine = SketchEngine(params)
    rows = 32 if jax.default_backend() == "tpu" else 8
    print("platform=%s rows=%d total=%d" % (
        jax.default_backend(), rows, total), flush=True)

    # warm the fold compile out of band
    W = engine.chunk_len // 4 + engine.chunk_len // 8
    warm = np.zeros((rows, W), dtype=np.uint8)
    fold = engine._fold_batch_fn(rows, packed=True)
    st = fold(engine.empty_state(), jax.device_put(warm, engine.device))
    np.asarray(st[0])
    print("fold compiled", flush=True)

    res = {}
    res["drain"] = run("drain", strat_drain, path, engine, rows, total)
    res["upload"] = run("upload", strat_upload, path, engine, rows, total)
    res["current"] = run("current", strat_current, path, engine, rows, total)
    res["prefetch4"] = run(
        "prefetch4", strat_prefetch(4), path, engine, rows, total
    )
    res["prefetch16"] = run(
        "prefetch16", strat_prefetch(16), path, engine, rows, total
    )
    res["burst4"] = run("burst4", strat_burst(4), path, engine, rows, total)
    res["burst8"] = run("burst8", strat_burst(8), path, engine, rows, total)
    print({k: round(v / 1e6, 1) for k, v in res.items()})


if __name__ == "__main__":
    main()
