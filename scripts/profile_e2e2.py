"""Second round: isolate the producer-thread/device_put interference."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from mash_tpu.core.engine import SketchEngine
from mash_tpu.core.params import default_nucleotide_params
from mash_tpu.io.ingest import IngestPipeline


def make_pipe(path, engine, rows, depth=4):
    p = engine.params
    return IngestPipeline(
        [path], p.kmer_size, engine.chunk_len, rows,
        pack_mode=1, depth=depth,
    )


def timed(name, f, total, reps=2):
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        dt = time.perf_counter() - t0
        print("  %-14s %6.2fs  %8.1f Mbases/s"
              % (name, dt, total / dt / 1e6), flush=True)


def main():
    import bench

    path, total = bench._e2e_fasta()
    engine = SketchEngine(default_nucleotide_params())
    rows = 32
    dev = jax.devices()[0]

    W = engine.chunk_len // 4 + engine.chunk_len // 8
    warm = np.zeros((rows, W), dtype=np.uint8)
    fold = engine._fold_batch_fn(rows, packed=True)
    st = fold(engine.empty_state(), jax.device_put(warm, dev))
    np.asarray(st[0])
    print("ready", flush=True)

    # F: drain fully, then put back-to-back (no concurrent producer)
    def f_two_phase():
        pipe = make_pipe(path, engine, rows, depth=64)
        host = list(pipe.batches())
        t1 = time.perf_counter()
        ds = [jax.device_put(b, dev) for b in host]
        for d in ds:
            d.block_until_ready()
        print("    (put phase alone: %.3fs)" % (time.perf_counter() - t1),
              flush=True)

    timed("two-phase", f_two_phase, total)

    # G: device_put inside the consumer loop but measure put time only
    def f_put_timeline():
        pipe = make_pipe(path, engine, rows)
        tput = 0.0
        ds = []
        for b in pipe.batches():
            t1 = time.perf_counter()
            ds.append(jax.device_put(b, dev))
            tput += time.perf_counter() - t1
        for d in ds:
            d.block_until_ready()
        print("    (sum of put calls: %.3fs over %d puts)" % (tput, len(ds)),
              flush=True)

    timed("put-timeline", f_put_timeline, total)

    # H: lowered GIL switch interval
    def f_gil():
        old = sys.getswitchinterval()
        sys.setswitchinterval(0.0005)
        try:
            pipe = make_pipe(path, engine, rows)
            ds = [jax.device_put(b, dev) for b in pipe.batches()]
            for d in ds:
                d.block_until_ready()
        finally:
            sys.setswitchinterval(old)

    timed("gil-0.5ms", f_gil, total)


if __name__ == "__main__":
    main()
