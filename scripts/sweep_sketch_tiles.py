"""On-chip (SR, C) tile sweep for the fused sketch kernel.

Measures raw kernel throughput (bases/s == windows/s) of
``hash_select_tiles`` across subrow-block / lane-width shapes, at the
production candidate budget m=16, to retune the defaults hardcoded in
``sketch_chunks_pallas`` (C=2048, SR=32).  Forced-fetch timing, same
honest convention as bench.py.  Run on the real chip:

    python scripts/sweep_sketch_tiles.py [total_mib]

CPU smoke (the axon hook re-pins JAX_PLATFORMS during import, so an
env var alone is not enough): MASH_SWEEP_CPU=1 forces the CPU backend.

The work per call is held ~constant (rows * C ~ 64 Mi windows) so grid
overheads stay comparable across shapes.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import os

    import jax

    if os.environ.get("MASH_SWEEP_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from mash_tpu.core.params import default_nucleotide_params
    from mash_tpu.ops.kmers import alphabet_bytes
    from mash_tpu.ops.pallas_sketch import _HALO, hash_select_tiles

    total = (
        int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ) * (1 << 20)
    params = default_nucleotide_params()
    alpha = tuple(alphabet_bytes(params.alphabet))
    m = 16
    rng = np.random.default_rng(0)

    print("platform:", jax.devices()[0].platform)
    results = []
    for C in (1024, 2048, 4096):
        for SR in (8, 16, 32, 64, 128):
            rows = max(SR, (total // C) // SR * SR)
            tiles = jax.numpy.asarray(
                rng.choice(
                    np.frombuffer(b"ACGT", np.uint8),
                    size=(rows, C + _HALO),
                )
            )

            def run():
                out = hash_select_tiles(
                    tiles,
                    k=params.kmer_size,
                    seed=params.seed,
                    use64=params.use64,
                    noncanonical=params.noncanonical,
                    alphabet=alpha,
                    m=m,
                    SR=SR,
                )
                jax.block_until_ready(out)
                return out

            try:
                t0 = time.perf_counter()
                run()  # compile + warm
                compile_s = time.perf_counter() - t0
                best = 0.0
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(4):
                        run()
                    dt = time.perf_counter() - t0
                    best = max(best, 4 * rows * C / dt)
                print(
                    "C=%4d SR=%3d rows=%6d  %8.1f Mbases/s  "
                    "(compile %.1fs)"
                    % (C, SR, rows, best / 1e6, compile_s),
                    flush=True,
                )
                results.append((best, C, SR))
            except Exception as e:
                print(
                    "C=%4d SR=%3d  FAILED: %s: %s"
                    % (C, SR, type(e).__name__, str(e)[:200]),
                    flush=True,
                )
    if results:
        best, C, SR = max(results)
        print(
            "BEST: C=%d SR=%d  %.1f Mbases/s" % (C, SR, best / 1e6)
        )


if __name__ == "__main__":
    main()
