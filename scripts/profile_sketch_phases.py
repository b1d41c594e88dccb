"""Phase attribution for the fused sketch kernel (r5 experiment log).

The round-4 roofline (docs/tpu-design.md) put the kernel at ~45-60% of
its analytic VPU speed-of-light and blamed the m=16 iterative
min-extraction.  This experiment measures that claim directly instead
of arguing from op counts:

- sweep the candidate budget m in {1, 2, 4, 8, 16, 24, 32}: cost(m) is
  ~affine (a + b*m), so the slope b is the marginal cost of ONE
  extraction round and the intercept a is the hash+pack+canonical
  pipeline;
- run the same sweep with ``noncanonical=True`` to attribute the
  canonical strand chain (revcomp pack + memcmp select);
- everything forced-fetch timed (bench.py convention: block_until_ready
  is an async ACK on the dev tunnel).

Run on the real chip:  python scripts/profile_sketch_phases.py [mib]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def force(*arrays):
    import jax.numpy as jnp

    flat = jnp.concatenate(
        [jnp.asarray(a).ravel()[:1].astype(jnp.float32) for a in arrays]
    )
    return float(jnp.sum(flat))


def main():
    import jax

    from mash_tpu.core.params import default_nucleotide_params
    from mash_tpu.ops.kmers import alphabet_bytes
    from mash_tpu.ops.pallas_sketch import _HALO, hash_select_tiles

    total = (int(sys.argv[1]) if len(sys.argv) > 1 else 64) * (1 << 20)
    params = default_nucleotide_params()
    alpha = tuple(alphabet_bytes(params.alphabet))
    rng = np.random.default_rng(0)
    C, SR = 2048, 32  # production tile shape
    rows = (total // C) // SR * SR
    tiles = jax.numpy.asarray(
        rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(rows, C + _HALO))
    )
    force(tiles)
    print("platform:", jax.devices()[0].platform, "rows:", rows, flush=True)

    def timed(m, noncanonical, iters=4):
        def run():
            return hash_select_tiles(
                tiles, k=params.kmer_size, seed=params.seed,
                use64=params.use64, noncanonical=noncanonical,
                alphabet=alpha, m=m, SR=SR,
            )

        force(run()[0])  # compile + absorb loads
        best = 1e30
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [run() for _ in range(iters)]
            force(*[o[0] for o in outs])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    for noncanon in (False, True):
        prev = None
        for m in (1, 2, 4, 8, 16, 24, 32):
            dt = timed(m, noncanon)
            rate = rows * C / dt / 1e9
            slope = "" if prev is None else (
                "  marginal %.3f ms/round" % ((dt - prev[1]) * 1e3
                                              / (m - prev[0]))
            )
            print(
                "noncanon=%d m=%2d  %.2f ms  %.2f Gbases/s%s"
                % (noncanon, m, dt * 1e3, rate, slope),
                flush=True,
            )
            prev = (m, dt)


if __name__ == "__main__":
    main()
