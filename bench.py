"""Benchmark: sketch throughput + pairwise distance rate on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Primary metric: bases/second through the full sketch pipeline (uppercase,
canonicalize, MurmurHash3, bottom-s fold) on the default platform (TPU
when available).  ``vs_baseline`` compares against Mash 2.3's single-core
CPU sketching throughput, estimated at 5e6 bases/s/thread (the Mash paper
reports ~2.5e6 bases/s/core sketching RefSeq on 2016 hardware; doubled for
modern cores to stay conservative).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SKETCH_BASES_PER_SEC = 5e6  # mash 2.3, one modern CPU core (est.)
BASELINE_PAIRS_PER_SEC = 6e5        # mash dist pair rate per core (est.)
BASELINE_SCREEN_BASES_PER_SEC = 7e6  # mash screen per core (est.)


def bench_screen(db_size=2048, chunk_len=1 << 20, iters=8):
    import jax
    import jax.numpy as jnp
    from mash_tpu.core.params import default_nucleotide_params
    from mash_tpu.ops import screen_ops, sketch_ops

    params = default_nucleotide_params()
    rng = np.random.default_rng(2)
    db = np.sort(
        rng.integers(0, 2**63, size=db_size, dtype=np.int64).astype(
            np.uint64
        )
    )
    fold = screen_ops.make_screen_fold(params, jnp.asarray(db), 1000)
    chunk = jnp.asarray(
        rng.choice(
            np.frombuffer(b"ACGT", dtype=np.uint8), size=(chunk_len,)
        )
    )
    counts = jnp.zeros(db_size + 1, jnp.int32)
    state = sketch_ops.empty_state(1000)
    counts, state = fold(counts, state, chunk)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        counts, state = fold(counts, state, chunk)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    return chunk_len * iters / dt


def bench_sketch(batch=32, chunk_len=1 << 20, iters=5):
    import jax
    import jax.numpy as jnp
    from mash_tpu.core.params import default_nucleotide_params
    from mash_tpu.ops import sketch_ops
    from mash_tpu.ops.kmers import alphabet_bytes, hash_chunk

    params = default_nucleotide_params()
    s = params.sketch_size
    alpha = alphabet_bytes(params.alphabet)

    from mash_tpu.ops.pallas_sketch import sketch_chunks_auto

    @jax.jit
    def step(state, chunks):
        states = sketch_chunks_auto(
            chunks,
            alphabet=alpha,
            k=params.kmer_size,
            seed=params.seed,
            use64=params.use64,
            noncanonical=params.noncanonical,
            preserve_case=params.preserve_case,
            s=s,
        )
        ch = jnp.concatenate([state[0][None], states[0]])
        cc = jnp.concatenate([state[1][None], states[1]])
        return sketch_ops.tree_merge(ch, cc, s=s)

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    chunks = jnp.asarray(rng.choice(bases, size=(batch, chunk_len)))
    state = sketch_ops.empty_state(s)

    # warmup / compile
    state = step(state, chunks)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state, chunks)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    total_bases = batch * chunk_len * iters
    return total_bases / dt


def bench_pairwise(n=512, s=1000, iters=5):
    import jax
    import jax.numpy as jnp
    from mash_tpu.ops.distance import pairwise_common_denom_auto

    rng = np.random.default_rng(1)
    h = np.sort(
        rng.integers(0, 2**62, size=(n, s), dtype=np.int64).astype(
            np.uint64
        ),
        axis=1,
    )
    sizes = np.full((n,), s, dtype=np.int32)
    hd = jnp.asarray(h)
    nd = jnp.asarray(sizes)

    out = pairwise_common_denom_auto(hd, nd, hd, nd, cap=s)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pairwise_common_denom_auto(hd, nd, hd, nd, cap=s)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return n * n * iters / dt


def main():
    import jax

    platform = jax.devices()[0].platform
    sketch_rate = bench_sketch()
    pair_rate = bench_pairwise()
    screen_rate = bench_screen()
    result = {
        "metric": "sketch_bases_per_sec",
        "value": round(sketch_rate, 1),
        "unit": "bases/s",
        "vs_baseline": round(
            sketch_rate / BASELINE_SKETCH_BASES_PER_SEC, 3
        ),
        "secondary": {
            "pairwise_dists_per_sec": round(pair_rate, 1),
            "pairwise_vs_baseline": round(
                pair_rate / BASELINE_PAIRS_PER_SEC, 3
            ),
            "screen_bases_per_sec": round(screen_rate, 1),
            "screen_vs_baseline": round(
                screen_rate / BASELINE_SCREEN_BASES_PER_SEC, 3
            ),
            "platform": platform,
            "device_count": len(jax.devices()),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
