"""North-star measurement: 100k-sketch PHYLIP triangle on one chip.

Drives the production streamed-triangle path (rank compression, packed
uint16 readback, native %.6g formatter) over 100,000 synthetic s=1000
64-bit sketches and reports wall-clock + pairs/s.  Round-2 measured
1618 s (~27 min, 3.1 M pairs/s); the round-3 target is < 20 min warm
via the common-only uint16 readback + the deep stripe pipeline.

Usage:  python scripts/triangle_100k.py [N]     (default 100000)
Output goes to /dev/null; progress + timing to stderr.
"""

from __future__ import annotations

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    s = 1000

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # sitecustomize may pin the platform config to the TPU plugin;
        # an explicit JAX_PLATFORMS=cpu must win (as in tests/conftest)
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from mash_tpu.commands.triangle import CommandTriangle
    from mash_tpu.core.params import default_nucleotide_params
    from mash_tpu.core.sketch import SketchRef, SketchSet

    print("devices:", jax.devices(), file=sys.stderr)

    t0 = time.perf_counter()
    rng = np.random.default_rng(12)
    H = np.sort(
        rng.integers(0, 2**62, size=(n, s), dtype=np.int64).astype(
            np.uint64
        ),
        axis=1,
    )
    N = np.full(n, s, dtype=np.int32)
    print(
        "synth sketches: %.1f s" % (time.perf_counter() - t0),
        file=sys.stderr,
    )

    params = default_nucleotide_params()
    refs = [
        SketchRef(
            name="g%06d" % i,
            comment="",
            length=5_000_000,
            hashes=H[i],
            counts=np.array([], np.uint32),
        )
        for i in range(n)
    ]
    sketch = SketchSet(params)

    cmd = CommandTriangle()
    out = open(os.devnull, "w", buffering=1 << 20)
    out.write("\t%d\n" % n)

    t0 = time.perf_counter()
    peak = cmd._run_streamed(
        sketch, refs, H, N, s, out, edge=False, comment=False,
        pvalue_max=-1.0, distance_max=-1.0,
    )
    dt = time.perf_counter() - t0
    out.close()
    pairs = n * (n - 1) // 2
    print(
        "triangle %d sketches: %.1f s  (%.2fM pairs/s, max p=%g)"
        % (n, dt, pairs / dt / 1e6, peak),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
