"""Measure raw host->device transfer bandwidth vs array size.

Decides whether the e2e bound is per-put overhead (fix: bigger puts)
or raw tunnel bandwidth (fix: cut bytes / accept the bound).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

import mash_tpu  # noqa: F401  (compile cache etc.)


def bw(nbytes, reps=3, pieces=1):
    dev = jax.devices()[0]
    per = nbytes // pieces
    arrs = [
        np.random.default_rng(i).integers(
            0, 255, size=per, dtype=np.uint8
        )
        for i in range(pieces)
    ]
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        ds = [jax.device_put(a, dev) for a in arrs]
        t_put = time.perf_counter() - t0
        for d in ds:
            d.block_until_ready()
        dt = time.perf_counter() - t0
        del ds
        best = max(best, nbytes / dt)
        print(
            "  %6.1f MiB x%-3d  put=%6.3fs total=%6.3fs  %7.1f MiB/s"
            % (
                per / 2**20,
                pieces,
                t_put,
                dt,
                nbytes / dt / 2**20,
            ),
            flush=True,
        )
    return best


def main():
    print("platform=%s" % jax.default_backend(), flush=True)
    # warm up
    bw(1 << 20, reps=2)
    for size, pieces in [
        (12 << 20, 1),
        (48 << 20, 1),
        (96 << 20, 1),
        (96 << 20, 8),
        (96 << 20, 96),
        (96 << 20, 768),
    ]:
        print("size=%d MiB pieces=%d" % (size >> 20, pieces), flush=True)
        bw(size, reps=3, pieces=pieces)


if __name__ == "__main__":
    main()
