"""D2H fetch-strategy experiment for the streamed-triangle path (r5).

The stripe pipeline fetches one device tile at a time (np.asarray per
tile).  Through the dev tunnel every fetch pays a ~40 ms round-trip
floor on top of the ~25 MiB/s payload rate, and the 100k triangle
issues ~5k tile fetches.  Candidates measured here:

  serial    np.asarray per tile (status quo)
  threads4  concurrent.futures pool of 4 fetchers (round trips overlap
            if the tunnel client is re-entrant)
  async     arr.copy_to_host_async() on dispatch, np.asarray later
            (overlaps transfer with later device compute if honored)

Each strategy fetches the same 24 x 4 MiB uint16 tiles; forced-fetch
conventions apply (the arrays are products of a real device op so the
fetch itself proves execution).

Run on the real chip:  python scripts/profile_d2h_strategies.py
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n_tiles, rows, cols = 24, 1024, 2048  # 4 MiB uint16 each
    rng = np.random.default_rng(0)
    host = rng.integers(0, 1000, size=(rows, cols), dtype=np.uint16)
    base = jax.device_put(host)
    float(jnp.sum(base[:1, :1].astype(jnp.float32)))  # handshake
    print("platform:", jax.devices()[0].platform, flush=True)

    def make_tiles():
        # distinct buffers via a real device op (not aliases of base)
        return [base + jnp.uint16(i) for i in range(n_tiles)]

    total_mib = n_tiles * rows * cols * 2 / 2**20

    def report(tag, dt):
        print(
            "%-9s %6.2f s   %6.1f MiB/s  (%d tiles)"
            % (tag, dt, total_mib / dt, n_tiles),
            flush=True,
        )

    # warmup one fetch
    tiles = make_tiles()
    np.asarray(tiles[0])

    for _ in range(2):
        tiles = make_tiles()
        t0 = time.perf_counter()
        outs = [np.asarray(t) for t in tiles]
        report("serial", time.perf_counter() - t0)
        assert outs[3][0, 0] == host[0, 0] + 3

        tiles = make_tiles()
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=4) as ex:
            outs = list(ex.map(np.asarray, tiles))
        report("threads4", time.perf_counter() - t0)
        assert outs[3][0, 0] == host[0, 0] + 3

        tiles = make_tiles()
        t0 = time.perf_counter()
        for t in tiles:
            try:
                t.copy_to_host_async()
            except Exception as e:
                print("copy_to_host_async unavailable:", e)
                break
        outs = [np.asarray(t) for t in tiles]
        report("async", time.perf_counter() - t0)
        assert outs[3][0, 0] == host[0, 0] + 3


if __name__ == "__main__":
    main()
