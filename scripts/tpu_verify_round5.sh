#!/bin/bash
# One-shot round-5 TPU checklist.  Logs to /tmp/tpu_r5/.
#
# ORDER MATTERS: the H=1e8 big-DB probe runs FIRST because its Mosaic
# compile takes ~20-25 min cold (measured 1376 s, 2026-08-19) — far
# beyond bench.py's bigdb group budget.  Running the probe warms the
# persistent compile cache (~/.cache/mash_tpu/xla) so the driver's
# end-of-round bench can capture the 1e8 point within budget.  Keep the
# default MASH_TPU_BIGDB_SLAB_MB so the probe compiles the exact shapes
# bench.py will request.
set -u
mkdir -p /tmp/tpu_r5
cd "$(dirname "$0")/.."

echo "== 1e8 big-DB probe (warms the Mosaic cache for bench) =="
timeout 3000 python scripts/probe_bigdb_1e8.py 100000000 \
  2>&1 | tee /tmp/tpu_r5/probe_1e8.log | tail -4

echo "== bench (honest forced timings, incremental JSON) =="
timeout 3600 python bench.py | tee /tmp/tpu_r5/bench.jsonl
tail -1 /tmp/tpu_r5/bench.jsonl > /tmp/tpu_r5/bench_final.json

echo "== TPU CI suite =="
MASH_TPU_TEST_TPU=1 timeout 3600 python -m pytest tests/ -q \
  2>&1 | tee /tmp/tpu_r5/pytest_tpu.log | tail -3

echo "== multichip dryrun (virtual CPU mesh) =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  timeout 900 python __graft_entry__.py 2>&1 | tail -2
