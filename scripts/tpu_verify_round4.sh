#!/bin/bash
# One-shot round-4 TPU checklist: honest bench + TPU CI suite.
# Logs to /tmp/tpu_r4/. Run when the watchdog says the tunnel is OK
# (see .claude/skills/verify/SKILL.md round-4 outage playbook).
set -u
mkdir -p /tmp/tpu_r4
cd "$(dirname "$0")/.."

echo "== bench (honest forced timings, incremental JSON) =="
timeout 3000 python bench.py | tee /tmp/tpu_r4/bench.jsonl
tail -1 /tmp/tpu_r4/bench.jsonl > /tmp/tpu_r4/bench_final.json

echo "== TPU CI suite =="
MASH_TPU_TEST_TPU=1 timeout 3600 python -m pytest tests/ -q \
  2>&1 | tee /tmp/tpu_r4/pytest_tpu.log | tail -3

echo "== multichip dryrun (virtual CPU mesh) =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  timeout 900 python __graft_entry__.py 2>&1 | tail -2
