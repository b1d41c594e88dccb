#!/bin/bash
# Round-3 TPU verification checklist — run once the axon tunnel answers.
# Each stage logs to /tmp/tpu_r3/<stage>.log; the script never aborts on
# a stage failure so later stages still produce evidence.
set -u
OUT=/tmp/tpu_r3
mkdir -p "$OUT"
cd /root/repo

stamp() { date '+%H:%M:%S'; }

echo "[$(stamp)] stage 1: TPU CI suite (MASH_TPU_TEST_TPU=1)"
MASH_TPU_TEST_TPU=1 timeout 5400 python -m pytest tests/ -q \
    > "$OUT/suite.log" 2>&1
echo "suite rc=$?" | tee -a "$OUT/summary.txt"
tail -3 "$OUT/suite.log" | tee -a "$OUT/summary.txt"

echo "[$(stamp)] stage 2: bench.py"
timeout 3600 python bench.py > "$OUT/bench.log" 2>&1
echo "bench rc=$?" | tee -a "$OUT/summary.txt"
grep -o '{"metric".*' "$OUT/bench.log" | tee -a "$OUT/summary.txt"

echo "[$(stamp)] done"
