#!/bin/bash
# Final round-4 re-measure under the shipped defaults (sigma=1e-5,
# per-class refine chunks, two-phase headline already measured).
set -u
cd /root/repo
run() {
  name="$1"; shift
  echo "=== $name start $(date +%H:%M:%S) ===" >> /tmp/r4c_chain.log
  timeout 5400 "$@" > "/tmp/r4c_${name}.log" 2>&1
  echo "EXIT=$?" >> "/tmp/r4c_${name}.log"
  echo "=== $name done $(date +%H:%M:%S) ===" >> /tmp/r4c_chain.log
}
run copoly    python bench.py copoly
run dense     python bench.py dense
run dense32k  python bench.py dense 32768
run warmstart python bench.py warmstart
run million   python bench.py million
run refine    python bench.py refine
run sharded   python bench.py sharded
run adaptive  python bench.py adaptive
echo "=== chain complete $(date +%H:%M:%S) ===" >> /tmp/r4c_chain.log
