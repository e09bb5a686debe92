#!/bin/bash
# Post-refine-48 re-measure: the bench modes whose numbers can shift with
# the second-wind/budget-48 refinement change (README reproducibility).
set -u
cd /root/repo
run() {
  name="$1"; shift
  echo "=== $name start $(date +%H:%M:%S) ===" >> /tmp/r4b_chain.log
  timeout 5400 "$@" > "/tmp/r4b_${name}.log" 2>&1
  echo "EXIT=$?" >> "/tmp/r4b_${name}.log"
  echo "=== $name done $(date +%H:%M:%S) ===" >> /tmp/r4b_chain.log
}
run copoly    python bench.py copoly
run dense     python bench.py dense
run dense32k  python bench.py dense 32768
run warmstart python bench.py warmstart
run million   python bench.py million
echo "=== chain complete $(date +%H:%M:%S) ===" >> /tmp/r4b_chain.log
