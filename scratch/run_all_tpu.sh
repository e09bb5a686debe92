#!/bin/bash
# Round-4 re-measurement chain: every documented number re-run under the
# shipped defaults (VERDICT item 6), one TPU job at a time. Logs to
# /tmp/r4_<mode>.log.
set -u
cd /root/repo
run() {
  name="$1"; shift
  echo "=== $name start $(date +%H:%M:%S) ===" >> /tmp/r4_chain.log
  timeout 5400 "$@" > "/tmp/r4_${name}.log" 2>&1
  echo "EXIT=$?" >> "/tmp/r4_${name}.log"
  echo "=== $name done $(date +%H:%M:%S) ===" >> /tmp/r4_chain.log
}
run headline python bench.py
run dense    python bench.py dense
run dense32k python bench.py dense 32768
run copoly   python bench.py copoly
run warmstart python bench.py warmstart
run million  python bench.py million
run adaptmix python bench.py adaptive mixed
run sharded  python bench.py sharded
run longhorizon python bench.py longhorizon
run refinemode python bench.py refine
run dense128 python scratch/tpu_dense128.py
run bsweep_dense python scratch/tpu_bsweep.py dense
run copoly320 python scratch/tpu_copoly320.py
run longbatch python scratch/tpu_longbatch.py
echo "=== chain complete $(date +%H:%M:%S) ===" >> /tmp/r4_chain.log
