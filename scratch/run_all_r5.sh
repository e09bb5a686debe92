#!/bin/bash
# Round-5 truth-sync re-measurement chain: every bench mode under the
# shipped defaults at HEAD, outputs to /tmp/r5_final/.
set -u
mkdir -p /tmp/r5_final
cd /root/repo
for mode in warmstart million copoly refine adaptive longhorizon sharded dense diff; do
  echo "=== $mode ==="
  timeout 5400 python bench.py $mode > /tmp/r5_final/$mode.json 2> /tmp/r5_final/$mode.log
  tail -1 /tmp/r5_final/$mode.json
done
echo "=== adaptive mixed ==="
timeout 5400 python bench.py adaptive mixed > /tmp/r5_final/adaptive_mixed.json 2> /tmp/r5_final/adaptive_mixed.log
tail -1 /tmp/r5_final/adaptive_mixed.json
echo "=== sparse (CPU) ==="
timeout 1800 python bench.py sparse > /tmp/r5_final/sparse.json 2> /tmp/r5_final/sparse.log
tail -1 /tmp/r5_final/sparse.json
echo ALL-DONE
