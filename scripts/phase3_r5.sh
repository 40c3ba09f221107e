#!/bin/bash
# Round-5 phase-3 chip sequence: runs when the gauge2 queue (PID $1) exits.
#  1. restart-protocol proof: flagship cell at the historically-bad seed
#     with train.restart_* armed (loss/geometric > 0.015 @ step 1500)
#  2. full-colon artifact rerun (now records link bandwidth in the JSON)
#  3. bench snapshot
cd /root/repo
QPID=${1:?pass the gauge_validate PID}
while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
echo "=== queue exited; restart proof cell ==="
timeout 4000 python - <<'EOF'
import sys, os
sys.path.insert(0, 'scripts'); sys.path.insert(0, '.')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
from ablate import run_cell, aggregate
run_cell(dcdp=True, lcc=True, seed=1234, steps=4000, out_root='runs/restart',
         name='dcdp1_lcc1_restart',
         overrides={'train.restart_threshold': 0.015,
                    'train.restart_check_step': 1500,
                    'train.restart_max': 2})
aggregate('runs/restart', 4000)
EOF
echo "=== fullcolon rerun (link-instrumented) ==="
timeout 3000 python scripts/fullcolon.py
echo "=== bench snapshot ==="
timeout 3000 python bench.py
echo "=== phase3 done ==="
