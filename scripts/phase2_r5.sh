#!/bin/bash
# Round-5 phase-2 chip sequence: runs when the gauge2 queue (PID $1) exits.
#  1. resume/finish any gauge2 cells the 14000s timeout cut off
#  2. expjit mechanism measurement -> docs/EXPJIT_MECHANISM.md
#  3. restart-protocol proof: flagship cell at the historically-bad seed
#     with train.restart_* armed (loss/geometric > 0.015 @ step 1500)
cd /root/repo
QPID=${1:-21793}
while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
echo "=== queue exited; resuming gauge2 remainder ==="
timeout 9000 python scripts/gauge_validate.py 4000 runs/gauge2
echo "=== expjit mechanism ==="
timeout 2400 python scripts/expjit_mechanism.py \
    runs/gauge/expjit_dcdp1_lccG/weights.npz docs/EXPJIT_MECHANISM.md
echo "=== restart proof cell ==="
timeout 3000 python - <<'EOF'
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
echo "=== phase2 done ==="
