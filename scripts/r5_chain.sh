#!/bin/bash
# Round-5 TPU job chain, run once the phase-1 fold queue (base + mix
# retrains under the unbiased protocol) releases the chip. Short,
# high-value jobs first so every r4-VERDICT item has an artifact even
# if the long scaling tail overruns the round:
#   1. fast-profile detector fold  (bench fastdet checkpoint)
#   2. synthgen v3                 (FP-attribution-driven generator iter)
#   3. threshold sweep             (now incl. trainer A/C grids)
#   4. bench.py                    (warm cache + repeatability envelope)
#   5. corpus-scaling folds        (100/300/1000/2700, ~hours)
#   6. scaling-curve collection
# Usage: nohup bash scripts/r5_chain.sh > runs/fold_queue_logs/chain.out 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOG=runs/fold_queue_logs

step() {
    echo "=== STEP $1 start $(date -u +%H:%M:%S) ==="
    shift
    "$@"
    echo "=== STEP done rc=$? $(date -u +%H:%M:%S) ==="
}

while kill -0 "$(cat /tmp/queue.pid 2>/dev/null)" 2>/dev/null; do
    sleep 60
done

step fast_fold bash scripts/run_fold_queue.sh scripts/fold_queue_r5_fast.txt
step synthgen_v3 env DPC_SG_REALISM=v3 DPC_SG_REUSE=1 timeout 5400 \
    python scripts/train_synth_generalization.py
step threshold_sweep timeout 2400 python scripts/threshold_sweep.py
step bench timeout 3600 python bench.py
step scaling_folds bash scripts/run_fold_queue.sh scripts/fold_queue_r5_scale.txt
step collect python scripts/collect_scaling_curve.py
echo "CHAIN COMPLETE $(date -u)"
