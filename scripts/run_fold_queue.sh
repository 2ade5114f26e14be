#!/bin/bash
# Sequential fold retraining queue under the r5 unbiased evaluation
# protocol (selection by train-pooled F1, held-out scan reported at the
# selected checkpoint; see scripts/train_detector.py docstring).
#
# Stall discipline (CLAUDE.md): each fold runs under `timeout`; a
# nonzero exit (tunnel stall, timeout) retries with DPC_DET_RESUME=1 so
# the fold continues from its last checkpoint instead of restarting.
#
# Usage: bash scripts/run_fold_queue.sh [queue file]
#   queue file lines: <val_id> <trainer> <mix_dir_or_->  [extra env]
# Default queue: the 4 base trainer-B folds then the 4 mix folds.

set -u
cd "$(dirname "$0")/.."
QUEUE_FILE="${1:-}"
LOG_DIR=runs/fold_queue_logs
mkdir -p "$LOG_DIR"

wait_for_tpu() {
    # The axon tunnel sporadically stalls for stretches (CLAUDE.md; a
    # 23-min outage ate the first r5 queue attempt). Probe in a
    # SUBPROCESS (a failed in-process jax init is cached) and only
    # launch training once the chip answers. Never counts as an attempt.
    local waited=0
    while true; do
        if timeout 90 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu', jax.default_backend()
print(float((jnp.ones((8, 128)) + 1).sum()))" >/dev/null 2>&1; then
            return 0
        fi
        waited=$((waited + 1))
        echo "tpu unreachable, waiting (probe $waited) $(date -u +%H:%M:%S)"
        sleep 60
    done
}

run_fold() {
    local val_id="$1" trainer="$2" mix="$3"
    shift 3
    local name="fold_${trainer}_${val_id}"
    [ "$mix" != "-" ] && name="${name}_mix"
    # An explicit checkpoint dir (scaling-curve / fast-profile folds)
    # also names the log, so reruns of the same (val, trainer, mix)
    # triple at different corpus sizes don't interleave one log file.
    local a
    for a in "$@"; do
        case "$a" in DPC_DET_CKPT_DIR=*) name="$(basename "${a#*=}")" ;; esac
    done
    local log="$LOG_DIR/${name}.log"
    local attempts=0 resume=0
    while [ $attempts -lt 5 ]; do
        wait_for_tpu | tee -a "$log"
        attempts=$((attempts + 1))
        echo "=== $name attempt $attempts (resume=$resume) $(date -u +%H:%M:%S) ===" | tee -a "$log"
        local env_args=(DPC_DET_VAL="$val_id" DPC_DET_TRAINER="$trainer"
                        DPC_DET_RESUME="$resume" "$@")
        [ "$mix" != "-" ] && env_args+=(DPC_DET_MIX_SYNTH="$mix")
        if env "${env_args[@]}" timeout 3900 \
            python scripts/train_detector.py >>"$log" 2>&1; then
            echo "=== $name DONE $(date -u +%H:%M:%S) ===" | tee -a "$log"
            return 0
        fi
        echo "=== $name attempt $attempts FAILED (rc=$?), retrying with resume ===" | tee -a "$log"
        resume=1
        sleep 30
    done
    echo "=== $name GAVE UP after $attempts attempts ===" | tee -a "$log"
    return 1
}

MIX=runs/synthgen_kitti_v2/training/scan_context
if [ -n "$QUEUE_FILE" ]; then
    while read -r val trainer mix extra; do
        [ -z "$val" ] && continue
        case "$val" in \#*) continue ;; esac
        run_fold "$val" "$trainer" "$mix" $extra
    done < "$QUEUE_FILE"
else
    for v in 2095 2073 840 2160; do run_fold "$v" b -; done
    for v in 2095 2073 840 2160; do run_fold "$v" b "$MIX"; done
fi
echo "QUEUE COMPLETE $(date -u)"
