#!/usr/bin/env bash
# Round-3 continuation chip queue: runs AFTER runs/go9_az200_r3b training
# completes (stages are sequential — the tunnel serves one chip, and two
# concurrent clients wedge it, CLAUDE.md round-3 notes).
#
#   scripts/round3b_chip_queue.sh [wait_pid]
#
# Stage 1: az n=200 self-ladder for the 25-iteration flagship-config run
#          (interval 5 iters = 625 steps so the final ckpt is a rung).
# Stage 2: full-range gaz_full n=16 self-ladder 0 -> 150k steps (the round-2
#          ladder stopped at 75k; milestone ckpts are committed every 12.5k).
set -u
cd "$(dirname "$0")/.."

wait_pid="${1:-}"
if [ -n "$wait_pid" ]; then
    echo "[queue] waiting for pid $wait_pid (training supervisor)"
    while kill -0 "$wait_pid" 2>/dev/null; do sleep 20; done
fi

echo "[queue $(date +%H:%M:%S)] stage 1: az200_r3b ladder"
timeout 3600 python -u scripts/elo_curve.py runs/go9_az200_r3b 5 96 \
    > runs/go9_az200_r3b.elo.log 2>&1

echo "[queue $(date +%H:%M:%S)] stage 2: gaz_full n=16 ladder over 0-150k"
timeout 5400 python -u scripts/elo_curve.py runs/go9_gaz_full 25 96 \
    > runs/go9_gaz_full.elo_150k.log 2>&1
echo "[queue $(date +%H:%M:%S)] done"
