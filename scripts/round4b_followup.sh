#!/usr/bin/env bash
# Round-4 continuation-session follow-up queue (after the go9_gmz_r4 run):
# 1. az200 extension ladder (VERDICT #3 done-criterion: confirmed-rising
#    past 25k steps) — n=16-eval shapes are compile-cached, minutes.
# 2. gmz self-ladder (VERDICT #5 done-criterion) — muzero board eval is
#    deterministic, so opening_random_plies=4 for game diversity.
# 3. Atari gmz b=128 sustained run with ALL remaining budget (VERDICT #4);
#    sims=12 matches the round-3 run for a comparable return curve.
# Sequential: one chip, never two TPU clients (CLAUDE.md round-3 notes).
set -u
cd "$(dirname "$0")/.."
from="${1:-1}"
stage() { echo "[followup $(date +%H:%M:%S)] stage $1: $2"; }

if [ "$from" -le 1 ]; then
    stage 1 "az200 extension ladder, 8 rungs x 200 games"
    timeout 1500 python -u scripts/elo_curve.py runs/go9_az200_r3b 25 200 "" "_ext" \
        > runs/go9_az200_r3b.elo_r4.log 2>&1 || true
    tail -3 runs/go9_az200_r3b.elo_r4.log || true
fi

if [ "$from" -le 2 ]; then
    stage 2 "go9_gmz_r4 self-ladder, interval 5, 96 games, 4 opening plies"
    timeout 1800 python -u scripts/elo_curve.py runs/go9_gmz_r4 5 96 "" "" 4 \
        > runs/go9_gmz_r4.elo.log 2>&1 || true
    tail -3 runs/go9_gmz_r4.elo.log || true
fi

if [ "$from" -le 3 ]; then
    stage 3 "Atari gmz b=128 n=12 sustained run, 10+1 iterations"
    timeout 3000 python -u scripts/run_atari_gmz.py runs/atari_gmz_r4_b128 10 128 12 \
        > runs/atari_gmz_r4_b128.log 2>&1 || true
    tail -3 runs/atari_gmz_r4_b128.log || true
fi
echo "[followup] done"
