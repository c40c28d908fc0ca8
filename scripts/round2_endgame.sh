#!/usr/bin/env bash
# End-of-session chip schedule (round 2): run after stopping the trainer.
#   1. Atari gmz on-chip smoke (VERDICT r1 #7) -> runs/atari_gmz_r2
#   2. Go9 ladder + reference Elo-curve overlay  -> runs/go9_gaz_full/elo_curve*
# Each step logs to its own file; failures don't block the next step.
set -u
cd "$(dirname "$0")/.."

echo "[endgame] atari smoke"
timeout 2100 python -u scripts/run_atari_gmz.py runs/atari_gmz_r2 3 256 \
    > runs/atari_gmz_r2.log 2>&1
echo "[endgame] atari exit: $?"

echo "[endgame] elo ladder"
timeout 2400 python -u scripts/elo_curve.py runs/go9_gaz_full 25 64 \
    > runs/go9_gaz_full.elo.log 2>&1
echo "[endgame] ladder exit: $?"
