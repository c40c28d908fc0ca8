#!/usr/bin/env bash
# Round-4 endgame (replaces round4_chip_queue stages 3-5 after re-planning):
# gmz board run first (fixed-size deliverable), then the az200 VMEM-fix
# measurement, then atari sustained, then ladders. Sequential: one chip.
set -u
cd "$(dirname "$0")/.."
from="${1:-1}"
stage() { echo "[endgame $(date +%H:%M:%S)] stage $1: $2"; }

if [ "$from" -le 1 ]; then
    stage 1 "Go9 Gumbel-MuZero n=16 run, 50 iterations (VERDICT #5)"
    timeout 4200 bash scripts/zero_supervisor.sh runs/go9_gmz_r4 \
        "env_name=go:env_board_size=9:nn_type_name=muzero:actor_num_simulation=16:actor_use_gumbel=true:actor_use_gumbel_noise=true:actor_gumbel_sample_size=16:zero_num_parallel_games=1024:zero_num_games_per_iteration=2000:zero_end_iteration=50:learner_training_step=500:learner_batch_size=1024:learner_learning_rate=0.02:nn_num_blocks=1:nn_num_hidden_channels=256:nn_num_value_hidden_channels=256:program_auto_seed=false" \
        40 1200 || true
fi

if [ "$from" -le 2 ]; then
    stage 2 "az200 VMEM-fix A/B (VERDICT #2): default 28MB vs old 100MB"
    timeout 2400 python -u scripts/perf_az200.py 200 1024 \
        > runs/perf_az200_vmem28.log 2>&1 || true
    tail -2 runs/perf_az200_vmem28.log || true
fi

if [ "$from" -le 3 ]; then
    stage 3 "Atari gmz b=128 sustained run, 10+1 iterations (VERDICT #4)"
    timeout 4800 python -u scripts/run_atari_gmz.py runs/atari_gmz_r4_b128 10 128 \
        > runs/atari_gmz_r4_b128.log 2>&1 || true
    tail -3 runs/atari_gmz_r4_b128.log || true
fi

if [ "$from" -le 4 ]; then
    stage 4 "ladders: gmz self-ladder + az200 continuation key pairs"
    if ls runs/go9_gmz_r4/model/weight_iter_*.ckpt >/dev/null 2>&1; then
        timeout 2400 python -u scripts/elo_curve.py runs/go9_gmz_r4 5 96 "" "" 4 \
            > runs/go9_gmz_r4.elo.log 2>&1 || true
        tail -2 runs/go9_gmz_r4.elo.log || true
    fi
    timeout 2400 python -u scripts/elo_curve.py runs/go9_az200_r3b 25 200 \
        > runs/go9_az200_r3b.elo_r4.log 2>&1 || true
    tail -2 runs/go9_az200_r3b.elo_r4.log || true
fi
echo "[endgame] done"
