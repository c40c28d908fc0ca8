#!/usr/bin/env bash
# Round-3 chip-job queue (run AFTER runs/go9_gaz_full reaches iteration 300).
# Each stage appends to its own log; stages are sequential because the
# tunnel serves one chip. Usage: scripts/round3_chip_queue.sh [from_stage]
set -u
cd "$(dirname "$0")/.."
from="${1:-1}"

stage() { echo "[queue $(date +%H:%M:%S)] stage $1: $2"; }

if [ "$from" -le 1 ]; then
    stage 1 "Othello 8x8 mz n=50 training run (VERDICT r2 #2b)"
    bash scripts/zero_supervisor.sh runs/oth8_mz_r3 \
        "env_name=othello:env_board_size=8:nn_type_name=muzero:actor_num_simulation=50:zero_num_parallel_games=1024:zero_num_games_per_iteration=2000:zero_end_iteration=50:learner_training_step=500:learner_batch_size=1024:learner_learning_rate=0.02:nn_num_blocks=1:nn_num_hidden_channels=256:nn_num_value_hidden_channels=256:program_auto_seed=false" \
        40 900
fi

if [ "$from" -le 2 ]; then
    stage 2 "Go9 800-sim reference-protocol ladder (VERDICT r2 #1/#6)"
    timeout 7200 python -u scripts/elo_curve.py runs/go9_gaz_full 25 200 \
        "actor_num_simulation=800:actor_select_action_by_count=true:actor_select_action_by_softmax_count=false:actor_use_dirichlet_noise=false:actor_use_gumbel_noise=false" \
        _n800 > runs/go9_gaz_full.elo_n800.log 2>&1
fi

if [ "$from" -le 3 ]; then
    stage 3 "Go9 az n=200 short training run (VERDICT r2 #5)"
    bash scripts/zero_supervisor.sh runs/go9_az200_r3 \
        "env_name=go:env_board_size=9:actor_num_simulation=200:zero_num_parallel_games=1024:zero_num_games_per_iteration=2000:zero_end_iteration=25:learner_training_step=500:learner_batch_size=1024:learner_learning_rate=0.02:nn_num_blocks=1:nn_num_hidden_channels=256:nn_num_value_hidden_channels=256:program_auto_seed=false" \
        40 1800
fi

if [ "$from" -le 4 ]; then
    stage 4 "Atari gmz on-chip iteration, staged b=128/n=12 (VERDICT r2 #4)"
    timeout 5400 python -u scripts/run_atari_gmz.py runs/atari_gmz_r3_b128 1 128 \
        > runs/atari_gmz_r3_b128.log 2>&1
    stage 4b "Atari gmz b=256 full recipe attempt"
    timeout 5400 python -u scripts/run_atari_gmz.py runs/atari_gmz_r3 1 256 \
        > runs/atari_gmz_r3.log 2>&1
fi

if [ "$from" -le 5 ]; then
    stage 5 "bench.py on the chip"
    timeout 3600 python bench.py > BENCH_LOCAL_r3.json 2>runs/bench_r3.log
    cat BENCH_LOCAL_r3.json
fi
echo "[queue] done"
