#!/usr/bin/env bash
# Round-4 chip-job queue (run AFTER the go9_gaz_full n800 ladder finishes).
# Stages are sequential — the tunnel serves one chip; two concurrent clients
# wedge it (CLAUDE.md round-3 notes). Usage: scripts/round4_chip_queue.sh [from_stage]
set -u
cd "$(dirname "$0")/.."
from="${1:-0}"

stage() { echo "[queue $(date +%H:%M:%S)] stage $1: $2"; }

if [ "$from" -le 0 ]; then
    stage 0 "weak-scaling rerun in the quiet window (no chip; VERDICT #7)"
    timeout 3000 python scripts/multihost_scaling.py 1024 4 \
        > runs/mh_scale_r4.json 2> runs/mh_scale_r4.err || true
    cat runs/mh_scale_r4.json || true
fi

if [ "$from" -le 1 ]; then
    stage 1 "bench.py with the round-4 sim-loop fixes (fresh compiles)"
    timeout 7200 python bench.py > BENCH_LOCAL_r4.json 2>runs/bench_r4.log || true
    cat BENCH_LOCAL_r4.json || true
fi

if [ "$from" -le 2 ]; then
    stage 2 "az n=200 continuation: 50 -> 200 iterations (VERDICT #3)"
    # quarter recipe (500 games / 125 steps per iteration, documented delta);
    # end=200 puts 25k steps in reach; the hard timeout harvests whatever
    # iteration the budget allows (checkpoints land continuously)
    timeout 6600 bash scripts/zero_supervisor.sh runs/go9_az200_r3b \
        "env_name=go:env_board_size=9:actor_num_simulation=200:zero_num_parallel_games=1024:zero_num_games_per_iteration=500:zero_end_iteration=200:learner_training_step=125:learner_batch_size=1024:learner_learning_rate=0.02:nn_num_blocks=1:nn_num_hidden_channels=256:nn_num_value_hidden_channels=256:program_auto_seed=false" \
        40 1200 || true
fi

if [ "$from" -le 3 ]; then
    stage 3 "Atari gmz b=128 sustained run, 10+1 iterations (VERDICT #4)"
    timeout 4500 python -u scripts/run_atari_gmz.py runs/atari_gmz_r4_b128 10 128 \
        > runs/atari_gmz_r4_b128.log 2>&1 || true
    tail -3 runs/atari_gmz_r4_b128.log || true
fi

if [ "$from" -le 4 ]; then
    stage 4 "Go9 Gumbel-MuZero n=16 run, 50 iterations (VERDICT #5)"
    timeout 4800 bash scripts/zero_supervisor.sh runs/go9_gmz_r4 \
        "env_name=go:env_board_size=9:nn_type_name=muzero:actor_num_simulation=16:actor_use_gumbel=true:actor_use_gumbel_noise=true:actor_gumbel_sample_size=16:zero_num_parallel_games=1024:zero_num_games_per_iteration=2000:zero_end_iteration=50:learner_training_step=500:learner_batch_size=1024:learner_learning_rate=0.02:nn_num_blocks=1:nn_num_hidden_channels=256:nn_num_value_hidden_channels=256:program_auto_seed=false" \
        40 1200 || true
fi

if [ "$from" -le 5 ]; then
    stage 5 "ladders: gmz run self-ladder + az200 extension ladder"
    if ls runs/go9_gmz_r4/model/weight_iter_*.ckpt >/dev/null 2>&1; then
        timeout 2700 python -u scripts/elo_curve.py runs/go9_gmz_r4 5 96 "" "" 4 \
            > runs/go9_gmz_r4.elo.log 2>&1 || true
    fi
    timeout 2700 python -u scripts/elo_curve.py runs/go9_az200_r3b 10 96 \
        > runs/go9_az200_r3b.elo_r4.log 2>&1 || true
fi
echo "[queue] done"
