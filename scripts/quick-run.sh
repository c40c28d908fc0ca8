#!/usr/bin/env bash
# Umbrella CLI (reference tools/quick-run.sh): train / self-eval / fight-eval
# / console on top of `python -m minizero_tpu`.
#
#   scripts/quick-run.sh train     <game> <az|mz|gaz|gmz> <end_iter> [conf_str]
#   scripts/quick-run.sh self-eval <game> <run_dir> [num_games]
#   scripts/quick-run.sh fight-eval <game> <run_dir_a> <run_dir_b> [iter] [games]
#   scripts/quick-run.sh console   <game> <ckpt.ckpt> [conf_str]
#   scripts/quick-run.sh env-test  <game>
#
# The reference spawns a TCP server + per-GPU workers (quick-run.sh:424-470);
# here one process drives the device mesh, so "train" is a single command.
set -euo pipefail

# optional platform override (e.g. MINIZERO_PLATFORM=cpu for smoke tests)
PLATFORM_ARGS=()
[ -n "${MINIZERO_PLATFORM:-}" ] && PLATFORM_ARGS=(-platform "$MINIZERO_PLATFORM")

mode="${1:?usage: quick-run.sh <train|self-eval|fight-eval|console|env-test> ...}"
shift

alg_conf() {
  case "$1" in
    az)  echo "nn_type_name=alphazero" ;;
    mz)  echo "nn_type_name=muzero" ;;
    gaz) echo "nn_type_name=alphazero:actor_use_gumbel=true:actor_use_gumbel_noise=true:actor_use_dirichlet_noise=false:actor_num_simulation=16:actor_gumbel_sample_size=16" ;;
    gmz) echo "nn_type_name=muzero:actor_use_gumbel=true:actor_use_gumbel_noise=true:actor_use_dirichlet_noise=false:actor_num_simulation=16:actor_gumbel_sample_size=16" ;;
    *) echo "unknown algorithm: $1" >&2; exit 1 ;;
  esac
}

case "$mode" in
  train)
    game="${1:?game}"; alg="${2:?algorithm}"; iters="${3:?end iteration}"; extra="${4:-}"
    conf="env_name=${game}:zero_end_iteration=${iters}:$(alg_conf "$alg")"
    [ -n "$extra" ] && conf="${conf}:${extra}"
    name=$(python -m minizero_tpu "${PLATFORM_ARGS[@]}" -mode zero_training_name -conf_str "$conf")
    echo "training run: $name"
    exec python -m minizero_tpu "${PLATFORM_ARGS[@]}" -mode zero -conf_str "$conf" -run_dir "$name"
    ;;
  self-eval)
    game="${1:?game}"; run_dir="${2:?run dir}"; games="${3:-100}"
    exec python -m minizero_tpu "${PLATFORM_ARGS[@]}" -mode eval -conf_str "env_name=${game}" \
      -run_dir "$run_dir" -num_games "$games"
    ;;
  fight-eval)
    game="${1:?game}"; run_a="${2:?run dir A}"; run_b="${3:?run dir B}"
    iter="${4:-latest}"; games="${5:-100}"
    exec python -m minizero_tpu "${PLATFORM_ARGS[@]}" -mode eval -conf_str "env_name=${game}" \
      -run_dir "$run_a" -run_dir_b "$run_b" -iteration "$iter" -num_games "$games"
    ;;
  console)
    game="${1:?game}"; ckpt="${2:-}"; extra="${3:-}"
    conf="env_name=${game}"
    [ -n "$ckpt" ] && conf="${conf}:nn_file_name=${ckpt}"
    [ -n "$extra" ] && conf="${conf}:${extra}"
    exec python -m minizero_tpu "${PLATFORM_ARGS[@]}" -mode console -conf_str "$conf"
    ;;
  env-test)
    game="${1:?game}"
    exec python -m minizero_tpu "${PLATFORM_ARGS[@]}" -mode env_test -conf_str "env_name=${game}"
    ;;
  *)
    echo "unknown mode: $mode" >&2; exit 1 ;;
esac
