#!/bin/bash
# Build the reference-parity dump drivers (parity_dump.cpp) for Go 9x9 and
# TicTacToe, compiling the reference sources in place from /root/reference
# (read-only) like build.sh does for the throughput benchmark.
set -e
cd "$(dirname "$0")"

REF=/root/reference/minizero
TORCH=$(python -c "import torch, os; print(os.path.dirname(torch.__file__))")

COMMON_SRC=(
    parity_dump.cpp
    "$REF/config/configuration.cpp"
    "$REF/config/configure_loader.cpp"
    "$REF/utils/random.cpp"
    "$REF/utils/sgf_loader.cpp"
    "$REF/environment/base/base_env.cpp"
    "$REF/actor/base_actor.cpp"
    "$REF/actor/zero_actor.cpp"
    "$REF/actor/mcts.cpp"
    "$REF/actor/gumbel_zero.cpp"
    "$REF/network/network.cpp"
)

build() {
    local name="$1"; shift
    local gamedef="$1"; shift
    g++ -O2 -std=c++17 -DNDEBUG $gamedef -D_GLIBCXX_USE_CXX11_ABI=1 \
        -include stdexcept \
        -Istub_include \
        -I"$REF/config" -I"$REF/utils" -I"$REF/environment" -I"$REF/environment/base" \
        -I"$REF/environment/go" -I"$REF/environment/tictactoe" -I"$REF/environment/stochastic" \
        -I"$REF/actor" -I"$REF/network" \
        -I"$TORCH/include" -I"$TORCH/include/torch/csrc/api/include" \
        "${COMMON_SRC[@]}" "$@" \
        -L"$TORCH/lib" -ltorch -ltorch_cpu -lc10 -lz -lpthread \
        -Wl,-rpath,"$TORCH/lib" \
        -o "$name"
    echo "built refbench/$name"
}

build parity_dump_go "-DGO=1" "$REF/environment/go/go.cpp" "$REF/environment/go/go_data_structure_check.cpp"
build parity_dump_tictactoe "" "$REF/environment/tictactoe/tictactoe.cpp"
# ATARI=1: the reference's AtariEnv + the #if ATARI plain-average init-Q
# branch (mcts.cpp:200-217), against the deterministic stub ALE + identity
# cv::resize in stub_include/ (no ale_py/ROMs/opencv in this image)
build parity_dump_atari "-DATARI=1 -I$REF/environment/atari" "$REF/environment/atari/atari.cpp"
