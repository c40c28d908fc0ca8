#!/bin/bash
# Build the reference CPU self-play benchmark (see main.cpp).
# Compiles the reference sources in-place from /root/reference (read-only)
# against libtorch from the pip torch wheel, with the tiny boost shims in
# stub_include/ standing in for the absent boost headers.
set -e
cd "$(dirname "$0")"

REF=/root/reference/minizero
TORCH=$(python -c "import torch, os; print(os.path.dirname(torch.__file__))")

SRC=(
    main.cpp
    "$REF/config/configuration.cpp"
    "$REF/config/configure_loader.cpp"
    "$REF/utils/random.cpp"
    "$REF/utils/sgf_loader.cpp"
    "$REF/environment/base/base_env.cpp"
    "$REF/environment/go/go.cpp"
    "$REF/environment/go/go_data_structure_check.cpp"
    "$REF/actor/base_actor.cpp"
    "$REF/actor/zero_actor.cpp"
    "$REF/actor/mcts.cpp"
    "$REF/actor/gumbel_zero.cpp"
    "$REF/network/network.cpp"
)

# -include stdexcept: vector_map.h uses std::out_of_range without including
# <stdexcept>; real boost headers pulled it in transitively, our shims don't
g++ -O2 -std=c++17 -DNDEBUG -DGO=1 -D_GLIBCXX_USE_CXX11_ABI=1 \
    -include stdexcept \
    -Istub_include \
    -I"$REF/config" -I"$REF/utils" -I"$REF/environment" -I"$REF/environment/base" \
    -I"$REF/environment/go" -I"$REF/environment/stochastic" \
    -I"$REF/actor" -I"$REF/network" \
    -I"$TORCH/include" -I"$TORCH/include/torch/csrc/api/include" \
    "${SRC[@]}" \
    -L"$TORCH/lib" -ltorch -ltorch_cpu -lc10 -lz -lpthread \
    -Wl,-rpath,"$TORCH/lib" \
    -o refbench_go
echo "built refbench/refbench_go"
