#!/bin/bash
# Build the cross-framework head-to-head pieces (VERDICT r3 #8), tictactoe:
#  - selfplay_worker_tictactoe: reference self-play -> sgf records (CPU)
#  - build/tictactoe/minizero_py.so: the reference learner's pybind module,
#    compiled against the pybind11 headers BUNDLED WITH THE PIP TORCH WHEEL
#    (standalone pybind11 is absent from this image), so the reference's own
#    train.py runs unmodified.
# Reference sources compile in place from /root/reference (read-only).
set -e
cd "$(dirname "$0")"

REF=/root/reference/minizero
TORCH=$(python -c "import torch, os; print(os.path.dirname(torch.__file__))")
PYINC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")

COMMON=(
    "$REF/config/configuration.cpp"
    "$REF/config/configure_loader.cpp"
    "$REF/utils/random.cpp"
    "$REF/utils/sgf_loader.cpp"
    "$REF/environment/base/base_env.cpp"
    "$REF/environment/tictactoe/tictactoe.cpp"
)
FLAGS=(-O2 -std=c++17 -DNDEBUG -D_GLIBCXX_USE_CXX11_ABI=1
    -include stdexcept
    -Istub_include
    -I"$REF/config" -I"$REF/utils" -I"$REF/environment" -I"$REF/environment/base"
    -I"$REF/environment/tictactoe" -I"$REF/environment/stochastic"
    -I"$REF/actor" -I"$REF/network" -I"$REF/learner"
    -I"$TORCH/include" -I"$TORCH/include/torch/csrc/api/include")

g++ "${FLAGS[@]}" \
    selfplay_worker.cpp "${COMMON[@]}" \
    "$REF/actor/base_actor.cpp" "$REF/actor/zero_actor.cpp" \
    "$REF/actor/mcts.cpp" "$REF/actor/gumbel_zero.cpp" \
    "$REF/network/network.cpp" \
    -L"$TORCH/lib" -ltorch -ltorch_cpu -lc10 -lz -lpthread \
    -Wl,-rpath,"$TORCH/lib" \
    -o selfplay_worker_tictactoe
echo "built refbench/selfplay_worker_tictactoe"

mkdir -p xtrain/build/tictactoe
EXT=$(python -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
# minizero_py_binding.cpp replaces the reference's pybind.cpp: identical
# module API, but GIL-correct on Python 3.12 (their sample_data lambda calls
# array.request() with the GIL released — segfaults here; see the binding's
# header comment). Everything behind the API is the reference's DataLoader.
g++ "${FLAGS[@]}" -fPIC -shared \
    -I"$PYINC" \
    minizero_py_binding.cpp "$REF/learner/data_loader.cpp" "${COMMON[@]}" \
    -lz -lpthread \
    -o "xtrain/build/tictactoe/minizero_py$EXT"
touch xtrain/build/__init__.py xtrain/build/tictactoe/__init__.py
echo "built refbench/xtrain/build/tictactoe/minizero_py$EXT"
