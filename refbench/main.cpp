// Reference (rlglab/minizero) self-play throughput benchmark on CPU.
//
// BASELINE.md requires measuring the reference build directly for the
// speedup denominator. The reference's own self-play worker (ActorGroup,
// actor/actor_group.cpp:150-176) asserts >=1 CUDA device, so this harness
// replicates its two-phase lock-step loop (actor_group.cpp:72-148) on CPU,
// driving the reference's REAL classes: ZeroActor + MCTS/GumbelZero + GoEnv
// + AlphaZeroNetwork (TorchScript, libtorch CPU).
//
// Per phase pair: every actor runs one CPU step (apply last NN output ->
// afterNNEvaluation -> maybe finish move/game -> beforeNNEvaluation enqueue),
// then one batched network forward — identical to SlaveThread::doCPUJob /
// doGPUJob. Game records are not serialized (outputGame skipped), which
// only removes work from the reference side.
//
// Usage: refbench_go <model.pt> [seconds] [num_actors] [num_threads] [conf]

#include "alphazero_network.h"
#include "configuration.h"
#include "configure_loader.h"
#include "create_actor.h"
#include "create_network.h"
#include "environment.h"
#include "random.h"

#include <atomic>
#include <chrono>
#include <cstdlib>
#include <iostream>
#include <memory>
#include <string>
#include <thread>
#include <vector>

using namespace minizero;

namespace {

struct Stats {
    std::atomic<long long> moves{0};
    std::atomic<long long> games{0};
    std::atomic<long long> game_moves{0}; // moves in finished games
};

void cpuPhase(std::vector<std::shared_ptr<actor::BaseActor>>& actors,
              std::vector<std::shared_ptr<network::NetworkOutput>>& outputs,
              std::atomic<int>& next_actor, Stats& stats)
{
    int i;
    const int n = static_cast<int>(actors.size());
    while ((i = next_actor.fetch_add(1)) < n) {
        auto& a = actors[i];
        int out_id = a->getNNEvaluationBatchIndex();
        if (out_id >= 0) {
            a->afterNNEvaluation(outputs[out_id]);
            if (a->isSearchDone()) {
                // SlaveThread::handleSearchDone (actor_group.cpp:117-134),
                // minus record output
                if (!a->isResign()) { a->act(a->getSearchAction()); }
                stats.moves.fetch_add(1, std::memory_order_relaxed);
                if (a->isResign() || a->isEnvTerminal()) {
                    stats.games.fetch_add(1, std::memory_order_relaxed);
                    stats.game_moves.fetch_add(
                        static_cast<long long>(a->getEnvironment().getActionHistory().size()),
                        std::memory_order_relaxed);
                    a->reset();
                } else {
                    a->resetSearch();
                }
            }
        }
        a->beforeNNEvaluation();
    }
}

} // namespace

int main(int argc, char** argv)
{
    if (argc < 2) {
        std::cerr << "usage: " << argv[0] << " <model.pt> [seconds] [actors] [threads] [conf_str]\n";
        return 1;
    }
    const std::string model_path = argv[1];
    const double seconds = argc > 2 ? std::atof(argv[2]) : 120.0;
    const int num_actors = argc > 3 ? std::atoi(argv[3]) : 64;
    const int num_threads = argc > 4 ? std::atoi(argv[4]) : 2;

    config::ConfigureLoader cl;
    config::setConfiguration(cl);
    // the reference's Gumbel AlphaZero Go 9x9 headline config
    // (README.md:179-194, tools/quick-run.sh presets)
    std::string conf =
        "env_board_size=9:"
        "actor_num_simulation=16:"
        "actor_use_dirichlet_noise=false:"
        "actor_use_gumbel=true:"
        "actor_use_gumbel_noise=true:"
        "actor_gumbel_sample_size=16:"
        "program_auto_seed=false:program_seed=1:"
        "zero_num_parallel_games=" + std::to_string(num_actors);
    if (!cl.loadFromString(conf)) {
        std::cerr << "config load failed\n";
        return 1;
    }
    if (argc > 5 && !cl.loadFromString(argv[5])) {
        std::cerr << "extra config load failed\n";
        return 1;
    }
    env::setUpEnv();
    utils::Random::seed(config::program_seed);

    auto network = network::createNetwork(model_path, /*gpu_id=*/-1); // CPU
    auto az = std::static_pointer_cast<network::AlphaZeroNetwork>(network);
    const uint64_t tree_node_size =
        static_cast<uint64_t>(config::actor_num_simulation + 1) * network->getActionSize();

    std::vector<std::shared_ptr<actor::BaseActor>> actors;
    actors.reserve(num_actors);
    for (int i = 0; i < num_actors; ++i) {
        actors.emplace_back(actor::createActor(tree_node_size, network));
    }

    std::vector<std::shared_ptr<network::NetworkOutput>> outputs;
    Stats stats;

    auto run_phase_pair = [&]() {
        std::atomic<int> next_actor{0};
        std::vector<std::thread> workers;
        for (int t = 1; t < num_threads; ++t) {
            workers.emplace_back(cpuPhase, std::ref(actors), std::ref(outputs),
                                 std::ref(next_actor), std::ref(stats));
        }
        cpuPhase(actors, outputs, next_actor, stats);
        for (auto& w : workers) { w.join(); }
        if (az->getBatchSize() > 0) { outputs = az->forward(); }
    };

    // warmup: let libtorch pick kernels + fill trees
    for (int k = 0; k < 40; ++k) { run_phase_pair(); }

    const long long moves0 = stats.moves.load();
    const auto t0 = std::chrono::steady_clock::now();
    double elapsed = 0.0;
    long long phases = 0;
    while (elapsed < seconds) {
        run_phase_pair();
        ++phases;
        elapsed = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    }
    const long long moves = stats.moves.load() - moves0;

    const double env_steps_per_s = moves / elapsed;
    std::cout << "{\"metric\": \"reference_selfplay_env_steps_per_s\", "
              << "\"value\": " << env_steps_per_s << ", "
              << "\"unit\": \"env-steps/s\", "
              << "\"detail\": {\"seconds\": " << elapsed
              << ", \"moves\": " << moves
              << ", \"phase_pairs\": " << phases
              << ", \"actors\": " << num_actors
              << ", \"threads\": " << num_threads
              << ", \"finished_games\": " << stats.games.load()
              << ", \"sims_per_move\": " << config::actor_num_simulation
              << ", \"device\": \"cpu\"}}" << std::endl;
    return 0;
}
