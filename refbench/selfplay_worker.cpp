// Reference (rlglab/minizero) self-play RECORD generator on CPU — the
// self-play half of the cross-framework head-to-head (VERDICT r3 #8).
//
// Same two-phase lock-step loop as main.cpp (replicating the reference's
// ActorGroup, actor/actor_group.cpp:72-148, whose real implementation
// asserts >=1 CUDA device), but instead of timing it, plays a fixed number
// of games and writes each finished game's record — the exact string the
// reference's ZeroServer appends to sgf/<iter>.sgf (actor->getRecord() +
// " #", zero_server.cpp:213, actor_group.cpp:24-50) — so the reference's
// own DataLoader/train.py consume it unchanged.
//
// Usage: selfplay_worker <model.pt> <num_games> <out_sgf> <conf_str> [threads]

#include "alphazero_network.h"
#include "configuration.h"
#include "configure_loader.h"
#include "create_actor.h"
#include "create_network.h"
#include "environment.h"
#include "random.h"

#include <atomic>
#include <fstream>
#include <iostream>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

using namespace minizero;

namespace {

struct Shared {
    std::ofstream ofs;
    std::mutex mutex;
    std::atomic<long long> games{0};
};

void cpuPhase(std::vector<std::shared_ptr<actor::BaseActor>>& actors,
              std::vector<std::shared_ptr<network::NetworkOutput>>& outputs,
              std::atomic<int>& next_actor, Shared& shared)
{
    int i;
    const int n = static_cast<int>(actors.size());
    while ((i = next_actor.fetch_add(1)) < n) {
        auto& a = actors[i];
        int out_id = a->getNNEvaluationBatchIndex();
        if (out_id >= 0) {
            a->afterNNEvaluation(outputs[out_id]);
            if (a->isSearchDone()) {
                // SlaveThread::handleSearchDone (actor_group.cpp:117-134)
                if (!a->isResign()) { a->act(a->getSearchAction()); }
                if (a->isResign() || a->isEnvTerminal()) {
                    {
                        std::lock_guard<std::mutex> lock(shared.mutex);
                        shared.ofs << a->getRecord() << " #" << std::endl;
                    }
                    shared.games.fetch_add(1, std::memory_order_relaxed);
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
    if (argc < 5) {
        std::cerr << "usage: " << argv[0]
                  << " <model.pt> <num_games> <out_sgf> <conf_str> [threads]\n";
        return 1;
    }
    const std::string model_path = argv[1];
    const long long num_games = std::atoll(argv[2]);
    const std::string out_path = argv[3];
    const int num_threads = argc > 5 ? std::atoi(argv[5]) : 2;

    config::ConfigureLoader cl;
    config::setConfiguration(cl);
    if (!cl.loadFromString(argv[4])) {
        std::cerr << "config load failed\n";
        return 1;
    }
    env::setUpEnv();
    utils::Random::seed(config::program_seed);

    auto network = network::createNetwork(model_path, /*gpu_id=*/-1); // CPU
    auto az = std::static_pointer_cast<network::AlphaZeroNetwork>(network);
    const uint64_t tree_node_size =
        static_cast<uint64_t>(config::actor_num_simulation + 1) * network->getActionSize();

    const int num_actors = config::zero_num_parallel_games;
    std::vector<std::shared_ptr<actor::BaseActor>> actors;
    actors.reserve(num_actors);
    for (int i = 0; i < num_actors; ++i) {
        actors.emplace_back(actor::createActor(tree_node_size, network));
    }

    Shared shared;
    shared.ofs.open(out_path);
    std::vector<std::shared_ptr<network::NetworkOutput>> outputs;

    while (shared.games.load() < num_games) {
        std::atomic<int> next_actor{0};
        std::vector<std::thread> workers;
        for (int t = 1; t < num_threads; ++t) {
            workers.emplace_back(cpuPhase, std::ref(actors), std::ref(outputs),
                                 std::ref(next_actor), std::ref(shared));
        }
        cpuPhase(actors, outputs, next_actor, shared);
        for (auto& w : workers) { w.join(); }
        if (az->getBatchSize() > 0) { outputs = az->forward(); }
    }
    shared.ofs.close();
    std::cout << "{\"games\": " << shared.games.load() << ", \"file\": \""
              << out_path << "\"}" << std::endl;
    return 0;
}
