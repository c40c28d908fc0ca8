// Reference-parity dump driver (VERDICT round-1 item #1).
//
// Drives the reference's REAL ZeroActor + MCTS/GumbelZero + env classes
// (compiled in place from /root/reference by build_parity.sh) through
// deterministic games — no dirichlet/gumbel noise, no rotation, argmax
// action select, fixed pseudo-random openings — evaluating the parity
// network (refbench/gen_parity_model.py), and dumps per-move root
// visit-count distributions, chosen actions, root values, and policy
// target strings as JSONL. tests/test_reference_parity.py replays the
// same games on the TPU-native engine and compares.
//
// Usage: parity_dump <model.pt> <out.jsonl> <games> <max_moves> <opening_stride> [conf]

#include "alphazero_network.h"
#include "muzero_network.h"
#include "configuration.h"
#include "configure_loader.h"
#include "create_actor.h"
#include "create_network.h"
#include "environment.h"
#include "mcts.h"
#include "random.h"
#include "zero_actor.h"

#include <cstdint>
#include <cstdlib>
#include <fstream>
#include <iostream>
#include <memory>
#include <string>
#include <vector>

using namespace minizero;

namespace {

// twin of tests/parity_common.py opening_actions()
uint64_t openingDraw(int g, int j)
{
    uint64_t s = static_cast<uint64_t>(g) * 1000003ULL + static_cast<uint64_t>(j) * 7919ULL + 12345ULL;
    s = s * 6364136223846793005ULL + 1442695040888963407ULL;
    s = s * 6364136223846793005ULL + 1442695040888963407ULL;
    return s >> 33;
}

// twin of tests/parity_common.py feature_checksum()
long long featChecksum(const std::vector<float>& f)
{
    long long cs = 0;
    for (size_t i = 0; i < f.size(); ++i) {
        if (f[i] != 0.0f) {
            uint64_t h = (static_cast<uint64_t>(i) * 2654435761ULL) >> 7;
            cs += static_cast<long long>(h % 251ULL) - 125;
        }
    }
    return cs;
}

// recursive dump of every visited node: "path|count|mean|value;..."
void dumpTree(actor::MCTSNode* node, std::string path, std::ostringstream& oss)
{
    for (int i = 0; i < node->getNumChildren(); ++i) {
        actor::MCTSNode* child = node->getChild(i);
        if (child->getCount() == 0) { continue; }
        std::string cpath = path.empty()
                                ? std::to_string(child->getAction().getActionID())
                                : path + "/" + std::to_string(child->getAction().getActionID());
        oss << (oss.str().empty() ? "" : ";") << cpath << "|" << child->getCount()
            << "|" << child->getMean() << "|" << child->getValue();
        dumpTree(child, cpath, oss);
    }
}

} // namespace

int main(int argc, char** argv)
{
    if (argc < 6) {
        std::cerr << "usage: " << argv[0]
                  << " <model.pt> <out.jsonl> <games> <max_moves> <opening_stride> [conf]\n";
        return 1;
    }
    const std::string model_path = argv[1];
    const std::string out_path = argv[2];
    const int num_games = std::atoi(argv[3]);
    const int max_moves = std::atoi(argv[4]);
    const int opening_stride = std::atoi(argv[5]);

    config::ConfigureLoader cl;
    config::setConfiguration(cl);
    std::string conf =
        "program_auto_seed=false:program_seed=7:"
        "actor_use_random_rotation_features=false:"
        "actor_use_dirichlet_noise=false:"
        "actor_use_gumbel_noise=false:"
        "actor_select_action_by_softmax_count=false:"
        "actor_select_action_by_count=true:"
        "zero_disable_resign_ratio=1";
    if (!cl.loadFromString(conf)) {
        std::cerr << "config load failed\n";
        return 1;
    }
    if (argc > 6 && !cl.loadFromString(argv[6])) {
        std::cerr << "extra config load failed\n";
        return 1;
    }
    env::setUpEnv();
    utils::Random::seed(config::program_seed);

    auto network = network::createNetwork(model_path, /*gpu_id=*/-1);
    const bool is_muzero = (network->getNetworkTypeName().rfind("muzero", 0) == 0);
    std::shared_ptr<network::AlphaZeroNetwork> az;
    std::shared_ptr<network::MuZeroNetwork> mz;
    if (is_muzero) {
        mz = std::static_pointer_cast<network::MuZeroNetwork>(network);
    } else {
        az = std::static_pointer_cast<network::AlphaZeroNetwork>(network);
    }
    const uint64_t tree_node_size =
        static_cast<uint64_t>(config::actor_num_simulation + 1) * network->getActionSize();
    auto actor = std::static_pointer_cast<actor::ZeroActor>(
        actor::createActor(tree_node_size, network));
    const int action_size = network->getActionSize();

    std::ofstream out(out_path);
    for (int g = 0; g < num_games; ++g) {
        actor->reset();
#if ATARI
        // fixed per-game console seed so the python side can rebuild the
        // same stub-ALE episode (AtariEnv::reset draws a random seed
        // otherwise, atari.h:54)
        actor->getEnvironment().reset(1000 + g);
#endif
        const int opening_len = opening_stride * g;
        for (int j = 0; j < opening_len; ++j) {
            auto& env = actor->getEnvironment();
            if (env.isTerminal()) { break; }
            std::vector<int> legal_ids;
            for (int id = 0; id < action_size; ++id) {
                if (env.isLegalAction(Action(id, env.getTurn()))) { legal_ids.push_back(id); }
            }
            const int pick = legal_ids[openingDraw(g, j) % legal_ids.size()];
            actor->act(Action(pick, env.getTurn()));
            out << "{\"game\": " << g << ", \"type\": \"opening\", \"move\": " << j
                << ", \"action\": " << pick << ", \"n_legal\": " << legal_ids.size() << "}\n";
        }
        int move = 0;
        while (!actor->getEnvironment().isTerminal() && move < max_moves) {
            const int turn = static_cast<int>(actor->getEnvironment().getTurn());
            const long long fsum = featChecksum(actor->getEnvironment().getFeatures());
            actor->resetSearch();
            const char* dbg_sims = std::getenv("PARITY_DEBUG_SIMS");
            int sim_no = 0;
            while (!actor->isSearchDone()) {
                actor->beforeNNEvaluation();
                // MuZero: root sim uses initial inference, interiors recurrent
                // (reference ZeroActor::beforeNNEvaluation, zero_actor.cpp:58-68)
                auto outputs = is_muzero
                                   ? (actor->getMCTS()->getNumSimulation() == 0
                                          ? mz->initialInference()
                                          : mz->recurrentInference())
                                   : az->forward();
                actor->afterNNEvaluation(outputs[actor->getNNEvaluationBatchIndex()]);
                if (dbg_sims && g == 0 && move == std::atoi(dbg_sims)) {
                    std::ostringstream oss;
                    dumpTree(actor->getMCTS()->getRootNode(), "", oss);
                    std::cerr << "sim " << sim_no << ": " << oss.str() << "\n";
                }
                ++sim_no;
            }
            actor::MCTSNode* root = actor->getMCTS()->getRootNode();
            std::ostringstream counts;
            for (int i = 0; i < root->getNumChildren(); ++i) {
                actor::MCTSNode* child = root->getChild(i);
                if (child->getCount() == 0) { continue; }
                counts << (counts.str().empty() ? "" : ",")
                       << child->getAction().getActionID() << ":" << child->getCount()
                       << ":" << child->getMean();
            }
            std::ostringstream tree_oss;
            dumpTree(root, "", tree_oss);
            // debug hook: PARITY_DEBUG_MOVE=<move> PARITY_DEBUG_PATH=a/b/c
            // prints that node's full child table (hexfloat) to stderr
            const char* dbg_move = std::getenv("PARITY_DEBUG_MOVE");
            const char* dbg_path = std::getenv("PARITY_DEBUG_PATH");
            if (dbg_move && dbg_path && g == 0 && move == std::atoi(dbg_move)) {
                actor::MCTSNode* n = root;
                std::string rest(dbg_path);
                while (!rest.empty() && n) {
                    size_t slash = rest.find('/');
                    int want = std::atoi(rest.substr(0, slash).c_str());
                    rest = (slash == std::string::npos) ? "" : rest.substr(slash + 1);
                    actor::MCTSNode* next = nullptr;
                    for (int i = 0; i < n->getNumChildren(); ++i) {
                        if (n->getChild(i)->getAction().getActionID() == want) { next = n->getChild(i); break; }
                    }
                    n = next;
                }
                if (n) {
                    std::cerr << "debug node " << dbg_path << " count " << n->getCount()
                              << " children:\n" << std::hexfloat;
                    for (int i = 0; i < n->getNumChildren(); ++i) {
                        actor::MCTSNode* c = n->getChild(i);
                        std::cerr << "  [" << i << "] a" << c->getAction().getActionID()
                                  << " p " << c->getPolicy() << " logit " << c->getPolicyLogit()
                                  << " count " << c->getCount() << "\n";
                    }
                    std::cerr << std::defaultfloat;
                }
            }
            const int sel = actor->getSearchAction().getActionID();
            actor->act(actor->getSearchAction());
            const auto& info = actor->getActionInfoHistory().back();
            std::string policy_str, value_str;
            for (const auto& kv : info) {
                if (kv.first == "P") { policy_str = kv.second; }
                if (kv.first == "V") { value_str = kv.second; }
            }
            out << "{\"game\": " << g << ", \"type\": \"move\", \"move\": " << move
                << ", \"turn\": " << turn
                << ", \"fsum\": " << fsum
                << ", \"action\": " << sel
                << ", \"root_count\": " << root->getCount()
                << ", \"root_mean\": " << root->getMean()
                << ", \"root_value\": " << root->getValue()
                << ", \"counts\": \"" << counts.str() << "\""
                << ", \"tree\": \"" << tree_oss.str() << "\""
                << ", \"policy\": \"" << policy_str << "\""
                << ", \"value\": \"" << value_str << "\"}\n";
            ++move;
        }
        const bool terminal = actor->getEnvironment().isTerminal();
        out << "{\"game\": " << g << ", \"type\": \"end\", \"terminal\": " << (terminal ? "true" : "false")
            << ", \"moves\": " << move
            << ", \"eval_score\": " << (terminal ? actor->getEnvironment().getEvalScore() : 0.0f) << "}\n";
    }
    out.close();
    std::cout << "wrote " << out_path << std::endl;
    return 0;
}
