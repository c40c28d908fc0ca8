// Env feature probe: applies a sequence of action IDs to the reference env
// and prints the feature checksum (twin of tests/parity_common.py
// feature_checksum) + turn + terminal after EVERY action. Used to bisect
// feature/state divergences found by the parity harness.
//
// Usage: env_probe <conf_str> <action_id> [action_id...]
#include "configuration.h"
#include "configure_loader.h"
#include "environment.h"

#include <cstdint>
#include <cstdlib>
#include <iostream>
#include <vector>

using namespace minizero;

static long long featChecksum(const std::vector<float>& f)
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

int main(int argc, char** argv)
{
    config::ConfigureLoader cl;
    config::setConfiguration(cl);
    if (argc > 1 && std::string(argv[1]) != "-" && !cl.loadFromString(argv[1])) {
        std::cerr << "config load failed\n";
        return 1;
    }
    env::setUpEnv();
    Environment env;
    env.reset();
    std::cout << "start fsum " << featChecksum(env.getFeatures())
              << " turn " << static_cast<int>(env.getTurn()) << "\n";
    for (int i = 2; i < argc; ++i) {
        const int id = std::atoi(argv[i]);
        const bool ok = env.act(Action(id, env.getTurn()));
        std::cout << "after " << id << (ok ? "" : " (ILLEGAL)")
                  << " fsum " << featChecksum(env.getFeatures())
                  << " turn " << static_cast<int>(env.getTurn())
                  << " terminal " << (env.isTerminal() ? 1 : 0) << "\n";
    }
    std::cout << "legal:";
    for (int id = 0; id < env.getPolicySize(); ++id) {
        if (env.isLegalAction(Action(id, env.getTurn()))) { std::cout << " " << id; }
    }
    std::cout << "\n";
    return 0;
}
