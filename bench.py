"""Self-play throughput benchmark — Go 9x9 Gumbel AlphaZero (the reference's
headline config: n=16 simulations, 1 block x 256 channels, README.md:179-194).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric: self-play env-steps/s on one chip (BASELINE.md north star).
``vs_baseline`` divides by an estimated reference throughput of 1000
env-steps/s for one MiniZero GPU worker (64 parallel games, C++ MCTS + batched
TorchScript inference on an RTX A5000-class GPU; the reference publishes no
throughput numbers — BASELINE.md — so this denominator is an engineering
estimate, documented here and held fixed across rounds for comparability).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: remote (tunnel) compiles of the fused engine
# take ~13 min per shape — cache them across processes
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

REFERENCE_ENV_STEPS_PER_S = 1000.0  # estimated reference GPU worker (see above)


def main(batch_size: int = 1024, measure_moves: int = 12) -> None:
    # round-1 sweep on the real chip: 512 -> 2992, 1024 -> 3790,
    # 2048 -> 3884 env-steps/s; 1024 is the knee (2048 costs 2x latency
    # for +2.5%)
    from minizero_tpu.config import algorithm_preset, default_config
    from minizero_tpu.envs import make_env
    from minizero_tpu.models.factory import create_network, init_network
    from minizero_tpu.selfplay.engine import SelfPlayEngine

    cfg = default_config("go", **algorithm_preset("gaz"))
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))
    engine = SelfPlayEngine(env, cfg, net)

    states = engine.init_batch(batch_size)
    rng = jax.random.PRNGKey(0)

    # warmup / compile (move_scan = the collection loop's real dispatch unit:
    # M moves + in-scan resets per device call)
    rng, k = jax.random.split(rng)
    _, states, enable, msr = engine.move_scan(variables, states, k, 1.0, measure_moves)
    jax.block_until_ready(jax.tree_util.tree_leaves(states)[0])

    chunks = 3
    t0 = time.perf_counter()
    for _ in range(chunks):
        rng, k = jax.random.split(rng)
        _, states, enable, msr = engine.move_scan(
            variables, states, k, 1.0, measure_moves, enable, msr)
    jax.block_until_ready(jax.tree_util.tree_leaves(states)[0])
    dt = time.perf_counter() - t0
    measure_moves *= chunks

    env_steps_per_s = batch_size * measure_moves / dt
    sims_per_s = env_steps_per_s * (cfg.actor_num_simulation + 1)
    games_per_hour = env_steps_per_s / 110.0 * 3600.0  # ~110 moves per 9x9 game

    print(
        json.dumps(
            {
                "metric": "selfplay_env_steps_per_s_go9_gaz_1chip",
                "value": round(env_steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(env_steps_per_s / REFERENCE_ENV_STEPS_PER_S, 3),
                "detail": {
                    "batch_games": batch_size,
                    "moves_timed": measure_moves,
                    "seconds": round(dt, 3),
                    "mcts_sims_per_s": round(sims_per_s, 1),
                    "est_games_per_hour": round(games_per_hour, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    main(batch_size=bs)
