"""In-jit move-time attribution by ablation: compile the REAL fused engine
with named sim-loop pieces skipped and time engine.move. Unlike op-level
probes, this measures what the pieces cost inside the single compiled move
(XLA fusion, loop in-placing and layout effects included).

    python scripts/perf_ablate.py            # full move
    python scripts/perf_ablate.py step       # env.step skipped
    python scripts/perf_ablate.py select halving   # multiple pieces
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main(ablate, batch=1024, reps=12):
    from minizero_tpu.config import algorithm_preset, default_config
    from minizero_tpu.envs import make_env
    from minizero_tpu.models.factory import create_network, init_network
    from minizero_tpu.selfplay.engine import SelfPlayEngine

    cfg = default_config("go", **algorithm_preset("gaz"))
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))
    engine = SelfPlayEngine(env, cfg, net, _ablate=tuple(ablate))
    states = engine.init_batch(batch)
    rng = jax.random.PRNGKey(0)
    rng, k = jax.random.split(rng)
    out = engine.move(variables, states, k)
    jax.block_until_ready(out.action)
    states = out.states
    t0 = time.perf_counter()
    for _ in range(reps):
        rng, k = jax.random.split(rng)
        out = engine.move(variables, states, k)
        states = out.states
    jax.block_until_ready(out.action)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(json.dumps({"ablate": sorted(ablate), "move_ms": round(ms, 2), "batch": batch}))


if __name__ == "__main__":
    main(sys.argv[1:])
