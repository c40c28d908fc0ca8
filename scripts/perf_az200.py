"""AlphaZero n=200 Go9 probe: throughput + per-op trace on the real TPU.

The large-simulation-count config is the known weak spot (CLAUDE.md: 245
env-steps/s at b=1024 vs 28.7k for gaz n=16). This probe times one
`engine.move` and optionally captures a jax.profiler trace for
tools/trace_report attribution.

    python scripts/perf_az200.py [nsim] [batch] [trace_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main(nsim=200, batch=1024, trace_dir=None):
    from minizero_tpu.config import algorithm_preset, default_config
    from minizero_tpu.envs import make_env
    from minizero_tpu.models.factory import create_network, init_network
    from minizero_tpu.selfplay.engine import SelfPlayEngine

    cfg = default_config("go", **algorithm_preset("az"))
    cfg = cfg.replace(actor_num_simulation=nsim)
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))
    engine = SelfPlayEngine(env, cfg, net)
    print("kernel v1:", engine.use_tree_kernel,
          "v2:", engine.use_tree_kernel_v2, file=sys.stderr)

    states = engine.init_batch(batch)
    rng = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    rng, k = jax.random.split(rng)
    out = engine.move(variables, states, k)
    jax.block_until_ready(out.action)
    print(f"first move (incl compile): {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # chained timing: each move consumes the previous move's states
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        rng, k = jax.random.split(rng)
        out = engine.move(variables, out.states, k)
    jax.block_until_ready(out.action)
    dt = (time.perf_counter() - t0) / reps

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            rng, k = jax.random.split(rng)
            out = engine.move(variables, out.states, k)
            jax.block_until_ready(out.action)

    print(json.dumps({
        "metric": f"selfplay_env_steps_per_s_go9_az_n{nsim}",
        "value": round(batch / dt, 1),
        "unit": "env-steps/s",
        "ms_per_move": round(dt * 1000, 2),
        "ms_per_sim": round(dt * 1000 / (nsim + 1), 3),
        "batch": batch,
    }))


if __name__ == "__main__":
    nsim = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    trace_dir = sys.argv[3] if len(sys.argv) > 3 else None
    main(nsim, batch, trace_dir)
