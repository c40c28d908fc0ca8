"""Component-level timing probe for the Go9 gumbel self-play hot path.

Times, on the current backend, for the bench config (Go 9x9 gaz, b=1024):
net forward, vmapped env.step, vmapped features+legal, and the full fused
engine.move — to attribute the per-move budget before optimizing.
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


def timeit(fn, *args, reps=8, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main(batch=1024):
    from minizero_tpu.config import algorithm_preset, default_config
    from minizero_tpu.envs import make_env
    from minizero_tpu.models.factory import create_network, init_network
    from minizero_tpu.selfplay.engine import SelfPlayEngine

    cfg = default_config("go", **algorithm_preset("gaz"))
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))
    engine = SelfPlayEngine(env, cfg, net)
    states = engine.init_batch(batch)
    rng = jax.random.PRNGKey(0)

    spec = env.spec
    feats = jnp.zeros((batch, spec.input_height, spec.input_width, spec.num_input_channels), jnp.bfloat16)
    bf16_vars = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        variables,
    )

    @jax.jit
    def fwd(v, f):
        return net.apply(v, f, train=False)["policy"]

    @jax.jit
    def step_all(s):
        return jax.vmap(env.step)(s, jnp.zeros((batch,), jnp.int32))

    @jax.jit
    def featurize(s):
        return jax.vmap(env.features)(s), jax.vmap(env.legal_mask)(s)

    results = {}
    results["net_forward_ms"] = timeit(fwd, bf16_vars, feats) * 1e3
    results["env_step_ms"] = timeit(step_all, states) * 1e3
    results["featurize_ms"] = timeit(featurize, states) * 1e3

    def move(s, k):
        return engine.move(variables, s, k)

    rng, k = jax.random.split(rng)
    out = move(states, k)  # compile
    jax.block_until_ready(out.action)
    t0 = time.perf_counter()
    reps = 6
    s = out.states
    for _ in range(reps):
        rng, k = jax.random.split(rng)
        out = move(s, k)
        s = out.states
    jax.block_until_ready(out.action)
    results["engine_move_ms"] = (time.perf_counter() - t0) / reps * 1e3

    n_sim = cfg.actor_num_simulation
    results["sims"] = n_sim
    results["batch"] = batch
    results["net_share_of_move"] = round(results["net_forward_ms"] * (n_sim + 1) / results["engine_move_ms"], 3)
    results["env_step_share"] = round(results["env_step_ms"] * (n_sim + 1) / results["engine_move_ms"], 3)
    results = {k2: (round(v, 3) if isinstance(v, float) else v) for k2, v in results.items()}
    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
