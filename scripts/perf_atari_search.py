"""Atari MuZero device-search probe on the real TPU.

Times one full batched search (initial inference + n recurrent simulations
through the dynamics net + action decision) of the Atari headline configs
(mz n=50 / gmz n=18, README.md:188-194) with random weights and random
observations — the per-move device cost of the host-engine loop.

    python scripts/perf_atari_search.py [alg] [batch] [reps]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp


def main(alg="mz", batch=256, reps=8):
    from minizero_tpu.config import algorithm_preset, default_config
    from minizero_tpu.envs.atari import FakeALE, AtariVecEnv
    from minizero_tpu.models.factory import create_network, init_network
    from minizero_tpu.selfplay.engine import search_spec_from_config
    from minizero_tpu.selfplay.muzero_search import make_muzero_search

    cfg = default_config("atari", **algorithm_preset(alg))
    vec = AtariVecEnv(1, ale_factory=lambda s: FakeALE(seed=s, length=24))
    env_spec = vec.spec
    spec = search_spec_from_config(cfg, env_spec)
    net = create_network(cfg, env_spec)
    variables = init_network(net, env_spec, jax.random.PRNGKey(0))
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)
    c = env_spec.num_action_feature_channels

    def action_features(action):
        onehot = (jnp.arange(env_spec.action_size) == action).astype(jnp.float32)
        return jnp.broadcast_to(
            onehot[None, None, :],
            (env_spec.hidden_height, env_spec.hidden_width, c))

    search = make_muzero_search(
        net, spec, action_features, env_spec.num_players,
        discrete_value=env_spec.discrete_value_size > 1,
        compute_dtype=jnp.bfloat16)
    sj = jax.jit(lambda v, f, l, t, r: search(v, f, l, t, r, 1.0))

    def chain_impl(v, f, l, t, r, n):
        def body(i, carry):
            f, r, _ = carry
            r, k = jax.random.split(r)
            res = search(v, f, l, t, k, 1.0)
            bump = res.action.astype(jnp.float32)[:, None, None, None] * 1e-6
            return (f + bump, r, res.action)
        f, r, act = jax.lax.fori_loop(0, n, body, (f, r, t))
        return act

    chain = jax.jit(chain_impl, static_argnums=5)

    h = (env_spec.input_height, env_spec.input_width,
         env_spec.num_input_channels)
    feats = jax.random.uniform(jax.random.PRNGKey(1), (batch,) + h)
    legal = jnp.ones((batch, env_spec.action_size), bool)
    turns = jnp.ones((batch,), jnp.int32)
    rng = jax.random.PRNGKey(2)

    t0 = time.perf_counter()
    res = sj(variables, feats, legal, turns, rng)
    jax.block_until_ready(res.action)
    print(f"first search (incl compile): {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    # chain reps INSIDE one jit: per-call host timing over the tunnel
    # measures RTT, not device time (CLAUDE.md)
    act = jax.block_until_ready(chain(variables, feats, legal, turns, rng, reps))
    t0 = time.perf_counter()
    act = jax.block_until_ready(chain(variables, feats, legal, turns, rng, reps))
    dt = (time.perf_counter() - t0) / reps
    trace_dir = os.environ.get("MZ_TRACE_DIR")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            rng, k = jax.random.split(rng)
            res = sj(variables, feats, legal, turns, k)
            jax.block_until_ready(res.action)
    import json
    print(json.dumps({
        "metric": f"atari_{alg}_search_ms", "value": round(dt*1e3, 2),
        "unit": "ms/search", "batch": batch,
        "nsim": int(cfg.actor_num_simulation),
    }))


if __name__ == "__main__":
    alg = sys.argv[1] if len(sys.argv) > 1 else "mz"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    main(alg, batch, reps)
