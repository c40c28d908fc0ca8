"""Trainer-step probe on the real TPU (Go9 gaz headline config, batch 1024).

Per ZeroLoop iteration the reference recipe runs 500 optimizer steps
(configuration.cpp:44); at the measured self-play rate (~30k env-steps/s)
training dominates the iteration wall-clock, so the train step's device
time is a first-class metric.

    python scripts/perf_train.py [batch] [reps]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp


def main(batch=1024, reps=20):
    from minizero_tpu.config import algorithm_preset, default_config
    from minizero_tpu.envs import make_env
    from minizero_tpu.learner.train import init_train_state, make_train_step
    from minizero_tpu.models.factory import create_network, init_network

    cfg = default_config("go", **algorithm_preset("gaz"))
    cfg = cfg.replace(learner_batch_size=batch)
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))
    state = init_train_state(cfg, variables)
    step = jax.jit(make_train_step(cfg, env, net))

    h, w, c = env.spec.input_height, env.spec.input_width, env.spec.num_input_channels
    a = env.spec.action_size
    rng = jax.random.PRNGKey(1)
    batch_data = {
        "features": jax.random.uniform(rng, (batch, h, w, c), jnp.float32),
        "policy": jax.nn.softmax(jax.random.normal(rng, (batch, a))),
        "value": jax.random.uniform(rng, (batch, 1), minval=-1.0, maxval=1.0),
        "loss_scale": jnp.ones((batch,), jnp.float32),
    }
    state, metrics = step(state, batch_data, rng)
    jax.block_until_ready(metrics["loss"])

    @jax.jit
    def chain(state, rng, batch_data):
        def body(i, carry):
            state, rng = carry
            rng, k = jax.random.split(rng)
            state, _ = step(state, batch_data, k)
            return (state, rng)
        state, rng = jax.lax.fori_loop(0, reps, body, (state, rng))
        # scalar fingerprint forces the whole chain to materialise
        fp = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(state.params))
        return state, rng, fp

    out = chain(state, rng, batch_data)
    float(out[2])
    t0 = time.perf_counter()
    out = chain(out[0], out[1], batch_data)
    float(out[2])
    dt = (time.perf_counter() - t0) / reps
    import json
    print(json.dumps({"metric": "train_step_ms_go9_gaz", "value": round(dt*1e3, 2),
                      "unit": "ms/step", "batch": batch,
                      "steps_per_s": round(1.0/dt, 1)}))


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    main(b, r)
