"""Self-play / training profiling (SURVEY §5.1).

The reference has only wall-clock instrumentation (per-move think time,
``console.cpp:160-163``; per-phase log mining, ``tools/analysis.py:75-87``).
Here profiling is first-class: this tool drives the fused self-play engine
and the train step under ``jax.profiler.trace`` (XPlane dump viewable in
TensorBoard/Perfetto) and prints compile vs steady-state wall times per
phase as one JSON line per phase.

    python -m minizero_tpu.tools.profile -conf_str env_name=go:... \
        -moves 16 -trace_dir /tmp/mz_trace
"""

from __future__ import annotations

import json
import time


def profile_selfplay(cfg, moves: int = 16, batch: int = 64, trace_dir: str = "",
                     train_steps: int = 4) -> list:
    import jax
    import numpy as np

    from minizero_tpu.envs import make_env
    from minizero_tpu.models.factory import create_network, init_network
    from minizero_tpu.selfplay.engine import SelfPlayEngine

    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))
    engine = SelfPlayEngine(env, cfg, net)
    rng = jax.random.PRNGKey(1)
    rng, k = jax.random.split(rng)
    states = engine.init_batch(batch, k)

    rows = []

    def record(phase, seconds, extra=None):
        row = {"phase": phase, "seconds": round(seconds, 4)}
        if extra:
            row.update(extra)
        rows.append(row)
        print(json.dumps(row), flush=True)

    # compile (first move traces + compiles every jitted piece)
    t0 = time.time()
    rng, k = jax.random.split(rng)
    out = engine.move(variables, states, k)
    jax.block_until_ready(out.action)
    record("selfplay_compile", time.time() - t0)
    states = out.states

    ctx = jax.profiler.trace(trace_dir) if trace_dir else None
    if ctx:
        ctx.__enter__()
    t0 = time.time()
    for _ in range(moves):
        rng, k = jax.random.split(rng)
        out = engine.move(variables, states, k)
        states = out.states
    jax.block_until_ready(out.action)
    dt = time.time() - t0
    record("selfplay_steady", dt, {
        "moves": moves, "batch": batch,
        "env_steps_per_sec": round(moves * batch / dt, 1),
        "sims_per_sec": round(moves * batch * cfg.actor_num_simulation / dt, 1),
    })

    # train step
    from minizero_tpu.learner.replay import GameRecord, ReplayBuffer
    from minizero_tpu.learner.train import init_train_state, make_train_step

    buf = ReplayBuffer(cfg, env.spec)
    spec = env.spec
    n = min(spec.max_game_length, 32)
    buf.add_game(GameRecord(
        actions=np.zeros(n, np.int32),
        policy=np.full((n, spec.action_size), 1.0 / spec.action_size, np.float16),
        values=np.zeros(n, np.float32),
        rewards=np.zeros(n, np.float32),
        features=np.zeros((n, spec.input_height, spec.input_width, spec.num_input_channels), np.uint8),
        result=0.0,
    ))
    state = init_train_state(cfg, variables)
    step = jax.jit(make_train_step(cfg, env, net), donate_argnums=0)
    np_rng = np.random.RandomState(0)
    sample = (buf.sample_muzero if cfg.nn_type_name.lower() != "alphazero"
              else buf.sample_alphazero)

    def one(rng_key):
        batch_data = sample(cfg.learner_batch_size, np_rng)
        batch_data.pop("sampled_index")
        import jax.numpy as jnp

        batch_data = {k2: jnp.asarray(v) for k2, v in batch_data.items()}
        batch_data["features"] = batch_data["features"].astype(jnp.float32)
        return step(state, batch_data, rng_key)

    t0 = time.time()
    rng, k = jax.random.split(rng)
    state, metrics = one(k)
    jax.block_until_ready(metrics["loss"])
    record("train_compile", time.time() - t0)
    t0 = time.time()
    for _ in range(train_steps):
        rng, k = jax.random.split(rng)
        state, metrics = one(k)
    jax.block_until_ready(metrics["loss"])
    dt = time.time() - t0
    record("train_steady", dt, {
        "steps": train_steps,
        "steps_per_sec": round(train_steps / dt, 2),
        "samples_per_sec": round(train_steps * cfg.learner_batch_size / dt, 1),
    })
    if ctx:
        ctx.__exit__(None, None, None)
        print(json.dumps({"trace_dir": trace_dir}), flush=True)
    return rows


def main(argv=None) -> int:
    import argparse

    parser = argparse.ArgumentParser(description="minizero_tpu profiler")
    parser.add_argument("-conf_file", default="")
    parser.add_argument("-conf_str", default="")
    parser.add_argument("-moves", type=int, default=16)
    parser.add_argument("-batch", type=int, default=64)
    parser.add_argument("-train_steps", type=int, default=4)
    parser.add_argument("-trace_dir", default="")
    parser.add_argument("-platform", default="")
    args = parser.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from minizero_tpu.__main__ import build_config

    cfg = build_config(args)
    profile_selfplay(cfg, moves=args.moves, batch=args.batch,
                     trace_dir=args.trace_dir, train_steps=args.train_steps)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
