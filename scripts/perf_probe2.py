"""Single-metric probe (one measurement per process: on the axon backend,
dispatch timings after the first workload in a process are inflated ~3 ms,
so each metric must run in a fresh interpreter)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main(which, batch=1024):
    from minizero_tpu.config import algorithm_preset, default_config
    from minizero_tpu.envs import make_env

    cfg = default_config("go", **algorithm_preset("gaz"))
    env = make_env(cfg)
    states = jax.vmap(lambda _: env.init())(jnp.arange(batch))
    acts = jnp.zeros((batch,), jnp.int32)

    fns = {}
    fns["step"] = jax.jit(lambda s: jax.vmap(env.step)(s, acts))
    fns["features"] = jax.jit(lambda s: jax.vmap(env.features)(s))
    fns["aggregates"] = jax.jit(lambda s: jax.vmap(env._block_aggregates)(s.board, s.labels))

    def legal(s):
        lib_at, onehot, chunks = jax.vmap(env._block_aggregates)(s.board, s.labels)
        return jax.vmap(env._legal_mask_for)(
            s.board, s.labels, lib_at, onehot, chunks, s.turn,
            s.hash_a, s.hash_b, s.history_a, s.history_b, s.num_moves)

    fns["legal"] = jax.jit(legal)

    nn = env.nn

    def onehot_of(board, labels):
        occupied = board > 0
        return ((labels[None, :] == jnp.arange(nn, dtype=jnp.int32)[:, None]) & occupied[None, :]).astype(jnp.bfloat16)

    def agg_onehot(s):
        return jax.vmap(onehot_of)(s.board, s.labels)

    def agg_reach(s):
        def f(board, labels):
            oh = onehot_of(board, labels)
            return jnp.dot(oh, env._adj_bf16, preferred_element_type=jnp.float32)
        return jax.vmap(f)(s.board, s.labels)

    def agg_lib(s):
        def f(board, labels):
            oh = onehot_of(board, labels)
            reach = jnp.dot(oh, env._adj_bf16, preferred_element_type=jnp.float32)
            empty_f = (board == 0).astype(jnp.float32)
            lib_count = jnp.sum(jnp.where(reach > 0, empty_f[None, :], 0.0), axis=1)
            lib_pad = jnp.concatenate([lib_count, jnp.zeros((1,))])
            return jnp.where(board > 0, lib_pad[jnp.clip(labels, 0, nn)], 0.0).astype(jnp.int32)
        return jax.vmap(f)(s.board, s.labels)

    def agg_chunks(s):
        def f(board, labels):
            oh = onehot_of(board, labels)
            colour = jnp.clip(board.astype(jnp.int32) - 1, 0, 1)
            pos = jnp.arange(nn)
            chunks = jnp.where((board > 0)[:, None], env._key_chunks[pos, colour], 0.0).astype(jnp.bfloat16)
            return jnp.dot(oh, chunks, preferred_element_type=jnp.float32)
        return jax.vmap(f)(s.board, s.labels)

    fns["agg_onehot"] = jax.jit(agg_onehot)
    fns["agg_reach"] = jax.jit(agg_reach)
    fns["agg_lib"] = jax.jit(agg_lib)
    fns["agg_chunks"] = jax.jit(agg_chunks)
    fn = fns[which]

    out = fn(states)
    jax.block_until_ready(out)
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(states)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(json.dumps({which + "_ms": round(ms, 3), "batch": batch}))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1024)
