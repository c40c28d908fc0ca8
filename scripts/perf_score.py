"""Microbenchmark: Go eval_score under lax.cond vs unconditional.

The ablation showed the per-sim `lax.cond(any(terminal), eval_score, zeros)`
guard costs ~18ms per move (~1.1ms per sim) even when no lane is terminal —
TPU conds break the static schedule. Compare: cond-guarded vs unconditional
vs none, 16x in a fori_loop at B=1024.

    python scripts/perf_score.py
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

from minizero_tpu.config import algorithm_preset, default_config
from minizero_tpu.envs import make_env

B, SIMS = 1024, 16


def bench(name, fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(json.dumps({"probe": name, "ms": round(ms, 3)}), flush=True)


def main():
    cfg = default_config("go", **algorithm_preset("gaz"))
    env = make_env(cfg)
    states = jax.vmap(lambda _: env.init())(jnp.arange(B))
    term = jnp.zeros((B,), bool)  # steady-state mid-game: nothing terminal

    def scores_cond(states, term):
        return jax.lax.cond(
            jnp.any(term),
            lambda s: jax.vmap(env.eval_score)(s),
            lambda s: jnp.zeros((B,), jnp.float32),
            states,
        )

    def scores_always(states, term):
        return jnp.where(term, jax.vmap(env.eval_score)(states), 0.0)

    def scores_select_zero(states, term):
        # unconditional compute but on a zeroed board when not needed —
        # no savings expected; sanity row
        return jax.vmap(env.eval_score)(states) * term

    def loop(score_fn):
        @jax.jit
        def run(states, term):
            def sim(s, acc):
                return acc + score_fn(states, term)
            return jax.lax.fori_loop(0, SIMS, sim, jnp.zeros((B,), jnp.float32))
        return run

    bench("score_cond_16x", loop(scores_cond), states, term)
    bench("score_always_16x", loop(scores_always), states, term)
    bench("score_mask_16x", loop(scores_select_zero), states, term)
    bench("score_none_16x", loop(lambda s, t: jnp.zeros((B,), jnp.float32)), states, term)


if __name__ == "__main__":
    main()
