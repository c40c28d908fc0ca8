"""Third-stage attribution: why do select/halving/embedding-gather all cost
~29ms per 16 sims (perf_select2) when raw gathers cost 0.1ms (perf_select)?

Hypotheses:
  H1 fixed per-executable-call overhead with a large input pytree (tunnel
     marshalling of ~45 buffers incl. 50MB embeddings)
  H2 the [B,A]-indexed gather-of-gather pattern (visits[cidx_row]) is slow
  H3 something in the Tree layout (many small buffers) defeats XLA

    python scripts/perf_select3.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from minizero_tpu.config import algorithm_preset, default_config
from minizero_tpu.envs import make_env
from minizero_tpu.search import gumbel as gz
from minizero_tpu.search import mcts
from minizero_tpu.selfplay.engine import search_spec_from_config

B, SIMS = 1024, 16


def bench(name, fn, *args, reps=40):
    # pipelined timing: issue all reps without blocking (device executes
    # back-to-back), block once at the end — per-call tunnel RTT (which
    # fluctuates 0.1-30ms between runs) amortizes away
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs[-1])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(json.dumps({"probe": name, "ms": round(ms, 3)}), flush=True)


def main():
    cfg = default_config("go", **algorithm_preset("gaz"))
    env = make_env(cfg)
    spec = search_spec_from_config(cfg, env.spec)
    A, N = spec.action_size, spec.max_nodes

    @jax.jit
    def build_trees(rng):
        states = jax.vmap(lambda _: env.init())(jnp.arange(B))
        turns = jax.vmap(env.turn)(states).astype(jnp.int32)
        legal = jax.vmap(env.legal_mask)(states)
        proto = jax.tree_util.tree_map(lambda x: x[0], states)
        trees = jax.vmap(lambda t: mcts.init_tree(spec, proto, t))(turns)
        policy = jax.nn.softmax(jax.random.normal(rng, (B, A)))
        zeros_i = jnp.zeros((B,), jnp.int32)
        trees = jax.vmap(functools.partial(mcts.expand_node, spec, store_embedding=False))(
            trees, zeros_i, jnp.full((B,), -1, jnp.int32), zeros_i, turns,
            policy, jnp.log(policy + 1e-9), legal, jnp.zeros((B,), bool))
        trees = jax.vmap(functools.partial(mcts.backup, spec))(
            trees, zeros_i, jax.random.normal(rng, (B,)), jnp.zeros((B,), jnp.float32))
        trees = jax.vmap(functools.partial(gz.init_candidates, spec))(trees)
        return trees

    trees = jax.block_until_ready(build_trees(jax.random.PRNGKey(0)))

    def loop16(fn):
        @jax.jit
        def run(trees):
            def sim(s, acc):
                return acc + fn(trees, s)
            return jax.lax.fori_loop(0, SIMS, sim, jnp.zeros((B,), jnp.float32))
        return run

    # H1a: trivial body, full tree input
    bench("trivial_fulltree_16x", loop16(lambda t, s: t.visits[:, 0] + s), trees)

    # H1b: trivial body, small input only
    @jax.jit
    def trivial_small(visits):
        def sim(s, acc):
            return acc + visits[:, 0] + s
        return jax.lax.fori_loop(0, SIMS, sim, jnp.zeros((B,), jnp.float32))
    bench("trivial_small_16x", trivial_small, trees.visits)

    # H2: gather-of-gather isolated: row = cidx[:,0,:]; visits[b, row[b,a]]
    @jax.jit
    def gog(cidx, visits):
        def sim(s, acc):
            row = cidx[:, 0, :]  # [B, A]
            safe = jnp.maximum(row, 0)
            v = jax.vmap(lambda vv, rr: vv[rr])(visits, safe)  # [B, A]
            return acc + jnp.sum(v, axis=1)
        return jax.lax.fori_loop(0, SIMS, sim, jnp.zeros((B,), jnp.float32))
    bench("gather2d_16x", gog, trees.children_index, trees.visits)

    # H3: select on a tree whose embedding is tiny
    small_emb = jnp.zeros((B, N, 1), jnp.int8)
    trees_small = trees.replace(embedding=small_emb)
    def p_select(t, s):
        sel = jax.vmap(functools.partial(gz.gumbel_select_leaf, spec))(t)
        return sel.parent.astype(jnp.float32)
    bench("select_smallemb_16x", loop16(p_select), trees_small)

    # control: select with full embeddings (same as perf_select2 but depth-1 tree)
    bench("select_fullemb_16x", loop16(p_select), trees)

    # expand+backup rerun (crashed with a device error last time)
    pol = jnp.full((B, A), 1.0 / A, jnp.float32)
    lgl = jnp.ones((B, A), bool)
    def p_expand(t, s):
        nidx = jnp.full((B,), 0, jnp.int32) + (s % N)
        t2 = jax.vmap(lambda tt, p, l, n: mcts.expand_node(
            spec, tt, n, jnp.int32(0), jnp.int32(1), jnp.int32(1), p,
            jnp.zeros((A,), jnp.float32), l, jnp.bool_(False),
            enabled=jnp.bool_(True), store_embedding=False))(t, pol, lgl, nidx)
        t2 = jax.vmap(lambda tt, n: mcts.backup(spec, tt, n, jnp.float32(0.1),
                                                jnp.float32(0.0)))(t2, nidx)
        return t2.visits[:, 0]
    bench("expand_backup_smallemb_16x", loop16(p_expand), trees_small)
    bench("expand_backup_fullemb_16x", loop16(p_expand), trees)


if __name__ == "__main__":
    main()
