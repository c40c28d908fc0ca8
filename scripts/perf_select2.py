"""Second-stage attribution: time the REAL sim-loop pieces in isolation.

perf_select.py showed raw gathers/while-loops are fast (~0.1ms per 16 sims),
so the 75ms 'select' ablation delta must sit in a specific real component.
Build a realistic tree batch (root expanded, a few sims applied), then time
each piece 16x in a fori_loop: gumbel root select, PUCT walk, the per-lane
embedding gather, halving tick, expand+backup, embedding store.

    python scripts/perf_select2.py
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
    A = spec.action_size

    @jax.jit
    def build_trees(rng):
        states = jax.vmap(lambda _: env.init())(jnp.arange(B))
        turns = jax.vmap(env.turn)(states)
        legal = jax.vmap(env.legal_mask)(states)
        proto = jax.tree_util.tree_map(lambda x: x[0], states)
        trees = jax.vmap(lambda t: mcts.init_tree(spec, proto, t))(turns.astype(jnp.int32))
        k1, k2 = jax.random.split(rng)
        policy = jax.nn.softmax(jax.random.normal(k1, (B, A)))
        logits = jnp.log(policy + 1e-9)
        zeros_i = jnp.zeros((B,), jnp.int32)
        no_parent = jnp.full((B,), -1, jnp.int32)
        falses = jnp.zeros((B,), bool)
        trees = jax.vmap(functools.partial(mcts.expand_node, spec, store_embedding=False))(
            trees, zeros_i, no_parent, zeros_i, turns.astype(jnp.int32), policy, logits, legal, falses)
        trees = trees.replace(embedding=jax.tree_util.tree_map(
            lambda full, st: full.at[:, 0].set(st.astype(full.dtype)), trees.embedding, states))
        trees = jax.vmap(functools.partial(mcts.backup, spec))(
            trees, zeros_i, jax.random.normal(k2, (B,)), jnp.zeros((B,), jnp.float32))
        trees = jax.vmap(functools.partial(gz.init_candidates, spec))(trees)
        # apply 8 sims' worth of expansions at sequential slots so the tree
        # has depth (children under root candidates)
        def add(i, carry):
            trees, key = carry
            key, k = jax.random.split(key)
            sel = jax.vmap(functools.partial(gz.gumbel_select_leaf, spec))(trees)
            pol = jax.nn.softmax(jax.random.normal(k, (B, A)))
            lg = jnp.log(pol + 1e-9)
            nidx = jnp.full((B,), 0, jnp.int32) + i
            trees = jax.vmap(lambda t, s, p, l, n: mcts.expand_node(
                spec, t, n, s.parent, s.action, jnp.int32(1), p, l,
                jnp.ones((A,), bool), jnp.bool_(False), enabled=s.is_new,
                store_embedding=False))(trees, sel, pol, lg, nidx)
            trees = jax.vmap(lambda t, s, n: mcts.backup(
                spec, t, jnp.where(s.is_new, n, jnp.maximum(s.leaf, 0)),
                jnp.float32(0.1), jnp.float32(0.0)))(trees, sel, nidx)
            trees = jax.vmap(functools.partial(gz.sequential_halving_tick, spec))(trees)
            return trees, key
        trees, _ = jax.lax.fori_loop(1, 9, add, (trees, jax.random.PRNGKey(7)))
        return trees

    trees = jax.block_until_ready(build_trees(jax.random.PRNGKey(0)))

    def loop16(fn):
        @jax.jit
        def run(trees):
            def sim(s, acc):
                return acc + fn(trees, s)
            return jax.lax.fori_loop(0, SIMS, sim, jnp.zeros((B,), jnp.float32))
        return run

    # A: gumbel root select + PUCT walk
    def p_select(trees, s):
        sel = jax.vmap(functools.partial(gz.gumbel_select_leaf, spec))(trees)
        return sel.parent.astype(jnp.float32) + sel.action.astype(jnp.float32)
    bench("select_only_16x", loop16(p_select), trees)

    # B: per-lane embedding gather (GoState pytree [B, N, ...])
    idx = jnp.asarray(np.random.RandomState(0).randint(0, spec.max_nodes, (B,)), jnp.int32)
    def p_gather(trees, s):  # reduce every leaf to keep them alive
        emb = jax.tree_util.tree_map(
            lambda x: jax.vmap(lambda e, p: e[jnp.maximum(p, 0)])(x, (idx + s) % spec.max_nodes),
            trees.embedding)
        acc = jnp.zeros((B,), jnp.float32)
        for x in jax.tree_util.tree_leaves(emb):
            acc = acc + jnp.sum(x.reshape(B, -1).astype(jnp.float32), axis=1)
        return acc
    bench("embedding_gather_16x", loop16(p_gather), trees)

    # C: halving tick
    def p_halve(trees, s):
        t2 = jax.vmap(functools.partial(gz.sequential_halving_tick, spec))(trees)
        return t2.gumbel_budget
    bench("halving_tick_16x", loop16(p_halve), trees)

    # D: expand + backup (per_game shape from the engine sim loop)
    pol = jnp.full((B, A), 1.0 / A, jnp.float32)
    lg = jnp.zeros((B, A), jnp.float32)
    lgl = jnp.ones((B, A), bool)
    def p_expand(trees, s):
        nidx = jnp.full((B,), 0, jnp.int32) + (s % spec.max_nodes)
        t2 = jax.vmap(lambda t, p, l, g, n: mcts.expand_node(
            spec, t, n, jnp.int32(0), jnp.int32(1), jnp.int32(1), p, g, l,
            jnp.bool_(False), enabled=jnp.bool_(True), store_embedding=False))(
            trees, pol, lgl, lg, nidx)
        t2 = jax.vmap(lambda t, n: mcts.backup(spec, t, n, jnp.float32(0.1),
                                               jnp.float32(0.0)))(t2, nidx)
        return t2.visits[:, 0]
    bench("expand_backup_16x", loop16(p_expand), trees)

    # E: embedding store at batch-uniform slot
    states = jax.vmap(lambda _: env.init())(jnp.arange(B))
    en = jnp.ones((B,), bool)
    def p_store(trees, s):
        t2 = mcts.store_embedding_batch(trees, s % spec.max_nodes, states, en)
        return t2.visits[:, 0]
    bench("embedding_store_16x", loop16(p_store), trees)


if __name__ == "__main__":
    main()
