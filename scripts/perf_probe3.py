"""Single-metric MCTS tree-op probe (fresh process per metric — see
perf_probe2). Builds the Go9 gaz tree fixture with random net outputs and
times one vmapped tree operation at batch 1024."""

import functools
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
    from minizero_tpu.search import gumbel as gz
    from minizero_tpu.search import mcts
    from minizero_tpu.selfplay.engine import search_spec_from_config

    cfg = default_config("go", **algorithm_preset("gaz"))
    env = make_env(cfg)
    spec = search_spec_from_config(cfg, env.spec)
    states = jax.vmap(lambda _: env.init())(jnp.arange(batch))
    a = env.spec.action_size
    rng = jax.random.PRNGKey(0)
    policy = jax.nn.softmax(jax.random.normal(rng, (batch, a)))
    logits = jnp.log(policy + 1e-9)
    legal = jnp.ones((batch, a), bool)
    turns = jnp.ones((batch,), jnp.int32)
    zeros_i = jnp.zeros((batch,), jnp.int32)
    falses = jnp.zeros((batch,), bool)
    no_parent = jnp.full((batch,), -1, jnp.int32)

    @jax.jit
    def build(states, turns, policy, logits, legal):
        proto = jax.tree_util.tree_map(lambda x: x[0], states)
        trees = jax.vmap(lambda t: mcts.init_tree(spec, proto, t))(turns)
        trees = jax.vmap(functools.partial(mcts.expand_node, spec))(
            trees, zeros_i, no_parent, zeros_i, turns, policy, logits, legal, falses, states)
        trees = jax.vmap(functools.partial(mcts.backup, spec))(
            trees, zeros_i, jnp.zeros((batch,)), jnp.zeros((batch,)))
        trees = jax.vmap(functools.partial(gz.init_candidates, spec))(trees)
        return trees

    trees = build(states, turns, policy, logits, legal)
    jax.block_until_ready(trees.visits)

    fns = {}
    fns["select"] = jax.jit(lambda t: jax.vmap(functools.partial(gz.gumbel_select_leaf, spec))(t))

    def expand_backup(trees):
        sel = jax.vmap(functools.partial(gz.gumbel_select_leaf, spec))(trees)
        nidx = jnp.full((batch,), 1, jnp.int32)

        def per_game(tree, sel, policy, logits, legal, embedding, nidx):
            tree = mcts.expand_node(
                spec, tree, nidx, sel.parent, sel.action, jnp.int32(2),
                policy, logits, legal, jnp.bool_(False), embedding, enabled=sel.is_new)
            start = jnp.where(sel.is_new, nidx, jnp.maximum(sel.leaf, 0))
            return mcts.backup(spec, tree, start, jnp.float32(0.1), jnp.float32(0.0),
                               store_leaf=sel.is_new)

        return jax.vmap(per_game)(trees, sel, policy, logits, legal, states, nidx)

    fns["select_expand_backup"] = jax.jit(expand_backup)

    def embed_gather(trees):
        sel = jax.vmap(functools.partial(gz.gumbel_select_leaf, spec))(trees)
        return jax.tree_util.tree_map(
            lambda x: jax.vmap(lambda e, p: e[jnp.maximum(p, 0)])(x, sel.parent),
            trees.embedding,
        )

    fns["select_embed_gather"] = jax.jit(embed_gather)
    fns["halving_tick"] = jax.jit(
        lambda t: jax.vmap(functools.partial(gz.sequential_halving_tick, spec))(t))
    fns["policy_target"] = jax.jit(
        lambda t: jax.vmap(functools.partial(gz.improved_policy_target, spec))(t))

    from minizero_tpu.search.gumbel import _sigma_scores, _top_k_mask
    from minizero_tpu.search.mcts import root_children_visits

    fns["root_visits"] = jax.jit(lambda t: jax.vmap(root_children_visits)(t))
    fns["sigma_scores"] = jax.jit(lambda t: jax.vmap(lambda tr: _sigma_scores(spec, tr))(t))
    fns["topk"] = jax.jit(lambda t: jax.vmap(
        lambda tr: _top_k_mask(tr.logit[0], tr.legal[0], tr.gumbel_sample_size // 2))(t))
    fns["tree_replace"] = jax.jit(lambda t: t.replace(gumbel_budget=t.gumbel_budget + 1.0))
    fn = fns[which]
    out = fn(trees)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(trees)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(json.dumps({which + "_ms": round(ms, 3), "batch": batch}))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1024)
