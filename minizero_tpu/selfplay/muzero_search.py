"""Device-side MuZero search, decoupled from the (jittable) env protocol.

The fused self-play engine runs envs under ``vmap`` on device; host-side envs
(Atari's ALE) cannot. MuZero only needs the env at the ROOT — initial
features + legal mask — so this module exposes the full batched search
(root inference -> n simulations through the dynamics net -> action/policy
extraction) as one jittable function over plain arrays. Both the fused
engine and the host engine (``selfplay/host_engine.py``) build on it
(reference: the MuZero path of ``actor/zero_actor.cpp:58-68, 231-245``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from minizero_tpu.ops.tree_kernel import (
    NextSelection,
    fused_tree_step,
    supports_fused_tree_step,
)
from minizero_tpu.search import gumbel as gz
from minizero_tpu.search import mcts
from minizero_tpu.search.mcts import SearchSpec
from minizero_tpu.utils.transforms import from_discrete_value


class SearchResult(NamedTuple):
    action: jnp.ndarray  # i32[B]
    policy_target: jnp.ndarray  # f32[B, A]
    root_value: jnp.ndarray  # f32[B]
    resign: jnp.ndarray  # bool[B]


def _scalar(out, key, discrete):
    if discrete:
        return from_discrete_value(out[key].astype(jnp.float32))
    return out[key][:, 0].astype(jnp.float32)


def make_muzero_search(
    network,
    spec: SearchSpec,
    action_features_fn: Callable[[jnp.ndarray], jnp.ndarray],
    num_players: int,
    discrete_value: bool,
    compute_dtype=jnp.float32,
    resign_threshold: float = -0.9,
):
    """Build ``search(variables, feats, legal, turns, rng, temperature)``.

    ``variables`` must already be cast to ``compute_dtype``; ``feats`` is the
    f32 root feature batch; ``legal`` bool[B, A]; ``turns`` i32[B].
    """

    use_think_batch = spec.think_batch > 1
    A, N = spec.action_size, spec.max_nodes
    i32 = jnp.int32

    def _root_setup(variables, feats, legal, turns, rng):
        """Root inference + tree init + noise (reference MuZero initial
        inference path, zero_actor.cpp:58-62)."""
        batch = feats.shape[0]
        rng, k_noise = jax.random.split(rng)
        out = network.apply(
            variables, feats.astype(compute_dtype), train=False,
            method=network.initial_inference,
        )
        policy = out["policy"].astype(jnp.float32)
        logits = out["policy_logit"].astype(jnp.float32)
        value = _scalar(out, "value", discrete_value)
        root_embedding = out["hidden_state"]

        proto = jax.tree_util.tree_map(lambda x: x[0], root_embedding)
        trees = jax.vmap(lambda t: mcts.init_tree(spec, proto, t))(turns)
        no_parent = jnp.full((batch,), -1, jnp.int32)
        zeros_i = jnp.zeros((batch,), jnp.int32)
        falses = jnp.zeros((batch,), bool)
        trees = jax.vmap(
            functools.partial(mcts.expand_node, spec, store_embedding=False)
        )(trees, zeros_i, no_parent, zeros_i, turns, policy, logits, legal, falses)
        # root embedding lives at slot 0 for every game: static-index store
        trees = trees.replace(embedding=jax.tree_util.tree_map(
            lambda full, st: full.at[:, 0].set(st.astype(full.dtype)),
            trees.embedding, root_embedding,
        ))
        trees = jax.vmap(functools.partial(mcts.backup, spec))(
            trees, zeros_i, value, jnp.zeros((batch,), jnp.float32)
        )
        trees = jax.vmap(functools.partial(mcts.add_root_noise, spec))(
            trees, jax.random.split(k_noise, batch)
        )
        if spec.use_gumbel:
            trees = jax.vmap(functools.partial(gz.init_candidates, spec))(trees)
        return trees, rng

    def _recurrent_eval(variables, parent_embedding, actions):
        """One dynamics+prediction forward for a batch of (parent, action)
        edges; returns MuZero leaf quantities (all actions legal at non-root
        nodes, reference calculateMuZeroActionPolicy)."""
        action_planes = jax.vmap(action_features_fn)(actions).astype(compute_dtype)
        out = network.apply(
            variables, parent_embedding, action_planes, train=False,
            method=network.recurrent_inference,
        )
        value = _scalar(out, "value", discrete_value)
        # reward head presence is a trace-time fact of the network type
        reward = (from_discrete_value(out["reward"].astype(jnp.float32))
                  if "reward" in out else None)
        return (out["policy"].astype(jnp.float32),
                out["policy_logit"].astype(jnp.float32),
                value, reward, out["hidden_state"])

    def pick_parent(oh, x):
        m = oh.reshape(oh.shape + (1,) * (x.ndim - 2))
        return jnp.sum(jnp.where(m, x, jnp.zeros((), x.dtype)), axis=1, dtype=x.dtype)

    iota_n = jnp.arange(N, dtype=i32)

    # ---------------------------------------------------------------- kernel
    # fused Pallas tree kernel (ops/tree_kernel.py): one tree op per
    # simulation instead of the ~95-fusion XLA path. Covers board-game
    # MuZero (zero rewards, discount 1) AND the Atari path (reward head,
    # discounted backup, min-max value rescale) — the kernel handles both
    # statically. The self-play engines always run think_batch == 1, so the
    # kernel path is their unconditional hot path; the console's intra-tree
    # leaf batching (think_batch > 1) runs the XLA virtual-loss rounds below.

    def _kernel_init(trees):
        """Mask conversion + phase-0 selection; returns the chunkable sim
        carry (trees_i32, next_selection, rng-less)."""
        assert supports_fused_tree_step(spec)
        batch = trees.visits.shape[0]
        interpret = jax.default_backend() != "tpu"
        trees = trees.replace(
            expanded=trees.expanded.astype(i32),
            terminal=trees.terminal.astype(i32),
            legal=trees.legal.astype(i32),
            gumbel_active=trees.gumbel_active.astype(i32),
        )
        zeros_f = jnp.zeros((batch, A), jnp.float32)
        dummy = (zeros_f, zeros_f, jnp.zeros((batch, A), bool),
                 jnp.zeros((batch,), bool), jnp.zeros((batch,), jnp.float32),
                 jnp.ones((batch,), jnp.int32))
        sel0 = NextSelection(
            parent=jnp.zeros((batch,), i32), action=jnp.zeros((batch,), i32),
            leaf=jnp.full((batch,), -1, i32), is_new=jnp.zeros((batch,), bool),
            path=jnp.zeros((batch, N), bool))
        trees, sel = fused_tree_step(
            spec, trees, sel0, *dummy, 0, 0, interpret=interpret)
        return trees, sel

    def kernel_sim_body(s, carry):
        """Carry = (trees, sel, pending_hidden, variables, rng). The previous
        sim's hidden state is stored at the START of the iteration — before
        the one-hot parent read — so the carried [B, N, h, w, C] embedding
        stays in place (read-then-write forced XLA to keep a second copy
        live every sim). Unconditional store: node s-1 is only referenced
        if sim s-1 created it (MuZero interiors always do)."""
        trees, sel, pending, variables, rng = carry
        interpret = jax.default_backend() != "tpu"
        batch = trees.visits.shape[0]
        trees = mcts.store_embedding_batch(trees, s - 1, pending)
        rng, _ = jax.random.split(rng)
        parent_oh = jnp.maximum(sel.parent, 0)[:, None] == iota_n[None, :]
        parent_embedding = jax.tree_util.tree_map(
            functools.partial(pick_parent, parent_oh), trees.embedding)
        policy, logits, value, reward, hidden = _recurrent_eval(
            variables, parent_embedding, sel.action)
        parent_turn = jnp.sum(
            jnp.where(parent_oh, trees.to_play, 0), axis=1, dtype=i32)
        leaf_turn = jnp.where(jnp.int32(num_players) == 1,
                              jnp.ones_like(parent_turn), 3 - parent_turn)
        trees, nsel = fused_tree_step(
            spec, trees, sel, policy, logits, jnp.ones((batch, A), bool),
            jnp.zeros((batch,), bool), value, leaf_turn, s, 1,
            interpret=interpret, leaf_reward=reward)
        return trees, nsel, hidden, variables, rng

    def _advance_kernel(variables, carry, lo, hi):
        trees, sel, pending, rng = carry
        trees, sel, pending, _, rng = jax.lax.fori_loop(
            lo, hi, kernel_sim_body, (trees, sel, pending, variables, rng))
        return trees, sel, pending, rng

    def _masks_to_bool(trees):
        if trees.expanded.dtype != jnp.bool_:
            trees = trees.replace(
                expanded=trees.expanded > 0, terminal=trees.terminal > 0,
                legal=trees.legal > 0, gumbel_active=trees.gumbel_active > 0,
            )
        return trees

    # ------------------------------------------------- think-batch (console)
    def _think_batch_rounds(variables, trees, rng, lo_round, hi_round):
        """Intra-tree leaf batching with virtual loss: K selections, ONE
        recurrent forward over all K edges, K deduplicated expansions +
        backups per round (reference ZeroActor::step, zero_actor.cpp:129-157
        — the MuZero arm of the same loop the AlphaZero engine implements in
        engine.think_batch_round)."""
        K = spec.think_batch
        batch = trees.visits.shape[0]

        def round_body(r, carry):
            trees, rng = carry
            rng, _ = jax.random.split(rng)
            sels = []
            for j in range(K):
                sim_idx = r * K + j + 1
                en = sim_idx <= spec.num_simulations
                en_b = jnp.broadcast_to(en, (batch,))
                if spec.use_gumbel:
                    sel = jax.vmap(functools.partial(gz.gumbel_select_leaf, spec))(trees)
                else:
                    sel = jax.vmap(lambda t: mcts.select_leaf(spec, t, jnp.int32(0)))(trees)
                trees = jax.vmap(functools.partial(mcts.add_path_vloss, spec))(trees, sel, en_b)
                sels.append((sel, en))

            parents = jnp.stack([s.parent for s, _ in sels])  # [K, B]
            actions = jnp.stack([s.action for s, _ in sels])  # [K, B]
            parent_embedding = jax.tree_util.tree_map(
                lambda x: jax.vmap(
                    lambda pk: jax.vmap(lambda e, p: e[jnp.maximum(p, 0)])(x, pk)
                )(parents),
                trees.embedding,
            )  # [K, B, ...]

            def flat(x):
                return x.reshape((K * batch,) + x.shape[2:])

            def unflat(x):
                return x.reshape((K, batch) + x.shape[1:])

            parent_flat = jax.tree_util.tree_map(flat, parent_embedding)
            policy, logits, value, reward, hidden = _recurrent_eval(
                variables, parent_flat, flat(actions))
            if reward is None:
                reward = jnp.zeros_like(value)
            parent_turn = jax.vmap(
                lambda pk: jax.vmap(lambda tp, p: tp[jnp.maximum(p, 0)])(trees.to_play, pk)
            )(parents)
            leaf_turn = jnp.where(jnp.int32(num_players) == 1,
                                  jnp.ones_like(parent_turn), 3 - parent_turn)  # [K, B]

            def per_game(tree, sel, policy, logits, terminal, value, reward, turn, nidx, en):
                # fresh/dup/revisit semantics identical to the AlphaZero
                # think-batch round (engine.py think_batch_round)
                fresh = sel.is_new & ~sel.dup
                tree = mcts.expand_node(
                    spec, tree, nidx, sel.parent, sel.action, turn,
                    policy, logits, jnp.ones((A,), bool), terminal,
                    enabled=fresh & en, store_embedding=False,
                )
                known_node = jnp.where(
                    sel.is_new, tree.children_index[sel.parent, sel.action], sel.leaf
                )
                start = jnp.where(fresh, nidx, jnp.maximum(known_node, 0))
                val = jnp.where(fresh, value, tree.value[start])
                rew = jnp.where(fresh, reward, tree.reward[start])
                return mcts.backup(spec, tree, start, val, rew,
                                   store_leaf=fresh, enabled=en)

            for j, (sel, en) in enumerate(sels):
                slot = r * K + j + 1
                en_b = jnp.broadcast_to(en, (batch,))

                def jv(x):
                    return unflat(x)[j]

                trees = jax.vmap(per_game)(
                    trees, sel, jv(policy), jv(logits),
                    jnp.zeros((batch,), bool), jv(value), jv(reward),
                    leaf_turn[j], jnp.full((batch,), 0, i32) + slot, en_b,
                )
                hidden_j = jax.tree_util.tree_map(jv, hidden)
                trees = mcts.store_embedding_batch(
                    trees, slot, hidden_j, sel.is_new & ~sel.dup & en_b)
                if spec.use_gumbel:
                    trees = jax.vmap(functools.partial(gz.sequential_halving_tick, spec))(trees)
            trees = trees.replace(evloss=jnp.zeros_like(trees.evloss),
                                  nvloss=jnp.zeros_like(trees.nvloss))
            return trees, rng

        return jax.lax.fori_loop(lo_round, hi_round, round_body, (trees, rng))

    # ----------------------------------------------------------- public API
    def _run_trees(variables, feats, legal, turns, rng, lo=1, hi=None):
        """Full (or partial: sims [lo, hi)) search returning finished trees
        with bool masks."""
        hi_ = spec.num_simulations + 1 if hi is None else hi
        trees, rng = _root_setup(variables, feats, legal, turns, rng)
        if use_think_batch:
            K = spec.think_batch
            rounds = -(-spec.num_simulations // K)
            trees, rng = _think_batch_rounds(variables, trees, rng, 0, rounds)
            return trees, rng
        trees, sel = _kernel_init(trees)
        pending = jax.tree_util.tree_map(lambda x: x[:, 0], trees.embedding)
        trees, sel, _, rng = _advance_kernel(
            variables, (trees, sel, pending, rng), lo, hi_)
        return _masks_to_bool(trees), rng

    def search(variables, feats, legal, turns, rng, temperature) -> SearchResult:
        trees, rng = _run_trees(variables, feats, legal, turns, rng)
        return _decide(trees, rng, temperature)

    def search_trees(variables, feats, legal, turns, rng):
        """Finished Tree batch (console ``tree_string`` / analysis surface;
        MuZero twin of SelfPlayEngine.search_trees)."""
        trees, _ = _run_trees(variables, feats, legal, turns, rng)
        return trees

    def _decide(trees, rng, temperature) -> SearchResult:
        batch = trees.visits.shape[0]
        rng, k_sel = jax.random.split(rng)
        sel_keys = jax.random.split(k_sel, batch)
        if spec.use_gumbel:
            if spec.select_by_count:
                action = jax.vmap(functools.partial(gz.decide_action, spec))(trees)
            else:
                action = jax.vmap(
                    lambda t, k: mcts.select_action_by_softmax_count(spec, t, k, temperature)
                )(trees, sel_keys)
            policy_target = jax.vmap(functools.partial(gz.improved_policy_target, spec))(trees)
        else:
            if spec.select_by_count:
                action = jax.vmap(mcts.select_action_by_max_count)(trees)
            else:
                action = jax.vmap(
                    lambda t, k: mcts.select_action_by_softmax_count(spec, t, k, temperature)
                )(trees, sel_keys)
            policy_target = jax.vmap(mcts.mcts_policy_target)(trees)

        resign = jax.vmap(
            lambda t, a: mcts.is_resign(spec, t, a, resign_threshold)
        )(trees, action)
        return SearchResult(
            action=action,
            policy_target=policy_target,
            root_value=trees.mean[:, 0],
            resign=resign,
        )

    # chunked pieces for the console's wall-clock think cap
    # (reference ZeroActor::think, zero_actor.cpp:36-49): run sims in
    # host-visible chunks, check the clock between chunks, decide from the
    # partial tree
    def init_timed(variables, feats, legal, turns, rng):
        trees, rng = _root_setup(variables, feats, legal, turns, rng)
        trees, sel = _kernel_init(trees)
        pending = jax.tree_util.tree_map(lambda x: x[:, 0], trees.embedding)
        return trees, sel, pending, rng

    def advance_timed(variables, carry, lo, hi):
        return _advance_kernel(variables, carry, lo, hi)

    def finish_timed(carry, temperature):
        trees, _, _, rng = carry
        trees = _masks_to_bool(trees)
        return _decide(trees, rng, temperature), trees

    search.search_trees = search_trees
    search.init_timed = init_timed
    search.advance_timed = advance_timed
    search.finish_timed = finish_timed
    return search
