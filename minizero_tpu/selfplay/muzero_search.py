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

    def search(variables, feats, legal, turns, rng, temperature) -> SearchResult:
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

        # fused Pallas tree kernel (ops/tree_kernel.py): one tree op per
        # simulation instead of the ~95-fusion XLA path. Covers board-game
        # MuZero (zero rewards, discount 1) AND the Atari path (reward head,
        # discounted backup, min-max value rescale) — the kernel handles
        # both statically
        # the device MuZero search always runs think_batch == 1, so the
        # fused kernel path is unconditional (board + Atari regimes)
        assert supports_fused_tree_step(spec)
        interpret = jax.default_backend() != "tpu"
        i32 = jnp.int32
        bool_masks = trees.expanded.dtype == jnp.bool_
        trees = trees.replace(
            expanded=trees.expanded.astype(i32),
            terminal=trees.terminal.astype(i32),
            legal=trees.legal.astype(i32),
            gumbel_active=trees.gumbel_active.astype(i32),
        )
        A, N = spec.action_size, spec.max_nodes
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
        iota_n = jnp.arange(N, dtype=i32)

        def pick_parent(oh, x):
            m = oh.reshape(oh.shape + (1,) * (x.ndim - 2))
            return jnp.sum(jnp.where(m, x, jnp.zeros((), x.dtype)), axis=1, dtype=x.dtype)

        ones_legal = jnp.ones((batch, A), bool)
        zero_term = jnp.zeros((batch,), bool)

        def kernel_sim_body(s, carry):
            trees, sel, rng = carry
            rng, _ = jax.random.split(rng)
            parent_oh = jnp.maximum(sel.parent, 0)[:, None] == iota_n[None, :]
            parent_embedding = jax.tree_util.tree_map(
                functools.partial(pick_parent, parent_oh), trees.embedding)
            action_planes = jax.vmap(action_features_fn)(sel.action).astype(compute_dtype)
            out = network.apply(
                variables, parent_embedding, action_planes, train=False,
                method=network.recurrent_inference,
            )
            value = _scalar(out, "value", discrete_value)
            if "reward" in out:
                reward = from_discrete_value(out["reward"].astype(jnp.float32))
            else:
                reward = None
            parent_turn = jnp.sum(
                jnp.where(parent_oh, trees.to_play, 0), axis=1, dtype=i32)
            leaf_turn = jnp.where(jnp.int32(num_players) == 1,
                                  jnp.ones_like(parent_turn), 3 - parent_turn)
            trees, nsel = fused_tree_step(
                spec, trees, sel, out["policy"].astype(jnp.float32),
                out["policy_logit"].astype(jnp.float32), ones_legal,
                zero_term, value, leaf_turn, s, 1, interpret=interpret,
                leaf_reward=reward)
            trees = mcts.store_embedding_batch(trees, s, out["hidden_state"], sel.is_new)
            return trees, nsel, rng

        trees, _, rng = jax.lax.fori_loop(
            1, spec.num_simulations + 1, kernel_sim_body, (trees, sel, rng))
        if bool_masks:
            trees = trees.replace(
                expanded=trees.expanded > 0, terminal=trees.terminal > 0,
                legal=trees.legal > 0, gumbel_active=trees.gumbel_active > 0,
            )
        return _decide(trees, rng, temperature)

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

    return search
