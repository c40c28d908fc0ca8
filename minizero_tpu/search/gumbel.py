"""Gumbel AlphaZero/MuZero root search.

Array re-design of the reference's ``minizero/actor/gumbel_zero.{h,cpp}``:
top-k Gumbel action sampling, sequential halving of root candidates with
per-phase budgets, and the completed-Q improved-policy target. The reference
keeps a sorted ``std::vector<MCTSNode*>`` of candidates; here candidacy is a
dense bool[A] mask on the tree plus (sample_size, budget) scalars, so every
step is a masked vector op under vmap.

All functions operate on a single game's tree (engine vmaps).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from minizero_tpu.search.mcts import (
    NEG_INF,
    SearchSpec,
    Selection,
    Tree,
    _normalize_q,
    take_node_values,
    _tree_value_bounds,
    root_children_visits,
    select_leaf,
)


def _root_child_q_norm(spec: SearchSpec, tree: Tree) -> jnp.ndarray:
    """[A] normalized mean of root children; 0 where unvisited/missing."""
    cidx = tree.children_index[0]
    safe = jnp.maximum(cidx, 0)
    has = cidx >= 0
    visits = jnp.where(has, take_node_values(tree.visits, safe), 0.0)
    q_raw = take_node_values(tree.reward + spec.discount * tree.mean, safe)
    q = _normalize_q(spec, q_raw, tree.to_play[0], _tree_value_bounds(spec, tree))
    return jnp.where(has & (visits > 0), q, 0.0), visits


def _sigma_scores(spec: SearchSpec, tree: Tree) -> jnp.ndarray:
    """[A] candidate ranking score: logit (incl. gumbel noise) +
    (c_visit + max_count) * c_scale * q for visited children, -inf unvisited
    (reference GumbelZero::sortCandidatesByScore, gumbel_zero.cpp:121-137)."""
    q, visits = _root_child_q_norm(spec, tree)
    max_count = jnp.max(root_children_visits(tree))
    sigma = (spec.gumbel_sigma_visit_c + max_count) * spec.gumbel_sigma_scale_c
    score = tree.logit[0] + sigma * q
    return jnp.where(tree.legal[0] & (visits > 0), score, NEG_INF)


def _top_k_mask(values: jnp.ndarray, mask: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """bool[A] mask of the top-``k`` entries of ``values`` among ``mask``
    (k traced). Rank by pairwise comparison (ties -> lower index wins): an
    [A, A] compare+reduce is scatter-free, which beats argsort+scatter under
    vmap on TPU for small A."""
    masked = jnp.where(mask, values, NEG_INF)
    idx = jnp.arange(masked.shape[0])
    beats = (masked[None, :] > masked[:, None]) | (
        (masked[None, :] == masked[:, None]) & (idx[None, :] < idx[:, None])
    )
    ranks = jnp.sum(beats, axis=1)  # number of entries strictly ahead
    return mask & (ranks < k)


def init_candidates(spec: SearchSpec, tree: Tree) -> Tree:
    """After the root expansion (root count == 1): keep the
    ``gumbel_sample_size`` legal actions with the highest (noised) logits and
    set the first phase budget (reference gumbel_zero.cpp:92-99)."""
    m0 = spec.gumbel_sample_size
    legal = tree.legal[0]
    num_legal = jnp.sum(legal.astype(jnp.int32))
    k = jnp.minimum(num_legal, m0)
    active = _top_k_mask(tree.logit[0], legal, k)
    budget = max(1.0, math.floor(spec.num_simulations / (math.log2(m0) * m0)))
    return tree.replace(
        gumbel_active=active,
        gumbel_sample_size=jnp.int32(m0),
        gumbel_budget=jnp.float32(budget),
    )


def sequential_halving_tick(spec: SearchSpec, tree: Tree) -> Tree:
    """After each simulation: when every active candidate reached the phase
    budget, halve the candidate set (keep top by sigma score) and extend the
    budget (reference gumbel_zero.cpp:100-118)."""
    m0 = spec.gumbel_sample_size
    visits = root_children_visits(tree)
    active = tree.gumbel_active
    all_reached = jnp.all(jnp.where(active, visits >= tree.gumbel_budget, True))

    m_cur = tree.gumbel_sample_size
    next_budget = jnp.floor(
        spec.num_simulations / (math.log2(m0) * jnp.maximum(m_cur.astype(jnp.float32) / 2.0, 1.0))
    )
    do_halve = all_reached & (next_budget > 0) & (m_cur > 2)

    scores = _sigma_scores(spec, tree)
    new_m = m_cur // 2
    new_active = _top_k_mask(scores, active, new_m)
    # reference: new budget = count of the best-by-score candidate + next_budget
    # (gumbel_zero.cpp:115, candidates_[0] after sortCandidatesByScore)
    best_idx = jnp.argmax(jnp.where(new_active, scores, NEG_INF))
    new_budget = visits[best_idx] + next_budget

    return tree.replace(
        gumbel_active=jnp.where(do_halve, new_active, active),
        gumbel_sample_size=jnp.where(do_halve, new_m, m_cur),
        gumbel_budget=jnp.where(do_halve, new_budget, tree.gumbel_budget),
    )


def gumbel_select_leaf(spec: SearchSpec, tree: Tree) -> Selection:
    """Root step: the active candidate with the lowest count (ties -> higher
    logit); below the chosen child, ordinary PUCT
    (reference GumbelZero::selection, gumbel_zero.cpp:74-88)."""
    visits = root_children_visits(tree)
    active = tree.gumbel_active
    # lexicographic (count asc, logit desc): argmax over (-count, logit)
    count_key = jnp.where(active, -visits, NEG_INF)
    best_count = jnp.max(count_key)
    tie = active & (count_key >= best_count)
    action = jnp.argmax(jnp.where(tie, tree.logit[0], NEG_INF)).astype(jnp.int32)

    child = tree.children_index[0, action]

    def from_child(_):
        sel = select_leaf(spec, tree, child)
        return sel

    def new_edge(_):
        if spec.think_batch > 1:
            dup = tree.evloss[0, action] > 0
        else:
            dup = jnp.bool_(False)
        return Selection(parent=jnp.int32(0), action=action, leaf=jnp.int32(-1),
                         is_new=jnp.bool_(True), dup=dup)

    return jax.lax.cond(child >= 0, from_child, new_edge, None)


def decide_action(spec: SearchSpec, tree: Tree) -> jnp.ndarray:
    """argmax sigma score among visited candidates
    (reference GumbelZero::decideActionNode with actor_select_action_by_count,
    gumbel_zero.cpp:60-72)."""
    scores = _sigma_scores(spec, tree)
    return jnp.argmax(jnp.where(tree.gumbel_active, scores, NEG_INF)).astype(jnp.int32)


def improved_policy_target(spec: SearchSpec, tree: Tree) -> jnp.ndarray:
    """Completed-Q improved policy: noise-free logits plus sigma(Q), with the
    non-visited-node value estimate, softmax-normalised over legal root actions
    (reference GumbelZero::getMCTSPolicy, gumbel_zero.cpp:9-58)."""
    legal = tree.legal[0]
    q, visits = _root_child_q_norm(spec, tree)
    visited = legal & (visits > 0)

    # value estimate for non-visited children (gumbel_zero.cpp:11-32)
    pi_sum = jnp.sum(jnp.where(visited, tree.prior[0], 0.0))
    q_sum = jnp.sum(jnp.where(visited, tree.prior[0] * q, 0.0))
    value_pi = tree.value[0]
    if spec.value_rescale:
        lo, hi, enough = _tree_value_bounds(spec, tree)
        scaled = (value_pi - lo) / jnp.maximum(hi - lo, 1e-8)
        scaled = jnp.clip(2.0 * scaled - 1.0, -1.0, 1.0)
        value_pi = jnp.where(enough, scaled, jnp.float32(1.0))
    if spec.flip_player2_value:
        value_pi = jnp.where(tree.to_play[0] == 2, -value_pi, value_pi)
    n = spec.num_simulations
    non_visited_value = 1.0 / (1.0 + n) * (value_pi + (n / jnp.maximum(pi_sum, 1e-8)) * q_sum)

    completed_q = jnp.where(visited, q, non_visited_value)
    max_count = jnp.max(root_children_visits(tree))
    sigma = (spec.gumbel_sigma_visit_c + max_count) * spec.gumbel_sigma_scale_c
    logits_no_noise = tree.logit[0] - tree.noise[0]
    new_logits = logits_no_noise + sigma * completed_q
    new_logits = jnp.where(legal, new_logits, NEG_INF)
    new_logits = new_logits - jnp.max(new_logits)
    # reference drops entries below exp(-38) (gumbel_zero.cpp:52-53)
    weights = jnp.where(legal & (new_logits >= -38.0), jnp.exp(new_logits), 0.0)
    return weights / jnp.maximum(jnp.sum(weights), 1e-20)
