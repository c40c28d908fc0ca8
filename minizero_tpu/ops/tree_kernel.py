"""Fused per-simulation MCTS tree step as a single Pallas TPU kernel.

Motivation (measured, CLAUDE.md round-1 notes): the XLA lowering of the
engine's sim loop executes ~95 small fusions plus ~360 async VMEM copy pairs
per simulation — per-op overheads dwarf the actual math, which touches only
a few MB of tree arrays. This kernel performs the whole tree transition of
one simulation in ONE op with every array resident in VMEM:

    expand(new leaf)  ->  backup(leaf value)  ->  gumbel sequential-halving
    tick  ->  select next leaf (gumbel root step + PUCT walk)

The semantics mirror ``search/mcts.py`` + ``search/gumbel.py`` exactly
(which in turn mirror the reference C++, ``actor/mcts.cpp`` /
``actor/gumbel_zero.cpp``) under the *board-game fast path* preconditions:

    think_batch == 1

covering both regimes: the board-game fast path (discount == 1, zero
rewards, no value rescale — backup is a single path-mask update) and the
Atari/MuZero path (reward-discounted backup as a leaf->root loop over
parent pointers, min-max tree value rescaling per ``mcts.cpp:40-53`` —
trees there are shallow thanks to ``init_q_average``, so the loop is
short).

Walks are expressed in one-hot form — the current node is a ``[G, N]`` mask,
row reads are mask-weighted reductions, child stats come from a ``[G, N, A]``
membership compare — so there are no per-lane gathers anywhere; the PUCT
descent is a ``lax.while_loop`` that exits as soon as every game in the
*tile* finished (tile-level adaptivity instead of batch-global).

``tree_step_reference`` is the pure-JAX mirror of the same contract built on
the existing mcts/gumbel functions; tests check the kernel (in interpret
mode on CPU) against it simulation-by-simulation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minizero_tpu.search.mcts import SearchSpec, Selection, Tree

NEG_INF = -3.4e38  # python float: jnp scalars cannot be captured by pallas kernels

# number of games processed per kernel program instance
_TILE = 128

# empirical Mosaic live-set coefficient: the kernel's VMEM requirement is
# ~160 bytes per (game x node x action) element of the tile (measured: Go9
# N=17 tile 128 -> 16.5MB used; N=201 tile 128 -> 313MB, OOM vs 128MB VMEM)
_VMEM_BYTES_PER_ELEM = 160
_VMEM_BUDGET = 100 * 1024 * 1024


def _pick_tile(batch: int, n_nodes: int, action_size: int) -> int:
    """Largest power-of-two tile dividing ``batch`` whose kernel working set
    fits the VMEM budget (large search trees need smaller tiles)."""
    fallback = batch
    for t in (128, 64, 32, 16, 8):
        if batch % t == 0:
            fallback = t
            if _VMEM_BYTES_PER_ELEM * n_nodes * action_size * t <= _VMEM_BUDGET:
                return t
    return fallback


class NextSelection(NamedTuple):
    """Selection for the next simulation plus its root-to-parent path mask."""

    parent: jnp.ndarray  # i32[B]
    action: jnp.ndarray  # i32[B]
    leaf: jnp.ndarray  # i32[B] (-1 for new edges)
    is_new: jnp.ndarray  # bool[B]
    path: jnp.ndarray  # bool[B, N] nodes on the selected path (incl. leaf if it exists)


def supports_fused_tree_step(spec: SearchSpec) -> bool:
    """Fast-path precondition: lock-step batching replaces virtual loss, so
    intra-tree think batches stay on the XLA path."""
    return spec.think_batch == 1


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _row(oh_f32, arr):
    """Mask-weighted row read: oh f32[G, N], arr [G, N, A] -> [G, A]."""
    return jnp.sum(oh_f32[:, :, None] * arr, axis=1)


def _rowv(oh_f32, arr):
    """oh f32[G, N], arr [G, N] -> [G] (kept as [G, 1])."""
    return jnp.sum(oh_f32 * arr, axis=1, keepdims=True)


def _child_stats(ci_row, visits, qnode, n_nodes):
    """Per-action child stats via membership compare (no gathers).

    ci_row i32[G, A]; visits/qnode f32[G, N] -> (cvis, cq_raw) f32[G, A].
    ``qnode`` is the per-node raw q (mean, or reward + discount*mean).
    """
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, n_nodes, 1), 1)
    memb = (ci_row[:, None, :] == iota_n).astype(jnp.float32)  # [G, N, A]
    cvis = jnp.sum(memb * visits[:, :, None], axis=1)
    cq = jnp.sum(memb * qnode[:, :, None], axis=1)
    return cvis, cq


def _argmax_tiebreak(scores, tiebreak):
    """argmax of scores, ties -> larger tiebreak then lower index
    (mcts._argmax_with_prior_tiebreak). [G, A] -> i32[G, 1].

    Expressed as max-reduce + iota min-reduce: Mosaic's argmax lowering
    leaves an unrealized f32->i32 cast, so avoid jnp.argmax entirely."""
    a = scores.shape[1]
    best = jnp.max(scores, axis=1, keepdims=True)
    tb = jnp.where(scores >= best, tiebreak, NEG_INF)
    best_tb = jnp.max(tb, axis=1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    cand = jnp.where(tb >= best_tb, iota, a)
    return jnp.min(cand, axis=1).astype(jnp.int32)[:, None]


def _onehot(idx, n, dtype=jnp.float32):
    """i32[G, 1] -> [G, n] one-hot."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    return (idx == iota).astype(dtype)


def _tree_step_kernel(
    spec: SearchSpec,
    use_rewards: bool,
    # scalar prefetch (SMEM): [node_idx, phase]
    scalars_ref,
    # aliased tree state
    visits_ref, mean_ref, value_ref, expanded_ref, terminal_ref,
    parent_ref, afp_ref, to_play_ref,
    ci_ref, prior_ref, logit_ref, legal_ref,
    gactive_ref, gm_ref, gbudget_ref, reward_ref,
    # per-sim inputs
    sparent_ref, saction_ref, sleaf_ref, snew_ref, spath_ref,
    lpolicy_ref, llogit_ref, llegal_ref, lterm_ref, lvalue_ref, lturn_ref,
    lreward_ref,
    # outputs (aliased tree first, then next selection)
    o_visits, o_mean, o_value, o_expanded, o_terminal,
    o_parent, o_afp, o_to_play,
    o_ci, o_prior, o_logit, o_legal,
    o_gactive, o_gm, o_gbudget, o_reward,
    o_nparent, o_naction, o_nleaf, o_nnew, o_npath,
):
    N, A = spec.max_nodes, spec.action_size
    one_shot = (not use_rewards) and float(spec.discount) == 1.0
    s = scalars_ref[0]
    phase = scalars_ref[1]
    en = phase > 0

    visits = visits_ref[:, :]
    mean = mean_ref[:, :]
    value = value_ref[:, :]
    expanded = expanded_ref[:, :].astype(jnp.float32)
    ci = ci_ref[:, :, :]
    G = visits.shape[0]

    slot_oh = _onehot(jnp.full((G, 1), s, jnp.int32), N)  # [G, N]
    fresh = jnp.where(en, snew_ref[:, :].astype(jnp.float32), 0.0)  # [G, 1]
    lterm = lterm_ref[:, :].astype(jnp.float32)  # [G, 1]
    llegal = llegal_ref[:, :].astype(jnp.float32)  # [G, A]

    # ---- 1. expand at slot s --------------------------------------------
    w_node = slot_oh * fresh  # [G, N] rows to overwrite
    keep = 1.0 - w_node
    expanded = expanded * keep + w_node * (1.0 - lterm)
    terminal_new = terminal_ref[:, :].astype(jnp.float32) * keep + w_node * lterm
    parent_new = jnp.where(w_node > 0, sparent_ref[:, :], parent_ref[:, :])
    afp_new = jnp.where(w_node > 0, saction_ref[:, :], afp_ref[:, :])
    to_play_new = jnp.where(w_node > 0, lturn_ref[:, :], to_play_ref[:, :])

    live = (1.0 - lterm)  # [G, 1]
    prior_row = llegal * lpolicy_ref[:, :] * live  # [G, A]
    logit_row = llegal * llogit_ref[:, :] * live
    legal_row = llegal * live
    w3 = w_node[:, :, None]  # [G, N, 1]
    prior_new = prior_ref[:, :, :] * (1.0 - w3) + w3 * prior_row[:, None, :]
    logit_new = logit_ref[:, :, :] * (1.0 - w3) + w3 * logit_row[:, None, :]
    legal_in = legal_ref[:, :, :]  # i32 mask (Mosaic cannot address i1 memory)
    legal_new = jnp.where(w3 > 0, (legal_row[:, None, :] > 0).astype(jnp.int32),
                          legal_in)

    reward = reward_ref[:, :]
    if use_rewards:
        reward = reward * (1.0 - w_node) + w_node * lreward_ref[:, :]

    iota_n3 = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
    iota_a3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, A), 2)
    sparent = sparent_ref[:, :]
    saction = saction_ref[:, :]
    edge_m = (
        (sparent[:, :, None] == iota_n3)
        & (saction[:, :, None] == iota_a3)
        & (fresh[:, :, None] > 0)
    )
    ci = jnp.where(edge_m, s, ci)

    # ---- 2. backup --------------------------------------------------------
    snew = snew_ref[:, :] > 0  # [G, 1]
    leaf_node = jnp.where(snew, jnp.full((G, 1), s, jnp.int32), sleaf_ref[:, :])
    leaf_oh = _onehot(leaf_node, N)
    v_exist = _rowv(leaf_oh, value)  # [G, 1] stored value at revisited leaf
    v = jnp.where(snew, lvalue_ref[:, :], v_exist)
    value = value * (1.0 - w_node) + w_node * lvalue_ref[:, :]

    en_f = jnp.where(en, 1.0, 0.0)
    if one_shot:
        # discount == 1, zero rewards: every path node receives the same
        # value, so the whole propagation is one path-mask update
        path = jnp.maximum(spath_ref[:, :].astype(jnp.float32), leaf_oh) * en_f  # [G, N]
        visits = visits + path
        mean = mean + path * (v - mean) / jnp.maximum(visits, 1.0)
    else:
        # reward-discounted propagation: walk parent pointers leaf -> root,
        # updated = reward[node] + discount * updated (mcts.cpp:166-179)
        parent_f = parent_new.astype(jnp.float32)

        def bcond(c):
            return jnp.max(c[0].astype(jnp.float32)) >= 0.0

        def bbody(c):
            cur, updv, visits, mean = c
            act_m = (cur >= 0).astype(jnp.float32)  # [G, 1]
            m = _onehot(jnp.maximum(cur, 0), N) * act_m  # [G, N]
            visits = visits + m
            mean = mean + m * (updv - mean) / jnp.maximum(visits, 1.0)
            r_cur = _rowv(m, reward)
            updv = r_cur + spec.discount * updv
            par = _rowv(m, parent_f).astype(jnp.int32)
            cur = jnp.where(cur >= 0, par, cur)
            return (cur, updv, visits, mean)

        start = jnp.where(en, leaf_node, jnp.full((G, 1), -1, jnp.int32))
        _, _, visits, mean = jax.lax.while_loop(
            bcond, bbody, (start, v, visits, mean))

    # per-node raw q (reward + discounted mean) and tree value bounds
    # (mcts.cpp:40-53, _tree_value_bounds) — fixed during the walk, so
    # computed once after backup
    if use_rewards or float(spec.discount) != 1.0:
        qnode = reward + spec.discount * mean
    else:
        qnode = mean
    if spec.value_rescale:
        visited_n = visits > 0
        q_lo = jnp.min(jnp.where(visited_n, qnode, jnp.float32(3.4e38)),
                       axis=1, keepdims=True)
        q_hi = jnp.max(jnp.where(visited_n, qnode, NEG_INF),
                       axis=1, keepdims=True)
        q_enough = jnp.sum(visited_n.astype(jnp.float32), axis=1,
                           keepdims=True) >= 2.0

    def norm_q(q, edge_p):
        """Rescale to tree bounds then flip (mcts._normalize_q)."""
        if spec.value_rescale:
            scaled = (q - q_lo) / jnp.maximum(q_hi - q_lo, 1e-8)
            scaled = jnp.clip(2.0 * scaled - 1.0, -1.0, 1.0)
            q = jnp.where(q_enough, scaled, jnp.float32(1.0))
        if spec.flip_player2_value:
            q = jnp.where(edge_p == 2.0, -q, q)
        return q

    # ---- 3. root child stats --------------------------------------------
    ci0 = ci[:, 0, :]  # [G, A]
    hasc = (ci0 >= 0).astype(jnp.float32)
    rcv, rcq = _child_stats(ci0, visits, qnode, N)
    rcv = rcv * hasc
    root_tp = to_play_new[:, 0:1].astype(jnp.float32)  # [G, 1]
    q = norm_q(rcq, root_tp)
    q_vis = jnp.where((hasc > 0) & (rcv > 0), q, 0.0)  # [G, A]
    logit0 = logit_new[:, 0, :]
    legal0 = legal_new[:, 0, :] > 0

    gactive = gactive_ref[:, :] > 0
    gm = gm_ref[:, :]
    gbudget = gbudget_ref[:, :]

    if spec.use_gumbel:
        # ---- 4. sequential halving tick (gumbel_zero.cpp:100-118) -------
        import math

        m0 = spec.gumbel_sample_size
        act_f = gactive.astype(jnp.float32)  # noqa: F841 (kept for clarity)
        reached = jnp.where(gactive, (rcv >= gbudget).astype(jnp.float32), 1.0)
        all_reached = jnp.min(reached, axis=1, keepdims=True) > 0  # [G, 1]
        max_count = jnp.max(rcv, axis=1, keepdims=True)
        sigma = (spec.gumbel_sigma_visit_c + max_count) * spec.gumbel_sigma_scale_c
        score = logit0 + sigma * q_vis
        score = jnp.where((legal0) & (rcv > 0), score, NEG_INF)
        m_f = gm.astype(jnp.float32)
        next_budget = jnp.floor(
            spec.num_simulations / (math.log2(m0) * jnp.maximum(m_f / 2.0, 1.0))
        )
        do_halve = all_reached & (next_budget > 0) & (gm > 2) & en
        new_m = gm // 2
        # top-new_m among active by score (ranks via pairwise compare)
        masked = jnp.where(gactive, score, NEG_INF)
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (1, A), 1)
        beats = (masked[:, None, :] > masked[:, :, None]) | (
            (masked[:, None, :] == masked[:, :, None])
            & (iota_a[:, None, :] < iota_a[:, :, None])
        )
        ranks = jnp.sum(beats.astype(jnp.float32), axis=2)  # [G, A]
        new_active = gactive & (ranks < new_m.astype(jnp.float32))
        best_a = _argmax_tiebreak(jnp.where(new_active, score, NEG_INF),
                                  jnp.zeros_like(score))
        best_oh = _onehot(best_a, A)
        new_budget = jnp.sum(best_oh * rcv, axis=1, keepdims=True) + next_budget
        # select on i32, not bool: Mosaic cannot lower select_n -> i1 vectors
        gactive_i = jnp.where(do_halve, new_active.astype(jnp.int32),
                              gactive.astype(jnp.int32))
        gactive = gactive_i > 0
        gm = jnp.where(do_halve, new_m, gm)
        gbudget = jnp.where(do_halve, new_budget, gbudget)

        # ---- 5a. gumbel root step (gumbel_zero.cpp:74-88) ---------------
        count_key = jnp.where(gactive, -rcv, NEG_INF)
        a0 = _argmax_tiebreak(count_key, logit0)  # [G, 1]
    else:
        a0 = None

    # ---- 5b. PUCT walk ---------------------------------------------------

    def puct_action(cur_oh):
        """[G, N] node mask -> (action i32[G,1], ci_row, prior_row)."""
        ci_row_f = _row(cur_oh, ci.astype(jnp.float32))
        ci_row = ci_row_f.astype(jnp.int32)
        cvis, cq = _child_stats(ci_row, visits, qnode, N)
        has_child = (ci_row >= 0).astype(jnp.float32)
        cvis = cvis * has_child
        edge_p = _rowv(cur_oh, to_play_new.astype(jnp.float32))  # [G, 1]
        qn = norm_q(cq, edge_p)
        visited = ((has_child > 0) & (cvis > 0)).astype(jnp.float32)
        qn = qn * visited
        sum_q = jnp.sum(qn, axis=1, keepdims=True)
        num_visited = jnp.sum(visited, axis=1, keepdims=True)
        if spec.init_q_average:
            init_q = jnp.where(num_visited > 0,
                               sum_q / jnp.maximum(num_visited, 1.0), 1.0)
        else:
            init_q = (sum_q - 1.0) / (num_visited + 1.0)
        node_vis = _rowv(cur_oh, visits)
        total_sim = node_vis - 1.0
        bias = spec.puct_init + jnp.log(
            (1.0 + total_sim + spec.puct_base) / spec.puct_base)
        p_row = _row(cur_oh, prior_new)
        l_row = _row(cur_oh, legal_new.astype(jnp.float32))
        u = bias * p_row * jnp.sqrt(jnp.maximum(total_sim, 0.0)) / (1.0 + cvis)
        sc = u + jnp.where(visited > 0, qn, init_q)
        sc = jnp.where(l_row > 0, sc, NEG_INF)
        act = _argmax_tiebreak(sc, p_row)
        return act, ci_row

    zero_i = jnp.zeros((G, 1), jnp.int32)
    root_oh = _onehot(zero_i, N)

    if spec.use_gumbel:
        first_act = a0
        ci_row0 = ci0
    else:
        first_act, ci_row0 = puct_action(root_oh)

    a_oh0 = _onehot(first_act, A)
    child0 = jnp.sum(a_oh0 * ci_row0.astype(jnp.float32), axis=1,
                     keepdims=True).astype(jnp.int32)
    child0 = jnp.where(jnp.sum(a_oh0 * (ci_row0 >= 0).astype(jnp.float32), axis=1,
                               keepdims=True) > 0, child0, -1)
    child0_oh = _onehot(jnp.maximum(child0, 0), N)
    child0_exp = _rowv(child0_oh, expanded) > 0
    stop0_new = child0 < 0
    stop0_leaf = (child0 >= 0) & ~child0_exp
    done0 = stop0_new | stop0_leaf

    parent_id = zero_i
    action_id = first_act
    leaf_id = jnp.where(stop0_leaf, child0, -1)
    # bool-valued carries travel as i32: Mosaic cannot select_n into i1
    isnew = stop0_new.astype(jnp.int32)
    path0 = root_oh + jnp.where(stop0_leaf, 1.0, 0.0) * child0_oh
    cur_oh = jnp.where(done0, root_oh, child0_oh)  # placeholder when done
    cur_id = jnp.where(done0, zero_i, child0)

    def cond(carry):
        done = carry[0]
        return jnp.min(done.astype(jnp.float32)) < 1.0

    def body(carry):
        done, cur_id, cur_oh, parent_id, action_id, leaf_id, isnew, path = carry
        act, ci_row = puct_action(cur_oh)
        a_oh = _onehot(act, A)
        child = jnp.sum(a_oh * ci_row.astype(jnp.float32), axis=1,
                        keepdims=True).astype(jnp.int32)
        child = jnp.where(jnp.sum(a_oh * (ci_row >= 0).astype(jnp.float32), axis=1,
                                  keepdims=True) > 0, child, -1)
        child_oh = _onehot(jnp.maximum(child, 0), N)
        child_exp = _rowv(child_oh, expanded) > 0
        st_new = child < 0
        st_leaf = (child >= 0) & ~child_exp
        st = st_new | st_leaf
        upd = done < 1  # lanes still walking
        path = path + jnp.where(upd, 1.0, 0.0) * cur_oh * (1.0 - path)
        path = path + jnp.where(upd & st_leaf, 1.0, 0.0) * child_oh * (1.0 - path)
        parent_id = jnp.where(upd & st, cur_id, parent_id)
        action_id = jnp.where(upd & st, act, action_id)
        leaf_id = jnp.where(upd & st, jnp.where(st_leaf, child, -1), leaf_id)
        isnew = jnp.where(upd & st, st_new.astype(jnp.int32), isnew)
        descend = upd & ~st
        cur_id = jnp.where(descend, child, cur_id)
        cur_oh = jnp.where(descend, child_oh, cur_oh)
        done = jnp.maximum(done, st.astype(jnp.int32))
        return (done, cur_id, cur_oh, parent_id, action_id, leaf_id, isnew, path)

    carry = (done0.astype(jnp.int32), cur_id, cur_oh, parent_id, action_id,
             leaf_id, isnew, path0)
    (done, cur_id, cur_oh, parent_id, action_id, leaf_id, isnew, path) = (
        jax.lax.while_loop(cond, body, carry)
    )

    # ---- write outputs ---------------------------------------------------
    o_visits[:, :] = visits
    o_mean[:, :] = mean
    o_value[:, :] = value
    o_expanded[:, :] = (expanded > 0).astype(jnp.int32)
    o_terminal[:, :] = (terminal_new > 0).astype(jnp.int32)
    o_parent[:, :] = parent_new
    o_afp[:, :] = afp_new
    o_to_play[:, :] = to_play_new
    o_ci[:, :, :] = ci
    o_prior[:, :, :] = prior_new
    o_logit[:, :, :] = logit_new
    o_legal[:, :, :] = legal_new.astype(jnp.int32)
    o_gactive[:, :] = gactive.astype(jnp.int32)
    o_gm[:, :] = gm
    o_gbudget[:, :] = gbudget
    o_reward[:, :] = reward
    o_nparent[:, :] = parent_id
    o_naction[:, :] = action_id
    o_nleaf[:, :] = leaf_id
    o_nnew[:, :] = isnew.astype(jnp.int32)
    o_npath[:, :] = (path > 0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def fused_tree_step(
    spec: SearchSpec,
    trees: Tree,
    sel: NextSelection,
    leaf_policy, leaf_logit, leaf_legal, leaf_terminal, leaf_value, leaf_turn,
    node_idx, phase,
    interpret: bool = False,
    leaf_reward=None,
):
    """Run the fused tree transition for one simulation on a batch of trees.

    ``phase == 0``: selection only (used once after root init; expand/backup/
    halving are skipped). ``leaf_reward`` enables the MuZero reward path
    (discounted backup; None = zero-reward fast path).
    Returns ``(trees, NextSelection)``.
    """
    assert supports_fused_tree_step(spec), "think_batch == 1 only"
    use_rewards = leaf_reward is not None
    B = trees.visits.shape[0]
    N, A = spec.max_nodes, spec.action_size
    tile = _pick_tile(B, N, A)

    def col(x, dtype=None):
        x = x.reshape(B, 1)
        return x.astype(dtype) if dtype is not None else x

    scalars = jnp.stack([jnp.asarray(node_idx, jnp.int32),
                         jnp.asarray(phase, jnp.int32)])

    # all masks travel as int32 — Mosaic cannot load/store 1-bit memory
    i32 = jnp.int32
    tree_in = [
        trees.visits, trees.mean, trees.value,
        trees.expanded.astype(i32), trees.terminal.astype(i32),
        trees.parent, trees.action_from_parent, trees.to_play,
        trees.children_index, trees.prior, trees.logit,
        trees.legal.astype(i32),
        trees.gumbel_active.astype(i32),
        col(trees.gumbel_sample_size, i32),
        col(trees.gumbel_budget, jnp.float32),
        trees.reward,
    ]
    if leaf_reward is None:
        leaf_reward = jnp.zeros((B,), jnp.float32)
    sel_in = [
        col(sel.parent, i32), col(sel.action, i32),
        col(sel.leaf, i32), col(sel.is_new, i32), sel.path.astype(i32),
        leaf_policy, leaf_logit, leaf_legal.astype(i32),
        col(leaf_terminal, i32), col(leaf_value, jnp.float32),
        col(leaf_turn, i32), col(leaf_reward, jnp.float32),
    ]

    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in tree_in] + [
        jax.ShapeDtypeStruct((B, 1), jnp.int32),   # next parent
        jax.ShapeDtypeStruct((B, 1), jnp.int32),   # next action
        jax.ShapeDtypeStruct((B, 1), jnp.int32),   # next leaf
        jax.ShapeDtypeStruct((B, 1), jnp.int32),   # next is_new
        jax.ShapeDtypeStruct((B, N), jnp.int32),   # next path
    ]

    def bspec_for(shape):
        bshape = (tile,) + tuple(shape[1:])
        rank = len(shape)

        def index_map(i, *_scalar_refs):  # scalar-prefetch refs ride along
            return (i,) + (0,) * (rank - 1)

        return pl.BlockSpec(bshape, index_map, memory_space=pltpu.VMEM)

    in_specs = [bspec_for(x.shape) for x in tree_in + sel_in]
    out_specs = [bspec_for(s.shape) for s in out_shapes]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
    )

    aliases = {i + 1: i for i in range(len(tree_in))}  # +1 for scalar prefetch

    outs = pl.pallas_call(
        functools.partial(_tree_step_kernel, spec, use_rewards),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
        # the [G,A,A] pairwise-rank compare in the halving tick pushes the
        # working set past Mosaic's 16MB default scoped-vmem limit
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(scalars, *tree_in, *sel_in)

    t = outs

    def back(x, like):
        return x.astype(like.dtype) if x.dtype != like.dtype else x

    new_trees = trees.replace(
        visits=t[0], mean=t[1], value=t[2],
        expanded=back(t[3], trees.expanded), terminal=back(t[4], trees.terminal),
        parent=t[5], action_from_parent=t[6], to_play=t[7],
        children_index=t[8], prior=t[9], logit=t[10],
        legal=back(t[11], trees.legal),
        gumbel_active=back(t[12], trees.gumbel_active),
        gumbel_sample_size=t[13].reshape(B) if trees.gumbel_sample_size.ndim == 1 else t[13],
        gumbel_budget=t[14].reshape(B) if trees.gumbel_budget.ndim == 1 else t[14],
        reward=t[15],
    )
    nsel = NextSelection(
        parent=t[16].reshape(B), action=t[17].reshape(B), leaf=t[18].reshape(B),
        is_new=t[19].reshape(B) > 0, path=t[20] > 0,
    )
    return new_trees, nsel


# ---------------------------------------------------------------------------
# pure-JAX reference of the same contract (tests + documentation)
# ---------------------------------------------------------------------------

def _path_mask(spec: SearchSpec, tree: Tree, sel: Selection) -> jnp.ndarray:
    """bool[N] nodes on the selection's path (root..parent, + leaf if any)."""
    n = spec.max_nodes
    iota = jnp.arange(n)
    mask = jnp.zeros((n,), bool)
    mask = jnp.where(sel.leaf >= 0, mask | (iota == sel.leaf), mask)

    def cond(c):
        node, _ = c
        return node >= 0

    def body(c):
        node, mask = c
        mask = mask | (iota == node)
        return tree.parent[jnp.maximum(node, 0)], mask

    _, mask = jax.lax.while_loop(cond, body, (sel.parent, mask))
    return mask


def tree_step_reference(
    spec: SearchSpec,
    trees: Tree,
    sel: NextSelection,
    leaf_policy, leaf_logit, leaf_legal, leaf_terminal, leaf_value, leaf_turn,
    node_idx, phase,
    leaf_reward=None,
):
    """Same contract as ``fused_tree_step`` built on mcts/gumbel functions."""
    from minizero_tpu.search import gumbel as gz
    from minizero_tpu.search import mcts

    B = trees.visits.shape[0]
    en = jnp.asarray(phase, jnp.int32) > 0
    node_b = jnp.full((B,), jnp.asarray(node_idx, jnp.int32))
    if leaf_reward is None:
        leaf_reward = jnp.zeros((B,), jnp.float32)

    def per_game(tree, parent, action, leaf, is_new, pol, lg, lgl, term, val, turn, lrew, nidx):
        tree = mcts.expand_node(
            spec, tree, nidx, parent, action, turn, pol, lg, lgl, term,
            enabled=is_new & en, store_embedding=False)
        start = jnp.where(is_new, nidx, jnp.maximum(leaf, 0))
        v = jnp.where(is_new, val, tree.value[start])
        r = jnp.where(is_new, lrew, tree.reward[start])
        tree = mcts.backup(spec, tree, start, v, r, store_leaf=is_new, enabled=en)
        if spec.use_gumbel:
            tick = gz.sequential_halving_tick(spec, tree)
            tree = tree.replace(
                gumbel_active=jnp.where(en, tick.gumbel_active, tree.gumbel_active),
                gumbel_sample_size=jnp.where(en, tick.gumbel_sample_size,
                                             tree.gumbel_sample_size),
                gumbel_budget=jnp.where(en, tick.gumbel_budget, tree.gumbel_budget),
            )
        return tree

    trees = jax.vmap(per_game)(
        trees, sel.parent, sel.action, sel.leaf, sel.is_new,
        leaf_policy, leaf_logit, leaf_legal, leaf_terminal, leaf_value,
        leaf_turn, leaf_reward, node_b)

    if spec.use_gumbel:
        nsel = jax.vmap(functools.partial(gz.gumbel_select_leaf, spec))(trees)
    else:
        nsel = jax.vmap(lambda t: mcts.select_leaf(spec, t, jnp.int32(0)))(trees)
    paths = jax.vmap(functools.partial(_path_mask, spec))(trees, nsel)
    return trees, NextSelection(
        parent=nsel.parent, action=nsel.action, leaf=nsel.leaf,
        is_new=nsel.is_new, path=paths)
