"""Batched array MCTS.

TPU-native re-design of the reference's pointer-based tree search
(``minizero/actor/mcts.{h,cpp}``, ``actor/tree.h``): instead of a pre-allocated
pool of ``MCTSNode`` objects walked by pointer chasing on CPU threads, the tree
is a struct-of-arrays pytree of fixed capacity ``N = num_simulations + 1``
nodes. Each node keeps per-action child statistics as dense ``[N, A]`` rows, so
PUCT selection is a vectorised argmax over an ``[A]`` vector per descent step,
and a whole batch of independent games advances in lock-step under ``vmap``
(SURVEY.md §2.5 items 1-2; the reference instead batches leaf evaluations from
32-64 actor threads, ``actor/actor_group.cpp:136-148``).

Semantics preserved exactly from the reference (file:line cited per function):
incremental-mean backup, PUCT with visited-children init-Q, min-max value
rescaling via tree value bounds, player value flipping, Dirichlet / Gumbel root
noise, softmax-count action sampling with value threshold.

All functions below operate on a SINGLE game's tree; the self-play engine wraps
them in ``vmap``. ``jnp`` only — fully jittable with static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

NO_NODE = jnp.int32(-1)
NEG_INF = jnp.float32(-3.4e38)


@dataclass(frozen=True)
class SearchSpec:
    """Static search hyperparameters (hashable; closed over by jit).

    Mirrors the actor-group's per-search constants from the reference config
    (``config/configuration.cpp:13-34``).
    """

    action_size: int
    num_simulations: int
    puct_base: float = 19652.0
    puct_init: float = 1.25
    discount: float = 1.0
    value_rescale: bool = False
    init_q_average: bool = False  # reference mcts.cpp:211-216 (#if ATARI)
    flip_player2_value: bool = True  # actor_mcts_value_flipping_player == 'W'
    # noise
    use_dirichlet_noise: bool = True
    dirichlet_alpha: float = 0.03
    dirichlet_epsilon: float = 0.25
    use_gumbel_noise: bool = False
    # gumbel zero
    use_gumbel: bool = False
    gumbel_sample_size: int = 16
    gumbel_sigma_visit_c: float = 50.0
    gumbel_sigma_scale_c: float = 1.0
    # action selection
    select_by_count: bool = False
    softmax_value_threshold: float = 0.1
    # intra-tree leaf batching with virtual loss (console/eval only,
    # reference ZeroActor::step, zero_actor.cpp:129-157)
    think_batch: int = 1

    @property
    def max_nodes(self) -> int:
        # root + one node per simulation (reference allocates
        # (num_simulation + 1) * action_size node pool, actor_group.cpp:183;
        # the dense child-stat layout needs only visited nodes). With leaf
        # batching, one slot per selection: rounds * think_batch.
        k = max(1, self.think_batch)
        rounds = -(-self.num_simulations // k)
        return rounds * k + 1


@flax.struct.dataclass
class Tree:
    """Single-game search tree of capacity N nodes with A actions."""

    # per-node stats (reference MCTSNode fields, mcts.h)
    visits: jnp.ndarray  # f32[N] count_
    mean: jnp.ndarray  # f32[N] mean_ (player-1 perspective)
    value: jnp.ndarray  # f32[N] raw network value_
    reward: jnp.ndarray  # f32[N] reward_
    terminal: jnp.ndarray  # bool[N]
    expanded: jnp.ndarray  # bool[N]
    parent: jnp.ndarray  # i32[N]
    action_from_parent: jnp.ndarray  # i32[N]
    to_play: jnp.ndarray  # i32[N] player to move at node (1-based)
    # per-node per-action child data (dense rows)
    children_index: jnp.ndarray  # i32[N, A] (-1 = not materialised)
    prior: jnp.ndarray  # f32[N, A] policy_ (with dirichlet noise mixed at root)
    logit: jnp.ndarray  # f32[N, A] policy_logit_ (with gumbel noise at root)
    noise: jnp.ndarray  # f32[N, A] policy_noise_
    legal: jnp.ndarray  # bool[N, A]
    num_nodes: jnp.ndarray  # i32 scalar: next free node slot
    # virtual loss for intra-tree leaf batching (reference mcts.h:33-47);
    # evloss[n, a] = in-flight selections through edge (n, a) this round,
    # nvloss[n] = in-flight selections through node n (= evloss of its
    # in-edge; kept separately to avoid parent gathers). Both are zero
    # outside a think-batch round.
    evloss: jnp.ndarray  # f32[N, A]
    nvloss: jnp.ndarray  # f32[N]
    # gumbel sequential-halving state (reference gumbel_zero.h:10-22)
    gumbel_active: jnp.ndarray  # bool[A]: root actions still candidates
    gumbel_sample_size: jnp.ndarray  # i32
    gumbel_budget: jnp.ndarray  # f32: per-candidate visit budget this phase
    # per-node embedding: env state (AlphaZero) or hidden state (MuZero);
    # pytree with leading dim N
    embedding: Any


def init_tree(spec: SearchSpec, embedding_proto: Any, root_to_play: jnp.ndarray) -> Tree:
    """Fresh tree; node 0 reserved for the root (reference Tree::reset,
    tree.h:55-77)."""
    n, a = spec.max_nodes, spec.action_size
    zero_embedding = jax.tree_util.tree_map(
        lambda x: jnp.zeros((n,) + x.shape, x.dtype), embedding_proto
    )
    return Tree(
        visits=jnp.zeros((n,), jnp.float32),
        mean=jnp.zeros((n,), jnp.float32),
        value=jnp.zeros((n,), jnp.float32),
        reward=jnp.zeros((n,), jnp.float32),
        terminal=jnp.zeros((n,), bool),
        expanded=jnp.zeros((n,), bool),
        parent=jnp.full((n,), NO_NODE, jnp.int32),
        action_from_parent=jnp.full((n,), NO_NODE, jnp.int32),
        to_play=jnp.zeros((n,), jnp.int32).at[0].set(root_to_play.astype(jnp.int32)),
        children_index=jnp.full((n, a), NO_NODE, jnp.int32),
        prior=jnp.zeros((n, a), jnp.float32),
        logit=jnp.zeros((n, a), jnp.float32),
        noise=jnp.zeros((n, a), jnp.float32),
        legal=jnp.zeros((n, a), bool),
        num_nodes=jnp.int32(1),
        evloss=jnp.zeros((n, a), jnp.float32),
        nvloss=jnp.zeros((n,), jnp.float32),
        gumbel_active=jnp.zeros((a,), bool),
        gumbel_sample_size=jnp.int32(0),
        gumbel_budget=jnp.float32(0.0),
        embedding=zero_embedding,
    )


# --------------------------------------------------------------------------
# value normalisation (reference MCTSNode::getNormalizedMean, mcts.cpp:40-53)
# --------------------------------------------------------------------------

def _tree_value_bounds(spec: SearchSpec, tree: Tree) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(lower, upper, enough) over all visited nodes' q = reward + d*mean.

    The reference maintains a multiset updated at every backup
    (``mcts.cpp:219-228``); with dense arrays a masked min/max reduction over
    the node pool gives the same bounds. ``enough`` is False when fewer than 2
    visited nodes exist (reference returns 1.0 then, mcts.cpp:44).
    """
    q = tree.reward + spec.discount * tree.mean
    visited = tree.visits > 0
    lo = jnp.min(jnp.where(visited, q, jnp.float32(3.4e38)))
    hi = jnp.max(jnp.where(visited, q, NEG_INF))
    enough = jnp.sum(visited.astype(jnp.int32)) >= 2
    return lo, hi, enough


def _normalize_q(
    spec: SearchSpec,
    q: jnp.ndarray,
    edge_player: jnp.ndarray,
    bounds: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
) -> jnp.ndarray:
    """Apply value rescaling + player flip to raw q values
    (reference mcts.cpp:40-53, without virtual loss — lock-step batching makes
    virtual loss unnecessary on this path)."""
    if spec.value_rescale:
        lo, hi, enough = bounds
        scaled = (q - lo) / jnp.maximum(hi - lo, 1e-8)
        scaled = jnp.clip(2.0 * scaled - 1.0, -1.0, 1.0)
        q = jnp.where(enough, scaled, jnp.float32(1.0))
    if spec.flip_player2_value:
        q = jnp.where(edge_player == 2, -q, q)
    return q


def node_normalized_mean(spec: SearchSpec, tree: Tree, node: jnp.ndarray) -> jnp.ndarray:
    """Normalized mean of a node (its edge player = to_play of its parent;
    for the root, the previous player of the root's to_play)."""
    q = tree.reward[node] + spec.discount * tree.mean[node]
    parent = tree.parent[node]
    edge_player = jnp.where(
        parent >= 0,
        tree.to_play[jnp.maximum(parent, 0)],
        3 - tree.to_play[0],  # root edge belongs to the previous player
    )
    return _normalize_q(spec, q, edge_player, _tree_value_bounds(spec, tree))




def take_node_values(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``values[idx]`` for per-node vectors without a per-lane gather.

    Under ``vmap``, ``x[idx]`` ([A] indices into [N]) lowers to an XLA
    gather that costs ~0.7 ms per b=1024 call on TPU (CLAUDE.md: the #1
    perf killer); the one-hot contraction is a trivial [A, N] reduce."""
    oh = (idx[:, None] == jnp.arange(values.shape[0])[None, :]).astype(values.dtype)
    return oh @ values


# --------------------------------------------------------------------------
# selection (reference MCTS::selectChildByPUCTScore, mcts.cpp:181-198)
# --------------------------------------------------------------------------

def _children_stats(spec: SearchSpec, tree: Tree, node: jnp.ndarray):
    """Gather child (visits, q_norm) rows for one node. Children's edge player
    is ``to_play[node]``."""
    cidx = tree.children_index[node]  # [A]
    has_child = cidx >= 0
    safe = jnp.maximum(cidx, 0)
    c_visits = jnp.where(has_child, take_node_values(tree.visits, safe), 0.0)
    c_q_raw = take_node_values(
        tree.reward + spec.discount * tree.mean, safe)
    edge_player = tree.to_play[node]
    q_norm = _normalize_q(spec, c_q_raw, edge_player, _tree_value_bounds(spec, tree))
    q_norm = jnp.where(has_child & (c_visits > 0), q_norm, 0.0)
    if spec.think_batch > 1:
        # virtual-loss dilution (reference mcts.cpp:51): each in-flight
        # selection counts as a -1 outcome for the edge player; edges with
        # only virtual visits score -1, matching an unexpanded reference
        # child node carrying pure virtual loss
        ev = tree.evloss[node]
        cv = c_visits + ev
        q_norm = jnp.where(cv > 0, (q_norm * c_visits - ev) / jnp.maximum(cv, 1e-8), 0.0)
        c_visits = cv
    return cidx, has_child, c_visits, q_norm


def _puct_scores(spec: SearchSpec, tree: Tree, node: jnp.ndarray) -> jnp.ndarray:
    """[A] PUCT scores for one node's children; illegal actions -> -inf."""
    cidx, has_child, c_visits, q_norm = _children_stats(spec, tree, node)
    # c_visits is count-with-virtual-loss when think_batch > 1; a child with
    # only virtual visits still counts as visited (reference
    # calculateInitQValue skips getCountWithVirtualLoss() == 0, mcts.cpp:206)
    visited = c_visits > 0

    # init Q for unvisited children (reference mcts.cpp:200-217)
    sum_q = jnp.sum(jnp.where(visited, q_norm, 0.0))
    num_visited = jnp.sum(visited.astype(jnp.float32))
    if spec.init_q_average:
        init_q = jnp.where(num_visited > 0, sum_q / jnp.maximum(num_visited, 1.0), 1.0)
    else:
        init_q = (sum_q - 1.0) / (num_visited + 1.0)

    total_sim = tree.visits[node] - 1.0
    if spec.think_batch > 1:
        # reference selectChildByPUCTScore: getCountWithVirtualLoss() - 1
        total_sim = total_sim + tree.nvloss[node]
    puct_bias = spec.puct_init + jnp.log((1.0 + total_sim + spec.puct_base) / spec.puct_base)
    u = puct_bias * tree.prior[node] * jnp.sqrt(jnp.maximum(total_sim, 0.0)) / (1.0 + c_visits)
    q = jnp.where(visited, q_norm, init_q)
    score = u + q
    return jnp.where(tree.legal[node], score, NEG_INF)


def _argmax_with_prior_tiebreak(scores: jnp.ndarray, prior: jnp.ndarray) -> jnp.ndarray:
    """argmax of scores; ties resolved by larger prior then lower index
    (reference mcts.cpp:188-195 keeps the higher-policy child on equal
    score)."""
    best = jnp.max(scores)
    tie = scores >= best
    tiebreak = jnp.where(tie, prior, NEG_INF)
    return jnp.argmax(tiebreak).astype(jnp.int32)


@flax.struct.dataclass
class Selection:
    parent: jnp.ndarray  # i32: node whose child edge was selected
    action: jnp.ndarray  # i32: selected action at parent
    leaf: jnp.ndarray  # i32: existing leaf node revisited (-1 if new edge)
    is_new: jnp.ndarray  # bool: True -> create a node for (parent, action)
    # True when this new edge was already selected this think-batch round —
    # evaluated/expanded once; later selections back up the stored leaf value
    # (reference dedups in-flight leaves, zero_actor.cpp:141-144). Always
    # False when think_batch == 1.
    dup: jnp.ndarray = None


def select_leaf(spec: SearchSpec, tree: Tree, from_node: jnp.ndarray) -> Selection:
    """PUCT walk from ``from_node`` until an unmaterialised child edge or an
    unexpanded (terminal) node (reference MCTS::selectFromNode,
    mcts.cpp:139-149)."""

    def cond(carry):
        node, action, next_node, done = carry
        return ~done

    def body(carry):
        node, _, _, _ = carry
        scores = _puct_scores(spec, tree, node)
        action = _argmax_with_prior_tiebreak(scores, tree.prior[node])
        nxt = tree.children_index[node, action]
        # stop if child missing, or child exists but is an unexpanded
        # (terminal) leaf
        child_is_leaf = (nxt >= 0) & ~tree.expanded[jnp.maximum(nxt, 0)]
        done = (nxt < 0) | child_is_leaf
        # descend when child exists and is expanded
        new_node = jnp.where((nxt >= 0) & ~child_is_leaf, nxt, node)
        return (new_node, action, nxt, done)

    node, action, nxt, _ = jax.lax.while_loop(
        cond, body, (from_node, jnp.int32(0), NO_NODE, ~tree.expanded[from_node])
    )
    # if the start node itself is an unexpanded leaf (terminal root revisit)
    start_leaf = ~tree.expanded[from_node]
    is_new = (nxt < 0) & ~start_leaf
    leaf = jnp.where(start_leaf, from_node, jnp.where(is_new, NO_NODE, nxt))
    if spec.think_batch > 1:
        dup = tree.evloss[node, action] > 0
    else:
        dup = jnp.bool_(False)
    return Selection(parent=node, action=action, leaf=leaf, is_new=is_new, dup=dup)


def add_path_vloss(spec: SearchSpec, tree: Tree, sel: Selection,
                   enabled: jnp.ndarray = None) -> Tree:
    """+1 virtual loss on every edge and node of the selected path
    (reference ZeroActor::step adds to the whole node_path_,
    zero_actor.cpp:145). Scatter-free iota-mask adds over the tiny [N(,A)]
    arrays; all of it is removed at the end of the round (clear_vloss) —
    the reference's removeVirtualLoss bookkeeping nets out to exactly
    that."""
    if enabled is None:
        enabled = jnp.bool_(True)
    n, a = tree.evloss.shape
    iota_n = jnp.arange(n)
    iota_a = jnp.arange(a)
    one = enabled.astype(jnp.float32)
    # the selected edge itself (its child node may not exist yet)
    ev = tree.evloss + ((iota_n == sel.parent)[:, None] & (iota_a == sel.action)[None, :]) * one

    def cond(carry):
        node, _, _ = carry
        return node >= 0

    def body(carry):
        node, ev, nv = carry
        nv = nv + (iota_n == node) * one
        safe = jnp.maximum(node, 0)
        p = tree.parent[safe]
        pa = tree.action_from_parent[safe]
        ev = ev + (((iota_n == p)[:, None] & (iota_a == pa)[None, :]) & (p >= 0)) * one
        return (p, ev, nv)

    _, ev, nv = jax.lax.while_loop(cond, body, (sel.parent, ev, tree.nvloss))
    return tree.replace(evloss=ev, nvloss=nv)


def clear_vloss(tree: Tree) -> Tree:
    """End-of-round virtual-loss removal: every selection's loss is added and
    removed within one round (reference zero_actor.cpp:152-156), so the net
    effect is zeroing."""
    return tree.replace(evloss=jnp.zeros_like(tree.evloss),
                        nvloss=jnp.zeros_like(tree.nvloss))


# --------------------------------------------------------------------------
# expansion + backup (reference MCTS::expand / MCTS::backup, mcts.cpp:151-179)
# --------------------------------------------------------------------------

def expand_node(
    spec: SearchSpec,
    tree: Tree,
    node_idx: jnp.ndarray,
    parent: jnp.ndarray,
    action: jnp.ndarray,
    to_play: jnp.ndarray,
    policy: jnp.ndarray,  # f32[A] network policy (softmax over ALL actions)
    policy_logit: jnp.ndarray,  # f32[A]
    legal: jnp.ndarray,  # bool[A] candidate mask
    terminal: jnp.ndarray,  # bool: node is a terminal state -> not expanded
    embedding: Any = None,
    enabled: jnp.ndarray = None,
    store_embedding: bool = True,
) -> Tree:
    """Materialise node ``node_idx`` with its child candidate rows.

    Like the reference (``zero_actor.cpp:215-229``), priors keep the raw
    network softmax mass of each legal action WITHOUT renormalising over the
    legal subset.

    All writes are iota-mask selects, NOT scatters: under ``vmap`` a
    per-game dynamic index becomes a batched scatter, which TPUs lower
    poorly; dense selects over the tiny [N(, A)] tree arrays are far
    cheaper. ``enabled`` (traced bool) turns the whole expansion into a
    no-op — letting the sim loop run expand+backup unconditionally instead
    of through a vmapped ``lax.cond`` (which executes both branches anyway).
    """
    if enabled is None:
        enabled = jnp.bool_(True)
    expanded = ~terminal
    n = spec.max_nodes
    node_m = (jnp.arange(n) == node_idx) & enabled  # bool[N]
    parent_m = (jnp.arange(n) == parent) & (parent >= 0) & enabled

    if store_embedding:
        def write_embedding(full, leaf):
            m = node_m.reshape((n,) + (1,) * (full.ndim - 1))
            return jnp.where(m, leaf[None].astype(full.dtype), full)

        new_embedding = jax.tree_util.tree_map(write_embedding, tree.embedding, embedding)
    else:
        # caller stores embeddings batch-level at a batch-uniform slot
        # (store_embedding_batch) — far cheaper inside the sim loop
        new_embedding = tree.embedding
    row_m = node_m[:, None]  # [N, 1]
    child_write = parent_m[:, None] & (jnp.arange(tree.children_index.shape[1]) == action)[None, :]
    return tree.replace(
        terminal=jnp.where(node_m, terminal, tree.terminal),
        expanded=jnp.where(node_m, expanded, tree.expanded),
        parent=jnp.where(node_m, parent, tree.parent),
        action_from_parent=jnp.where(node_m, action, tree.action_from_parent),
        to_play=jnp.where(node_m, to_play.astype(jnp.int32), tree.to_play),
        children_index=jnp.where(child_write, node_idx, tree.children_index),
        prior=jnp.where(row_m, (jnp.where(legal, policy, 0.0) * expanded)[None, :], tree.prior),
        logit=jnp.where(row_m, (jnp.where(legal, policy_logit, 0.0) * expanded)[None, :], tree.logit),
        legal=jnp.where(row_m, (legal & expanded)[None, :], tree.legal),
        num_nodes=jnp.maximum(tree.num_nodes, jnp.where(enabled, node_idx + 1, 0)),
    ).replace(embedding=new_embedding)


def store_embedding_batch(trees: Tree, slot: jnp.ndarray, leaf_embedding: Any,
                          enabled: Any = None) -> Tree:
    """Write the batch's leaf embeddings into node ``slot`` of every tree.

    ``slot`` is batch-uniform (the sim counter: node s is created at sim s),
    so this is a dynamic-update-slice along the node axis — XLA keeps it
    in-place inside the sim loop, where a per-game masked rewrite would copy
    the full [B, N, ...] embedding arrays every simulation. ``enabled``
    (bool[B]) keeps the old content for games that revisited an existing
    node instead of creating one; pass ``None`` to write unconditionally
    WITHOUT reading the current slot — correct whenever node ``slot`` can
    only be referenced if sim ``slot`` created it (the kernel sim loops:
    a game whose selection revisited an existing node never allocates node
    ``slot``, so clobbering it is harmless), and required for in-place
    updates, because the read-modify-write form reads the carried buffer
    before writing it, which forces XLA to keep a second copy alive."""
    def write(full, leaf):
        sel = leaf.astype(full.dtype)
        if enabled is not None:
            cur = jax.lax.dynamic_slice_in_dim(full, slot, 1, axis=1)[:, 0]
            m = enabled.reshape((-1,) + (1,) * (leaf.ndim - 1))
            sel = jnp.where(m, sel, cur)
        return jax.lax.dynamic_update_slice_in_dim(full, sel[:, None], slot, axis=1)

    return trees.replace(
        embedding=jax.tree_util.tree_map(write, trees.embedding, leaf_embedding)
    )


def backup(
    spec: SearchSpec,
    tree: Tree,
    leaf: jnp.ndarray,
    value: jnp.ndarray,
    reward: jnp.ndarray,
    store_leaf: jnp.ndarray = None,
    enabled: jnp.ndarray = None,
) -> Tree:
    """Propagate ``value`` from ``leaf`` to the root with incremental means and
    per-step reward discounting (reference MCTS::backup, mcts.cpp:166-179).

    ``store_leaf`` (traced bool, default True) controls whether ``value`` /
    ``reward`` are written at the leaf — False on revisits, where the stored
    values are the inputs. ``enabled`` (traced bool, default True) turns the
    whole backup into a no-op — used by think-batch rounds for deduplicated
    in-flight leaves. Updates are iota-mask selects (scatter-free)."""
    n = spec.max_nodes
    iota = jnp.arange(n)
    if store_leaf is None:
        store_leaf = jnp.bool_(True)
    if enabled is None:
        enabled = jnp.bool_(True)
    leaf_m = (iota == leaf) & store_leaf & enabled
    tree = tree.replace(
        value=jnp.where(leaf_m, value, tree.value),
        reward=jnp.where(leaf_m, reward, tree.reward),
    )

    def cond(carry):
        node, _, _, _ = carry
        return node >= 0

    def body(carry):
        node, updated, visits, mean = carry
        m = (iota == node) & enabled
        new_count = visits + m.astype(jnp.float32)
        mean = mean + jnp.where(m, (updated - mean) / jnp.maximum(new_count, 1.0), 0.0)
        visits = new_count
        node_c = jnp.maximum(node, 0)
        updated = tree.reward[node_c] + spec.discount * updated
        return (tree.parent[node_c], updated, visits, mean)

    start = jnp.where(enabled, leaf, NO_NODE)
    _, _, visits, mean = jax.lax.while_loop(cond, body, (start, value, tree.visits, tree.mean))
    return tree.replace(visits=visits, mean=mean)


# --------------------------------------------------------------------------
# root noise (reference ZeroActor::addNoiseToNodeChildren,
# zero_actor.cpp:194-213)
# --------------------------------------------------------------------------

def add_root_noise(spec: SearchSpec, tree: Tree, rng: jax.Array) -> Tree:
    root = jnp.int32(0)
    legal = tree.legal[root]
    if spec.use_dirichlet_noise:
        # Dirichlet over the legal children only
        gamma = jax.random.gamma(rng, spec.dirichlet_alpha, (spec.action_size,))
        gamma = jnp.where(legal, gamma, 0.0)
        noise = gamma / jnp.maximum(jnp.sum(gamma), 1e-20)
        eps = spec.dirichlet_epsilon
        new_prior = jnp.where(legal, (1.0 - eps) * tree.prior[root] + eps * noise, 0.0)
        return tree.replace(
            prior=tree.prior.at[root].set(new_prior),
            noise=tree.noise.at[root].set(noise),
        )
    if spec.use_gumbel_noise:
        g = jax.random.gumbel(rng, (spec.action_size,))
        g = jnp.where(legal, g, 0.0)
        return tree.replace(
            logit=tree.logit.at[root].set(tree.logit[root] + g),
            noise=tree.noise.at[root].set(g),
        )
    return tree


# --------------------------------------------------------------------------
# action / policy-target extraction
# --------------------------------------------------------------------------

def root_children_visits(tree: Tree) -> jnp.ndarray:
    """f32[A] visit counts of root children (0 for unvisited)."""
    cidx = tree.children_index[0]
    safe = jnp.maximum(cidx, 0)
    return jnp.where(cidx >= 0, take_node_values(tree.visits, safe), 0.0)


def root_children_q(spec: SearchSpec, tree: Tree) -> jnp.ndarray:
    """f32[A] normalized mean of root children (0 where unvisited)."""
    _, has_child, c_visits, q_norm = _children_stats(spec, tree, jnp.int32(0))
    return jnp.where(has_child & (c_visits > 0), q_norm, 0.0)


def select_action_by_max_count(tree: Tree) -> jnp.ndarray:
    """reference MCTS::selectChildByMaxCount (mcts.cpp:91-104).

    Count ties resolve to the higher-prior action: the reference keeps the
    FIRST max in child order, and children are sorted by descending policy
    at expansion (zero_actor.cpp:225-228) — so first == highest policy.
    (The reference's std::sort is unstable, so order among exact policy
    ties is implementation-defined; we use lowest action id.)"""
    return _argmax_with_prior_tiebreak(root_children_visits(tree), tree.prior[0])


def select_action_by_softmax_count(
    spec: SearchSpec, tree: Tree, rng: jax.Array, temperature: jnp.ndarray
) -> jnp.ndarray:
    """Sample an action proportional to count^(1/T) among children whose value
    is within ``softmax_value_threshold`` of the best child's
    (reference MCTS::selectChildBySoftmaxCount, mcts.cpp:106-124)."""
    counts = root_children_visits(tree)
    q = root_children_q(spec, tree)
    best = jnp.argmax(counts)
    best_mean = q[best]
    weight = jnp.power(jnp.maximum(counts, 0.0), 1.0 / jnp.maximum(temperature, 1e-8))
    eligible = (counts > 0) & (q >= best_mean - spec.softmax_value_threshold)
    weight = jnp.where(eligible, weight, 0.0)
    # guard: always at least the max-count child
    weight = jnp.where(jnp.sum(weight) > 0, weight, jnp.zeros_like(weight).at[best].set(1.0))
    return jax.random.categorical(rng, jnp.log(jnp.maximum(weight, 1e-38))).astype(jnp.int32)


def mcts_policy_target(tree: Tree) -> jnp.ndarray:
    """Normalised visit-count distribution over actions — the training policy
    target for non-Gumbel runs (reference getSearchDistributionString,
    mcts.cpp:126-137, normalised at load time by BaseEnvLoader::getPolicy)."""
    counts = root_children_visits(tree)
    return counts / jnp.maximum(jnp.sum(counts), 1e-8)


def is_resign(spec: SearchSpec, tree: Tree, selected_action: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """reference MCTS::isResign (mcts.cpp:84-89)."""
    root_q = node_normalized_mean(spec, tree, jnp.int32(0))
    child = tree.children_index[0, selected_action]
    child_q = node_normalized_mean(spec, tree, jnp.maximum(child, 0))
    child_q = jnp.where(child >= 0, child_q, 0.0)
    return (-root_q < threshold) & (child_q < threshold)


def tree_string(spec: SearchSpec, tree: Tree, action_to_str=str) -> str:
    """SGF-style dump of a single (non-batched) search tree — the analysis
    surface the reference exposes via ``Tree::getTreeInfo_r`` (tree.h:79-110):
    each visited node emits ``;[move]C[count/mean/value/prior]`` and child
    subtrees in parentheses. Host-side (numpy); for console/debug use."""
    import numpy as np

    visits = np.asarray(tree.visits)
    mean = np.asarray(tree.mean)
    value = np.asarray(tree.value)
    prior = np.asarray(tree.prior)
    ci = np.asarray(tree.children_index)
    afp = np.asarray(tree.action_from_parent)
    parent = np.asarray(tree.parent)

    def node_str(n: int) -> str:
        if n == 0:
            move = "root"
        else:
            move = action_to_str(int(afp[n]))
        p = prior[parent[n], afp[n]] if n != 0 else 0.0
        return (f";[{move}]C[count: {visits[n]:.0f}, mean: {mean[n]:.3f}, "
                f"value: {value[n]:.3f}, prior: {p:.3f}]")

    def rec(n: int) -> str:
        kids = [int(c) for c in ci[n] if c >= 0 and visits[int(c)] > 0]
        kids.sort(key=lambda c: -visits[c])
        inner = "".join(f"({rec(c)})" for c in kids)
        return node_str(n) + inner

    return f"({rec(0)})"
