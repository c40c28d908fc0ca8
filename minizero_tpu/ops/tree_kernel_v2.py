"""Large-N fused MCTS tree step: node-indexed stats + node-space PUCT walk.

The v1 kernel (``ops/tree_kernel.py``) expresses every tree access as a
one-hot masked reduce over the node axis across ~6 tree arrays, so each PUCT
walk step costs O(G*N*A) on several operands. That is optimal for small
trees (Gumbel n=16) but blows up at the reference's AlphaZero headline
config (n=200: measured 18.4 ms/simulation — 88% of the move,
``scripts/perf_az200.py``) — especially since untrained-net PUCT walks are
chain-deep (depth ~ sims/2, CLAUDE.md "depth wall").

This kernel keeps the walk fully vectorised over the game tile (no per-game
scalar loops — dynamic per-game VMEM slicing lowers to O(N) selects per read
and measured 7-17 ms/sim) while touching [G, cap, L] operands only for the
per-level ROW FETCH:

- **Node-indexed statistics.** PUCT child statistics Q(u,a)/N(u,a) ARE the
  child node's mean/visit count (reference ``actor/mcts.cpp:181-198``), and
  a materialised child always has >= 1 visit, so the materialised-children
  half of PUCT runs entirely in node space on [G, cap] vectors: candidate
  mask = (parent_vec == cur), q from ``mean``, exploration from the
  node-indexed edge prior ``pedge`` (recorded when the edge is first
  selected). No [G, cap, L] membership mask anywhere.
- **Lane space only for unmaterialised actions** (which need the parent's
  prior row) and the legality/child encodings — one one-hot row fetch of
  ``prior`` + ``cix`` per level, the irreducible O(cap*L) term.
- The two candidate sets merge under the reference tie-break (max score,
  ties -> larger prior -> lower action index) via constrained max/min
  reductions; a lane holds either a materialised child or not, so the
  chosen action identifies its side uniquely.
- **Backup is loop-free**: node visits/means update in one path-mask pass;
  ``cix`` action lanes encode -2 illegal, -1 legal unmaterialised, >=0
  expanded child node, <=-3 terminal child ``-3 - enc``; spare lanes carry
  [A]=parent, [A+1]=afp, [A+2]=to_play, [A+3]=expanded, [A+4]=terminal.
- Node capacity is staged (65 -> 129 -> ... -> N) by the engine so early
  simulations stream only rows that can exist.

Same fast-path contract as v1's board regime (think_batch == 1, no value
rescale, discount == 1, zero in-tree rewards — reference board-game
self-play semantics, ``actor/mcts.cpp:166-179``) restricted to non-Gumbel
(plain AlphaZero PUCT, ``actor/mcts.cpp:139-149``); Gumbel configs use
small trees and stay on v1. Validated in interpret mode against
``tree_kernel.tree_step_reference`` (tests/test_tree_kernel_v2.py).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minizero_tpu.search.mcts import SearchSpec, Tree

NEG_INF = -3.4e38
BIG_I = 1 << 29
_SPARE = 8  # spare lanes for packed node scalars
_MB = 1024 * 1024
# Working-set budget for tile selection AND the declared vmem_limit. The
# original 100MB (≈ the whole chip's VMEM) made pick_tile choose tiles that
# filled VMEM, so XLA evicted the NET WEIGHTS around every per-simulation
# kernel call — the round-4 az200 trace showed ~47k tiny param re-staging
# copy-starts per 4 moves (~60 per sim, ~34% of device time: bf16[256]
# BN vectors and 1x1 kernels at ~250us apiece). A small budget keeps the
# net resident between kernel calls at the cost of more grid steps.
# Override for experiments: MINIZERO_V2_VMEM_MB.
_VMEM_BUDGET = int(os.environ.get("MINIZERO_V2_VMEM_MB", "28")) * _MB


class PackedTrees(NamedTuple):
    """Node-indexed tree arrays for a batch of games (capacity ``cap``)."""

    prior: jnp.ndarray  # f32[B, cap, L]
    cix: jnp.ndarray  # i32[B, cap, L]: child index enc; node scalars at A..
    visits: jnp.ndarray  # f32[B, cap]
    mean: jnp.ndarray  # f32[B, cap]
    value: jnp.ndarray  # f32[B, cap]: stored network value per node
    pedge: jnp.ndarray  # f32[B, cap]: prior of the edge into the node
    pvec: jnp.ndarray  # i32[B, cap]: parent node (-1 for root/unused rows)
    avec: jnp.ndarray  # i32[B, cap]: action from parent
    pterm: jnp.ndarray  # i32[B, cap]: terminal flag


class V2Selection(NamedTuple):
    """Next-simulation selection; ``prior`` is the chosen edge's prior,
    recorded into ``pedge`` when the edge's node is expanded."""

    parent: jnp.ndarray  # i32[B]
    action: jnp.ndarray  # i32[B]
    leaf: jnp.ndarray  # i32[B] (-1 for new edges)
    is_new: jnp.ndarray  # bool[B]
    path: jnp.ndarray  # bool[B, cap]
    prior: jnp.ndarray  # f32[B]


def supports_fused_tree_step_v2(spec: SearchSpec) -> bool:
    return (
        spec.think_batch == 1
        and not spec.value_rescale
        and float(spec.discount) == 1.0
        and not spec.use_gumbel
    )


def lane_width(spec: SearchSpec) -> int:
    return spec.action_size + _SPARE


def pick_tile(batch: int, cap: int, lanes: int) -> int:
    """Largest power-of-two tile whose blocks fit the VMEM budget.

    Working set ~= (in + out) x 2 big arrays x 2 buffering levels x f32
    plus ~4 array-shaped walk transients, lanes padded to 128, node dim to
    8 sublanes."""
    pad_l = -(-lanes // 128) * 128
    pad_n = -(-cap // 8) * 8
    per_game = (2 * 2 * 2 + 4) * pad_n * pad_l * 4
    tile = batch
    for t in (256, 128, 64, 32, 16, 8):
        if batch % t == 0:
            tile = t
            if per_game * t <= _VMEM_BUDGET:
                return t
    return tile


def empty_selection_v2(spec: SearchSpec, batch: int, cap: int) -> V2Selection:
    i32 = jnp.int32
    return V2Selection(
        parent=jnp.zeros((batch,), i32),
        action=jnp.zeros((batch,), i32),
        leaf=jnp.full((batch,), -1, i32),
        is_new=jnp.zeros((batch,), bool),
        path=jnp.zeros((batch, cap), bool),
        prior=jnp.zeros((batch,), jnp.float32),
    )


# ---------------------------------------------------------------------------
# pack / unpack <-> mcts.Tree
# ---------------------------------------------------------------------------

def pack_trees(spec: SearchSpec, trees: Tree, cap: int) -> PackedTrees:
    """Pack a freshly rooted tree batch (only node 0 expanded, prior already
    noised) — the engine calls this right after root expand/backup/noise, so
    no child edges or terminal-child encodings exist yet."""
    a, l = spec.action_size, lane_width(spec)
    b = trees.visits.shape[0]
    f0 = jnp.zeros((b, cap, l), jnp.float32)

    def pad_row(x):  # [B, A] -> [B, L]
        return jnp.pad(x, ((0, 0), (0, l - a)))

    prior = f0.at[:, 0, :].set(pad_row(trees.prior[:, 0, :]))
    lane = jnp.arange(l, dtype=jnp.int32)[None, :]
    root_x = jnp.where(pad_row(trees.legal[:, 0, :].astype(jnp.int32)) > 0,
                       -1, -2)
    for j, v in enumerate([
        trees.parent[:, 0],
        trees.action_from_parent[:, 0],
        trees.to_play[:, 0],
        trees.expanded[:, 0].astype(jnp.int32),
        trees.terminal[:, 0].astype(jnp.int32),
    ]):
        root_x = jnp.where(lane == a + j, v[:, None], root_x)
    cix = jnp.full((b, cap, l), -2, jnp.int32).at[:, 0, :].set(root_x)
    z = jnp.zeros((b, cap), jnp.float32)
    zi = jnp.full((b, cap), -1, jnp.int32)
    return PackedTrees(
        prior=prior, cix=cix,
        visits=z.at[:, 0].set(trees.visits[:, 0]),
        mean=z.at[:, 0].set(trees.mean[:, 0]),
        value=z.at[:, 0].set(trees.value[:, 0]),
        pedge=z,
        pvec=zi,
        avec=zi,
        pterm=jnp.zeros((b, cap), jnp.int32).at[:, 0].set(
            trees.terminal[:, 0].astype(jnp.int32)),
    )


def grow(packed: PackedTrees, cap: int) -> PackedTrees:
    """Extend node capacity (stage boundary); new rows read as
    unmaterialised (cix -2, parent -1)."""
    extra = cap - packed.visits.shape[1]

    def pad3(x, fill=0):
        return jnp.pad(x, ((0, 0), (0, extra), (0, 0)), constant_values=fill)

    def pad2(x, fill=0):
        return jnp.pad(x, ((0, 0), (0, extra)), constant_values=fill)

    return PackedTrees(
        prior=pad3(packed.prior), cix=pad3(packed.cix, fill=-2),
        visits=pad2(packed.visits), mean=pad2(packed.mean),
        value=pad2(packed.value), pedge=pad2(packed.pedge),
        pvec=pad2(packed.pvec, fill=-1), avec=pad2(packed.avec, fill=-1),
        pterm=pad2(packed.pterm),
    )


def unpack_trees(spec: SearchSpec, packed: PackedTrees, trees: Tree) -> Tree:
    """Write packed stats back into the Tree struct (embedding/logit/noise
    and gumbel fields keep their pre-loop content)."""
    a = spec.action_size
    n = spec.max_nodes
    cap = packed.visits.shape[1]

    def padn(x, fill=0):
        if cap == n:
            return x
        pads = ((0, 0), (0, n - cap)) + ((0, 0),) * (x.ndim - 2)
        return jnp.pad(x, pads, constant_values=fill)

    cx = packed.cix[:, :, :a]
    ci = jnp.where(cx >= 0, cx, jnp.where(cx <= -3, -cx - 3, -1))
    return trees.replace(
        visits=padn(packed.visits),
        mean=padn(packed.mean),
        value=padn(packed.value),
        prior=padn(packed.prior[:, :, :a]),
        legal=padn(cx != -2),
        children_index=padn(ci, fill=-1),
        parent=padn(jnp.maximum(packed.cix[:, :, a + 0], -1), fill=-1),
        action_from_parent=padn(jnp.maximum(packed.cix[:, :, a + 1], -1),
                                fill=-1),
        to_play=padn(jnp.maximum(packed.cix[:, :, a + 2], 0)),
        expanded=padn(packed.cix[:, :, a + 3] > 0),
        terminal=padn(packed.cix[:, :, a + 4] > 0),
    )


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _tree_step_kernel_v2(
    spec: SearchSpec, cap: int, tile: int,
    # scalar prefetch (SMEM)
    scal_ref,  # [2] = (node_idx s, phase)
    # VMEM inputs (tree arrays aliased to outputs)
    prior_ref, cix_ref, visits_ref, mean_ref, value_ref,
    pedge_ref, pvec_ref, avec_ref, pterm_ref,
    spath_ref,  # i32[G, cap]
    vnew_ref, vterm_ref, vturn_ref,  # i32[G, 1]
    vparent_ref, vaction_ref, vleaf_ref,  # i32[G, 1]
    vvalue_ref, vprior_ref,  # f32[G, 1]
    lpolicy_ref, llegal_ref,  # [G, A]
    # outputs
    o_prior, o_cix, o_visits, o_mean, o_value,
    o_pedge, o_pvec, o_avec, o_pterm,
    o_nparent, o_naction, o_nleaf, o_nnew, o_nprior, o_npath,
):
    a, l = spec.action_size, lane_width(spec)
    g_n = tile
    s = scal_ref[0]
    en = scal_ref[1] > 0

    lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, l), 2)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, l), 1)
    lane_a2 = lane2 < a
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    iota_n3 = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 1), 1)

    # working copies: copy-then-mutate (whole blocks stream back to the
    # aliased HBM buffers, so every row must be written)
    o_prior[...] = prior_ref[...]
    o_cix[...] = cix_ref[...]

    # ---- 1. expand at row s (vectorised: s is batch-uniform) -------------
    snewv = vnew_ref[...]  # i32[G, 1]
    fresh2 = (snewv > 0) & en  # [G, 1]
    fresh3 = fresh2[:, :, None]  # [G, 1, 1]
    lterm_v = vterm_ref[...].astype(jnp.float32)  # [G, 1]
    live = 1.0 - lterm_v
    lpol = lpolicy_ref[...]
    lleg = llegal_ref[...].astype(jnp.float32)

    def pad_l(x):
        return jnp.pad(x, ((0, 0), (0, l - a)))

    prior_new = pad_l(lpol * lleg) * live  # [G, L]
    cix_new = jnp.where((pad_l(lleg) * live > 0) & lane_a2, -1, -2)
    lterm_i = (lterm_v > 0).astype(jnp.int32)
    for j, v in enumerate([
        vparent_ref[...], vaction_ref[...], vturn_ref[...],
        1 - lterm_i, lterm_i,
    ]):
        cix_new = jnp.where(lane2 == a + j, v, cix_new)

    srow = pl.ds(s, 1)
    o_prior[:, srow, :] = jnp.where(fresh3, prior_new[:, None, :],
                                    o_prior[:, srow, :])
    o_cix[:, srow, :] = jnp.where(fresh3, cix_new[:, None, :],
                                  o_cix[:, srow, :])

    # node-vector columns at slot s
    colm = (iota_n == s) & fresh2  # [G, cap]
    pvec = jnp.where(colm, vparent_ref[...], pvec_ref[...])
    avec = jnp.where(colm, vaction_ref[...], avec_ref[...])
    pterm = jnp.where(colm, lterm_i, pterm_ref[...])
    pedge = jnp.where(colm, vprior_ref[...], pedge_ref[...])
    value = jnp.where(colm, vvalue_ref[...], value_ref[...])
    o_pvec[...] = pvec
    o_avec[...] = avec
    o_pterm[...] = pterm
    o_pedge[...] = pedge
    o_value[...] = value

    # ---- 2. backup: parent edge write + path-mask node update -------------
    # edge write: parent's cix action lane <- child enc (terminal-coded)
    encv = jnp.where(vterm_ref[...] > 0, -3 - s, s)  # [G, 1]
    # 3D comparisons on i32 (bool minor-dim insertion is unsupported)
    oh_par = vparent_ref[...][:, :, None] == iota_n3  # [G, cap, 1]
    m_edge = oh_par & (lane3 == vaction_ref[...][:, :, None]) & fresh3
    o_cix[...] = jnp.where(m_edge, encv[:, :, None], o_cix[...])

    # start node (new row s or the revisited leaf) and its value
    leaf0 = jnp.maximum(vleaf_ref[...], 0)  # [G, 1]
    v0 = jnp.where(snewv > 0, jnp.full((g_n, 1), s, jnp.int32), leaf0)
    oh_v0 = v0 == iota_n  # [G, cap]
    stored = jnp.sum(jnp.where(oh_v0, value, 0.0), axis=1, keepdims=True)
    val = jnp.where(snewv > 0, vvalue_ref[...], stored)  # [G, 1]

    # node visits/mean update via the recorded path mask + the leaf itself
    path = jnp.maximum(spath_ref[...].astype(jnp.float32),
                       oh_v0.astype(jnp.float32))
    path = jnp.where(en, path, 0.0)
    visits = visits_ref[...] + path
    mean_old = mean_ref[...]
    mean = mean_old + jnp.where(
        path > 0, (val - mean_old) / jnp.maximum(visits, 1.0), 0.0)
    o_visits[...] = visits
    o_mean[...] = mean

    # ---- 3. walk: PUCT selection for the next simulation ------------------
    lane_tp = lane2 == a + 2
    # per-node child encoding (used when the chosen action is materialised)
    enc_vec = jnp.where(pterm > 0, -3 - iota_n, iota_n)  # i32[G, cap]

    def puct_phase(pr, cx, cur, curvis):
        """One PUCT step: materialised children scored in node space
        ([G, cap] vectors), unmaterialised legal actions in lane space,
        merged under the reference tie-break (max score -> larger prior ->
        lower action index; mirrors mcts.cpp:181-217 + _argmax_tiebreak).
        [G, l] rows, [G, 1] scalars."""
        tp = jnp.sum(jnp.where(lane_tp, cx, 0), axis=1, keepdims=True)

        total = curvis - 1.0
        bias = spec.puct_init + jnp.log(
            (1.0 + total + spec.puct_base) / spec.puct_base)
        sq_total = jnp.sqrt(jnp.maximum(total, 0.0))

        # node space: materialised children of cur (always visited)
        childm = pvec == cur  # [G, cap]
        q = mean
        if spec.flip_player2_value:
            q = jnp.where(tp == 2, -q, q)
        u_m = bias * pedge * sq_total / (1.0 + visits)
        sc_m = jnp.where(childm, q + u_m, NEG_INF)
        sum_q = jnp.sum(jnp.where(childm, q, 0.0), axis=1, keepdims=True)
        nvst = jnp.sum(jnp.where(childm, 1.0, 0.0), axis=1, keepdims=True)
        if spec.init_q_average:
            init_q = jnp.where(nvst > 0, sum_q / jnp.maximum(nvst, 1.0), 1.0)
        else:
            init_q = (sum_q - 1.0) / (nvst + 1.0)

        # lane space: legal unmaterialised actions (zero visits)
        unmat = (cx == -1) & lane_a2
        sc_u = jnp.where(unmat, init_q + bias * pr * sq_total, NEG_INF)

        # merged argmax with tie-break; a lane is never in both sets
        s_best = jnp.maximum(jnp.max(sc_m, axis=1, keepdims=True),
                             jnp.max(sc_u, axis=1, keepdims=True))
        tie_m = sc_m >= s_best
        tie_u = sc_u >= s_best
        p_best = jnp.maximum(
            jnp.max(jnp.where(tie_m, pedge, NEG_INF), axis=1, keepdims=True),
            jnp.max(jnp.where(tie_u, pr, NEG_INF), axis=1, keepdims=True))
        am = jnp.min(jnp.where(tie_m & (pedge >= p_best), avec, BIG_I),
                     axis=1, keepdims=True)
        au = jnp.min(jnp.where(tie_u & (pr >= p_best), lane2, BIG_I),
                     axis=1, keepdims=True)
        act = jnp.minimum(am, au)
        is_mat = am < au
        vm = childm & (avec == act)  # the unique child on that action
        e_m = jnp.sum(jnp.where(vm, enc_vec, 0), axis=1, keepdims=True)
        chvis_m = jnp.sum(jnp.where(vm, visits, 0.0), axis=1, keepdims=True)
        e = jnp.where(is_mat, e_m, -1)
        chvis = jnp.where(is_mat, chvis_m, 0.0)
        return act, e, chvis, p_best

    zero_col = jnp.zeros((g_n, 1), jnp.int32)

    # root step: rows are batch-uniform static reads
    act0, e0, chvis0, psel0 = puct_phase(
        o_prior[:, 0, :], o_cix[:, 0, :], zero_col, visits[:, 0:1])
    st_new = e0 == -1
    st_term = e0 <= -3
    done = (st_new | st_term).astype(jnp.int32)
    parent = zero_col
    action = act0
    leaf = jnp.where(st_term, -e0 - 3, -1)
    isnew = st_new.astype(jnp.int32)
    psel = psel0
    npath = (iota_n == 0).astype(jnp.float32) + jnp.where(
        st_term, (jnp.maximum(leaf, 0) == iota_n).astype(jnp.float32), 0.0)
    cur = jnp.where(done > 0, zero_col, e0)
    curvis = chvis0

    def wcond(c):
        return jnp.min(c[0].astype(jnp.float32)) < 1.0

    def wbody(c):
        done, cur, curvis, parent, action, leaf, isnew, psel, npath = c
        oh3 = cur[:, :, None] == iota_n3  # [G, cap, 1]
        pr = jnp.sum(jnp.where(oh3, o_prior[...], 0.0), axis=1)
        cx = jnp.sum(jnp.where(oh3, o_cix[...], 0), axis=1)
        act, e, chvis, p_sel = puct_phase(pr, cx, cur, curvis)
        upd = done < 1
        st_new = upd & (e == -1)
        st_term = upd & (e <= -3)
        st = st_new | st_term
        cur_oh = (cur == iota_n).astype(jnp.float32)
        upd_f = jnp.where(upd, 1.0, 0.0)
        npath = npath + upd_f * cur_oh * (1.0 - npath)
        term_leaf = -e - 3
        term_oh = (jnp.maximum(term_leaf, 0) == iota_n).astype(jnp.float32)
        npath = npath + jnp.where(st_term, 1.0, 0.0) * term_oh * (1.0 - npath)
        parent = jnp.where(st, cur, parent)
        action = jnp.where(st, act, action)
        leaf = jnp.where(st, jnp.where(st_term, term_leaf, -1), leaf)
        isnew = jnp.where(st, st_new.astype(jnp.int32), isnew)
        psel = jnp.where(st, p_sel, psel)
        descend = upd & ~st
        cur = jnp.where(descend, e, cur)
        curvis = jnp.where(descend, chvis, curvis)
        done = jnp.maximum(done, st.astype(jnp.int32))
        return (done, cur, curvis, parent, action, leaf, isnew, psel, npath)

    carry = (done, cur, curvis, parent, action, leaf, isnew, psel, npath)
    (done, cur, curvis, parent, action, leaf, isnew, psel, npath) = (
        jax.lax.while_loop(wcond, wbody, carry))

    o_nparent[...] = parent
    o_naction[...] = action
    o_nleaf[...] = leaf
    o_nnew[...] = isnew
    o_nprior[...] = psel
    o_npath[...] = (npath > 0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def fused_tree_step_v2(
    spec: SearchSpec,
    packed: PackedTrees,
    sel: V2Selection,
    leaf_policy, leaf_legal, leaf_terminal, leaf_value, leaf_turn,
    node_idx, phase,
    interpret: bool = False,
):
    """One simulation's tree transition on node-indexed packed trees.

    Same contract as v1 ``fused_tree_step`` (selection in/out, phase 0 =
    selection only; ``sel.path`` has the packed capacity) but non-Gumbel
    only and without logit bookkeeping (PUCT never reads logits)."""
    assert supports_fused_tree_step_v2(spec)
    b, cap, l = packed.prior.shape
    tile = pick_tile(b, cap, l)

    scalars = jnp.stack([jnp.asarray(node_idx, jnp.int32),
                         jnp.asarray(phase, jnp.int32)])
    i32 = jnp.int32

    def col(x, dtype):
        return x.reshape(b, 1).astype(dtype)

    prefetch = [scalars]
    tree_in = [packed.prior, packed.cix, packed.visits, packed.mean,
               packed.value, packed.pedge, packed.pvec, packed.avec,
               packed.pterm]
    other_in = [
        sel.path.astype(i32),
        col(sel.is_new, i32), col(leaf_terminal, i32), col(leaf_turn, i32),
        col(sel.parent, i32), col(sel.action, i32), col(sel.leaf, i32),
        col(leaf_value, jnp.float32), col(sel.prior, jnp.float32),
        leaf_policy, leaf_legal.astype(i32),
    ]

    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in tree_in] + [
        jax.ShapeDtypeStruct((b, 1), i32),  # next parent
        jax.ShapeDtypeStruct((b, 1), i32),  # next action
        jax.ShapeDtypeStruct((b, 1), i32),  # next leaf
        jax.ShapeDtypeStruct((b, 1), i32),  # next is_new
        jax.ShapeDtypeStruct((b, 1), jnp.float32),  # next edge prior
        jax.ShapeDtypeStruct((b, cap), i32),  # next path
    ]

    def bspec(shape):
        bshape = (tile,) + tuple(shape[1:])
        rank = len(shape)

        def index_map(i, *_):
            return (i,) + (0,) * (rank - 1)

        return pl.BlockSpec(bshape, index_map, memory_space=pltpu.VMEM)

    in_specs = [bspec(x.shape) for x in tree_in + other_in]
    out_specs = [bspec(s.shape) for s in out_shapes]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(b // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    n_pref = len(prefetch)
    aliases = {n_pref + i: i for i in range(len(tree_in))}

    outs = pl.pallas_call(
        functools.partial(_tree_step_kernel_v2, spec, cap, tile),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 28 * _MB),
    )(*prefetch, *tree_in, *other_in)

    nt = len(tree_in)
    new_packed = PackedTrees(*outs[:nt])
    nsel = V2Selection(
        parent=outs[nt].reshape(b), action=outs[nt + 1].reshape(b),
        leaf=outs[nt + 2].reshape(b), is_new=outs[nt + 3].reshape(b) > 0,
        path=outs[nt + 5] > 0, prior=outs[nt + 4].reshape(b),
    )
    return new_packed, nsel
