"""Large-N fused MCTS tree step: edge-indexed stats + per-game row access.

The v1 kernel (``ops/tree_kernel.py``) expresses every tree access as a
one-hot masked reduce over the node axis, so each PUCT walk step costs
O(G*N*A). That is optimal for small trees (Gumbel n=16) but blows up at the
reference's AlphaZero headline config (n=200: measured 18.4 ms/simulation —
88% of the move, ``scripts/perf_az200.py``).

This kernel removes the N factor from the walk:

- **Edge-indexed child statistics.** ``cvis``/``cmean`` rows store each
  node's child visit counts and means directly, updated incrementally during
  backup, so selection at a node reads only that node's O(A) rows — no
  membership compare over all N nodes.
- **Per-game dynamic row reads.** Each game's current-node rows are fetched
  with dynamic-sliced VMEM reads (``ref[g, pl.ds(u, 1), :]``) in a short
  per-game loop, then PUCT scoring runs vectorised over the whole tile.
- **Per-game backup.** The previous simulation's value is propagated by
  walking parent pointers leaf->root, read-modify-writing one O(A) edge row
  per level; node visit/mean arrays (needed by the engine's action decision)
  are updated vectorised via the path mask as before.
- **Terminal children are encoded in the child-index row**
  (``-3 - node``), so the walk needs no per-game reads of an ``expanded``
  array.

Packed layout (lane width ``L = A + 8``): action lanes ``0..A-1`` hold edge
data; ``cix`` spare lanes hold the node scalars [A]=parent, [A+1]=afp,
[A+2]=to_play, [A+3]=expanded, [A+4]=terminal; ``cvis`` lane [A] holds the
node's stored network value. ``cix`` action lanes: ``-2`` illegal, ``-1``
legal unmaterialised, ``>=0`` expanded child node, ``<=-3`` terminal child
node ``-3 - cix``.

Same fast-path contract as v1 (think_batch == 1, no value rescale,
discount == 1, zero in-tree rewards — reference semantics for board-game
self-play, ``actor/mcts.cpp:166-179``) restricted to non-Gumbel (plain
AlphaZero PUCT, ``actor/mcts.cpp:139-149``); Gumbel configs use small trees
and stay on v1. Validated in interpret mode against
``tree_kernel.tree_step_reference`` (tests/test_tree_kernel_v2.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minizero_tpu.ops.tree_kernel import NextSelection
from minizero_tpu.search.mcts import SearchSpec, Tree

NEG_INF = -3.4e38
_SPARE = 8  # spare lanes for packed node scalars
_VMEM_BUDGET = 100 * 1024 * 1024


class PackedTrees(NamedTuple):
    """Edge-indexed tree arrays for a batch of games (capacity ``cap``)."""

    prior: jnp.ndarray  # f32[B, cap, L]
    cvis: jnp.ndarray  # f32[B, cap, L]: child visits; lane A = node value
    cmean: jnp.ndarray  # f32[B, cap, L]: child means (player-1 raw)
    cix: jnp.ndarray  # i32[B, cap, L]: child index enc; node scalars at A..
    visits: jnp.ndarray  # f32[B, cap]
    mean: jnp.ndarray  # f32[B, cap]


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

    Working set ~= (in + out) x 4 big arrays x f32, lanes padded to 128,
    node dim to 8 sublanes."""
    pad_l = -(-lanes // 128) * 128
    pad_n = -(-cap // 8) * 8
    per_game = 2 * 4 * pad_n * pad_l * 4
    tile = batch
    for t in (256, 128, 64, 32, 16, 8):
        if batch % t == 0:
            tile = t
            if per_game * t <= _VMEM_BUDGET:
                return t
    return tile


# ---------------------------------------------------------------------------
# pack / unpack <-> mcts.Tree
# ---------------------------------------------------------------------------

def pack_trees(spec: SearchSpec, trees: Tree, cap: int) -> PackedTrees:
    """Pack a freshly rooted tree batch (only node 0 expanded) — the engine
    calls this right after root expand/backup/noise, so no child edges or
    terminal-child encodings exist yet."""
    a, l = spec.action_size, lane_width(spec)
    b = trees.visits.shape[0]
    f0 = jnp.zeros((b, cap, l), jnp.float32)

    def pad_row(x):  # [B, A] -> [B, L]
        return jnp.pad(x, ((0, 0), (0, l - a)))

    prior = f0.at[:, 0, :].set(pad_row(trees.prior[:, 0, :]))
    cvis = f0.at[:, 0, a].set(trees.value[:, 0])
    cmean = f0
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
    return PackedTrees(
        prior=prior, cvis=cvis, cmean=cmean, cix=cix,
        visits=z.at[:, 0].set(trees.visits[:, 0]),
        mean=z.at[:, 0].set(trees.mean[:, 0]),
    )


def grow(packed: PackedTrees, cap: int) -> PackedTrees:
    """Extend node capacity (stage boundary); new rows read as
    unmaterialised (cix -2)."""
    extra = cap - packed.visits.shape[1]

    def pad3(x, fill=0):
        return jnp.pad(x, ((0, 0), (0, extra), (0, 0)), constant_values=fill)

    return PackedTrees(
        prior=pad3(packed.prior), cvis=pad3(packed.cvis),
        cmean=pad3(packed.cmean), cix=pad3(packed.cix, fill=-2),
        visits=jnp.pad(packed.visits, ((0, 0), (0, extra))),
        mean=jnp.pad(packed.mean, ((0, 0), (0, extra))),
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
        value=padn(packed.cvis[:, :, a]),
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

def _sread(ref, g):
    """Scalar read of a [G, 1] VMEM ref at dynamic row g (reduce of a
    one-element slice — full reduces lift to scalar registers in Mosaic)."""
    return jnp.sum(ref[pl.ds(g, 1), :])


def _extract(row, mask):
    """Scalar: the single element of ``row`` selected by ``mask``."""
    return jnp.sum(jnp.where(mask, row, jnp.zeros((), row.dtype)))


def _tree_step_kernel_v2(
    spec: SearchSpec, cap: int, tile: int,
    # scalar prefetch (SMEM)
    scal_ref,  # [2] = (node_idx s, phase)
    sparent_ref, saction_ref, sleaf_ref, snew_ref,  # i32[B]
    lterm_ref,  # i32[B]
    lvalue_ref,  # f32[B]
    # VMEM inputs (tree arrays aliased to outputs)
    prior_ref, cvis_ref, cmean_ref, cix_ref, visits_ref, mean_ref,
    spath_ref,  # i32[G, cap]
    vnew_ref, vterm_ref, vturn_ref,  # i32[G, 1]
    vparent_ref, vaction_ref,  # i32[G, 1]
    vvalue_ref,  # f32[G, 1]
    lpolicy_ref, llegal_ref,  # [G, A]
    # outputs
    o_prior, o_cvis, o_cmean, o_cix, o_visits, o_mean,
    o_nparent, o_naction, o_nleaf, o_nnew, o_npath,
    # scratch
    s_pr, s_cv, s_cm, s_cx, cur_ref, don_ref,
):
    a, l = spec.action_size, lane_width(spec)
    g_n = tile
    i = pl.program_id(0)
    s = scal_ref[0]
    en = scal_ref[1] > 0

    lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, l), 2)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, l), 1)
    lane_a2 = lane2 < a
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)

    # working copies: copy-then-mutate (whole blocks stream back to the
    # aliased HBM buffers, so every row must be written)
    o_prior[...] = prior_ref[...]
    o_cvis[...] = cvis_ref[...]
    o_cmean[...] = cmean_ref[...]
    o_cix[...] = cix_ref[...]

    # ---- 1. expand at row s (vectorised: s is batch-uniform) -------------
    snewv = vnew_ref[...]  # i32[G, 1]
    fresh3 = ((snewv > 0) & en)[:, :, None]  # [G, 1, 1]
    lterm_v = vterm_ref[...].astype(jnp.float32)  # [G, 1]
    live = 1.0 - lterm_v
    lpol = lpolicy_ref[...]
    lleg = llegal_ref[...].astype(jnp.float32)

    def pad_l(x):
        return jnp.pad(x, ((0, 0), (0, l - a)))

    prior_new = pad_l(lpol * lleg) * live  # [G, L]
    cvis_new = jnp.where(lane2 == a, vvalue_ref[...], 0.0)
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
    o_cvis[:, srow, :] = jnp.where(fresh3, cvis_new[:, None, :],
                                   o_cvis[:, srow, :])
    o_cmean[:, srow, :] = jnp.where(
        fresh3, jnp.zeros((g_n, 1, l), jnp.float32), o_cmean[:, srow, :])
    o_cix[:, srow, :] = jnp.where(fresh3, cix_new[:, None, :],
                                  o_cix[:, srow, :])

    # ---- 2. backup: parent edge write + per-game edge-stat walk ----------
    lane_par = lane3 == a
    lane_afp = lane3 == a + 1

    @pl.when(en)
    def _backup():
        def per_game(g, _):
            row = i * g_n + g
            new_g = snew_ref[row] > 0
            leaf_g = jnp.maximum(sleaf_ref[row], 0)
            par_g = sparent_ref[row]

            @pl.when(new_g)
            def _edge():
                enc = jnp.where(lterm_ref[row] > 0, -3 - s, s)
                prow = o_cix[pl.ds(g, 1), pl.ds(par_g, 1), :]
                o_cix[pl.ds(g, 1), pl.ds(par_g, 1), :] = jnp.where(
                    lane3 == saction_ref[row], enc, prow)

            v0 = jnp.where(new_g, s, leaf_g)
            stored = _extract(
                o_cvis[pl.ds(g, 1), pl.ds(leaf_g, 1), :], lane3 == a)
            val = jnp.where(new_g, lvalue_ref[row], stored)
            # stash per-game (val, start node) for the vectorised node update
            s_pr[pl.ds(g, 1), :] = jnp.broadcast_to(val, (1, l))
            cur_ref[pl.ds(g, 1), :] = jnp.full((1, 1), v0, jnp.int32)

            def wcond(c):
                return c[0] > 0

            def wbody(c):
                v, vl = c
                nrow = o_cix[pl.ds(g, 1), pl.ds(v, 1), :]
                p = _extract(nrow, lane_par)
                av = _extract(nrow, lane_afp)
                oh = lane3 == av  # av < A always
                erow_v = o_cvis[pl.ds(g, 1), pl.ds(p, 1), :]
                nv = erow_v + jnp.where(oh, 1.0, 0.0)
                erow_m = o_cmean[pl.ds(g, 1), pl.ds(p, 1), :]
                nm = jnp.where(
                    oh, erow_m + (vl - erow_m) / jnp.maximum(nv, 1.0), erow_m)
                o_cvis[pl.ds(g, 1), pl.ds(p, 1), :] = nv
                o_cmean[pl.ds(g, 1), pl.ds(p, 1), :] = nm
                return (p, vl)

            jax.lax.while_loop(wcond, wbody, (v0, val))
            return 0

        jax.lax.fori_loop(0, g_n, per_game, 0)

    # vectorised node visits/mean update via the path mask
    leaf_node = jnp.where(snewv > 0, jnp.full((g_n, 1), s, jnp.int32),
                          cur_ref[...])  # cur_ref holds v0 per game
    leaf_oh = (leaf_node == iota_n).astype(jnp.float32)
    path = jnp.maximum(spath_ref[...].astype(jnp.float32), leaf_oh)
    path = jnp.where(en, path, 0.0)
    val_vec = s_pr[:, 0:1]  # stashed leaf values (garbage when !en: masked)
    visits = visits_ref[...] + path
    mean_old = mean_ref[...]
    mean = mean_old + jnp.where(
        path > 0, (val_vec - mean_old) / jnp.maximum(visits, 1.0), 0.0)
    o_visits[...] = visits
    o_mean[...] = mean

    # ---- 3. walk: PUCT selection for the next simulation ------------------
    lane_tp = lane2 == a + 2

    def puct_phase(curvis, tp):
        """Vectorised PUCT over the scratch rows; [G, 1] inputs.

        Mirrors v1 puct_action / mcts._puct_scores (actor/mcts.cpp:181-217).
        """
        cv = s_cv[...]
        cm = s_cm[...]
        pr = s_pr[...]
        cx = s_cx[...]
        legal = (cx != -2) & lane_a2
        q = cm
        if spec.flip_player2_value:
            q = jnp.where(tp == 2, -q, q)
        visited = (cv > 0) & lane_a2
        visited_f = visited.astype(jnp.float32)
        q_v = jnp.where(visited, q, 0.0)
        sum_q = jnp.sum(q_v, axis=1, keepdims=True)
        nvst = jnp.sum(visited_f, axis=1, keepdims=True)
        if spec.init_q_average:
            init_q = jnp.where(nvst > 0, sum_q / jnp.maximum(nvst, 1.0), 1.0)
        else:
            init_q = (sum_q - 1.0) / (nvst + 1.0)
        total = curvis - 1.0
        bias = spec.puct_init + jnp.log(
            (1.0 + total + spec.puct_base) / spec.puct_base)
        u = bias * pr * jnp.sqrt(jnp.maximum(total, 0.0)) / (1.0 + cv)
        sc = u + jnp.where(visited, q, init_q)
        sc = jnp.where(legal, sc, NEG_INF)
        # argmax, ties -> larger prior then lower index (v1 _argmax_tiebreak)
        best = jnp.max(sc, axis=1, keepdims=True)
        tb = jnp.where(sc >= best, pr, NEG_INF)
        best_tb = jnp.max(tb, axis=1, keepdims=True)
        cand = jnp.where(tb >= best_tb, lane2, l)
        act = jnp.min(cand, axis=1, keepdims=True)  # i32[G, 1]
        oh = lane2 == act
        e = jnp.sum(jnp.where(oh, cx, 0), axis=1, keepdims=True)
        chvis = jnp.sum(jnp.where(oh, cv, 0.0), axis=1, keepdims=True)
        return act, e, chvis

    zero_col = jnp.zeros((g_n, 1), jnp.int32)

    # root step: rows are batch-uniform static reads
    s_pr[...] = o_prior[:, 0, :]
    s_cv[...] = o_cvis[:, 0, :]
    s_cm[...] = o_cmean[:, 0, :]
    s_cx[...] = o_cix[:, 0, :]
    root_tp = jnp.sum(jnp.where(lane_tp, s_cx[...], 0), axis=1, keepdims=True)
    act0, e0, chvis0 = puct_phase(visits[:, 0:1], root_tp)
    st_new = e0 == -1
    st_term = e0 <= -3
    done = (st_new | st_term).astype(jnp.int32)
    parent = zero_col
    action = act0
    leaf = jnp.where(st_term, -e0 - 3, -1)
    isnew = st_new.astype(jnp.int32)
    npath = (iota_n == 0).astype(jnp.float32) + jnp.where(
        st_term, (jnp.maximum(leaf, 0) == iota_n).astype(jnp.float32), 0.0)
    cur = jnp.where(done > 0, zero_col, e0)
    curvis = chvis0

    def wcond(c):
        return jnp.min(c[0].astype(jnp.float32)) < 1.0

    def wbody(c):
        done, cur, curvis, parent, action, leaf, isnew, npath = c
        cur_ref[...] = cur
        don_ref[...] = done

        def fetch(g, _):
            d = _sread(don_ref, g)

            @pl.when(d < 1)
            def _rows():
                u = _sread(cur_ref, g)
                gi, ui = pl.ds(g, 1), pl.ds(u, 1)
                s_pr[gi, :] = o_prior[gi, ui, :][:, 0, :]
                s_cv[gi, :] = o_cvis[gi, ui, :][:, 0, :]
                s_cm[gi, :] = o_cmean[gi, ui, :][:, 0, :]
                s_cx[gi, :] = o_cix[gi, ui, :][:, 0, :]

            return 0

        jax.lax.fori_loop(0, g_n, fetch, 0)
        tp = jnp.sum(jnp.where(lane_tp, s_cx[...], 0), axis=1, keepdims=True)
        act, e, chvis = puct_phase(curvis, tp)
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
        descend = upd & ~st
        cur = jnp.where(descend, e, cur)
        curvis = jnp.where(descend, chvis, curvis)
        done = jnp.maximum(done, st.astype(jnp.int32))
        return (done, cur, curvis, parent, action, leaf, isnew, npath)

    carry = (done, cur, curvis, parent, action, leaf, isnew, npath)
    (done, cur, curvis, parent, action, leaf, isnew, npath) = (
        jax.lax.while_loop(wcond, wbody, carry))

    o_nparent[...] = parent
    o_naction[...] = action
    o_nleaf[...] = leaf
    o_nnew[...] = isnew
    o_npath[...] = (npath > 0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def fused_tree_step_v2(
    spec: SearchSpec,
    packed: PackedTrees,
    sel: NextSelection,
    leaf_policy, leaf_legal, leaf_terminal, leaf_value, leaf_turn,
    node_idx, phase,
    interpret: bool = False,
):
    """One simulation's tree transition on edge-indexed packed trees.

    Same contract as v1 ``fused_tree_step`` (NextSelection in/out, phase 0 =
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

    prefetch = [
        scalars,
        sel.parent.astype(i32), sel.action.astype(i32),
        sel.leaf.astype(i32), sel.is_new.astype(i32),
        leaf_terminal.astype(i32),
        leaf_value.astype(jnp.float32),
    ]
    tree_in = [packed.prior, packed.cvis, packed.cmean, packed.cix,
               packed.visits, packed.mean]
    other_in = [
        sel.path.astype(i32),
        col(sel.is_new, i32), col(leaf_terminal, i32), col(leaf_turn, i32),
        col(sel.parent, i32), col(sel.action, i32),
        col(leaf_value, jnp.float32),
        leaf_policy, leaf_legal.astype(i32),
    ]

    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in tree_in] + [
        jax.ShapeDtypeStruct((b, 1), i32),  # next parent
        jax.ShapeDtypeStruct((b, 1), i32),  # next action
        jax.ShapeDtypeStruct((b, 1), i32),  # next leaf
        jax.ShapeDtypeStruct((b, 1), i32),  # next is_new
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
        scratch_shapes=[
            pltpu.VMEM((tile, l), jnp.float32),  # s_pr
            pltpu.VMEM((tile, l), jnp.float32),  # s_cv
            pltpu.VMEM((tile, l), jnp.float32),  # s_cm
            pltpu.VMEM((tile, l), i32),  # s_cx
            pltpu.VMEM((tile, 1), i32),  # cur_ref
            pltpu.VMEM((tile, 1), i32),  # don_ref
        ],
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
            vmem_limit_bytes=_VMEM_BUDGET + 28 * 1024 * 1024),
    )(*prefetch, *tree_in, *other_in)

    new_packed = PackedTrees(*outs[:6])
    nsel = NextSelection(
        parent=outs[6].reshape(b), action=outs[7].reshape(b),
        leaf=outs[8].reshape(b), is_new=outs[9].reshape(b) > 0,
        path=outs[10] > 0,
    )
    return new_packed, nsel
