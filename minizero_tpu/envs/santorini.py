"""Santorini — workers climb buildings; reaching level 3 wins (reference
``minizero/environment/santorini/{santorini,board}.{h,cpp}``).

Action space (1900 ids, ``santorini.cpp parseAction``):
  * ids 0..1599: from-square (25) x move-direction (8) x build-direction (8)
  * ids 1600..1899: opening placement of both workers = C(25,2) unordered
    square pairs via the reference's combination encoding

Rules preserved: move to an 8-neighbour square at most one level higher and
not domed-by-construction (``board.cpp getLegalMove``: reachable levels =
0..from_level+1), not onto any worker; build on an 8-neighbour of the landing
square with level <= 3 and no worker (the vacated square is buildable,
``board.cpp getLegalBuild``); placement squares distinct and not on the
opponent's workers (``santorini.cpp isLegalAction``). Win = any of your
workers stands on level 3; stuck player loses (``board.cpp
isTerminal/checkWin``, ``santorini.cpp getEvalScore``).

Features: 50 planes = 8 history boards x (own workers, opp workers, levels
1..4) + 2 turn planes (``santorini.cpp getFeatures``).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec

_N = 5
_NN = 25
_HISTORY = 8
_DIRS = ((-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1))
# reference kDirection order (santorini.cpp:14-22) in (dx, dy):
_REF_DIRS = ((-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1))


def _tables():
    """Move/build/placement tables in reference id order."""
    frm = np.zeros(1600, np.int32)
    to = np.full(1600, -1, np.int32)
    build = np.full(1600, -1, np.int32)
    for a in range(1600):
        f = a // 64
        mdir = (a % 64) // 8
        bdir = a % 8
        fx, fy = f % _N, f // _N
        tx, ty = fx + _REF_DIRS[mdir][0], fy + _REF_DIRS[mdir][1]
        frm[a] = f
        if 0 <= tx < _N and 0 <= ty < _N:
            to[a] = tx + _N * ty
            bx, by = tx + _REF_DIRS[bdir][0], ty + _REF_DIRS[bdir][1]
            if 0 <= bx < _N and 0 <= by < _N:
                build[a] = bx + _N * by
    # placement pairs: id z in 1..300 decodes to (x < y) combination
    pa = np.zeros(300, np.int32)
    pb = np.zeros(300, np.int32)
    for z in range(1, 301):
        x = int(np.ceil((47.0 - np.sqrt(2401 - 8 * z)) / 2))
        enc_xx = (47 - x) * x // 2 + x
        y = z - enc_xx + x
        pa[z - 1], pb[z - 1] = x, y
    return frm, to, build, pa, pb


@flax.struct.dataclass
class SantoriniState:
    levels: jnp.ndarray  # i8[25]: building level 0..4 (4 = dome)
    pieces: jnp.ndarray  # i32[2, 2]: worker squares per player (-1 unplaced)
    turn: jnp.ndarray  # i8
    num_moves: jnp.ndarray  # i32
    hist_levels: jnp.ndarray  # i8[8, 25]
    hist_pieces: jnp.ndarray  # i8[8, 25]: 0 none / 1 / 2


class SantoriniEnv(Env):
    spec = EnvSpec(
        name="santorini",
        num_players=2,
        board_size=_N,
        action_size=1900,
        num_input_channels=50,
        input_height=_N,
        input_width=_N,
        hidden_height=_N,
        hidden_width=_N,
        max_game_length=128,
    )

    def __init__(self):
        frm, to, build, pa, pb = _tables()
        self._from = jnp.asarray(frm)
        self._to = jnp.asarray(to)
        self._build = jnp.asarray(build)
        self._place_a = jnp.asarray(pa)
        self._place_b = jnp.asarray(pb)

    def init(self) -> SantoriniState:
        return SantoriniState(
            levels=jnp.zeros((_NN,), jnp.int8),
            pieces=jnp.full((2, 2), -1, jnp.int32),
            turn=jnp.int8(1),
            num_moves=jnp.int32(0),
            hist_levels=jnp.zeros((_HISTORY, _NN), jnp.int8),
            hist_pieces=jnp.zeros((_HISTORY, _NN), jnp.int8),
        )

    # ------------------------------------------------------------- primitives
    def _piece_plane(self, pieces: jnp.ndarray) -> jnp.ndarray:
        """i8[25]: 0 none, 1 P1 worker, 2 P2 worker."""
        plane = jnp.zeros((_NN,), jnp.int8)
        for p in range(2):
            for k in range(2):
                pos = pieces[p, k]
                plane = jnp.where(
                    pos >= 0,
                    plane.at[jnp.maximum(pos, 0)].set(jnp.int8(p + 1)),
                    plane,
                )
        return plane

    def _placed(self, state: SantoriniState, p_idx) -> jnp.ndarray:
        return jnp.all(state.pieces[p_idx] >= 0)

    # --------------------------------------------------------------- protocol
    def legal_mask(self, state: SantoriniState) -> jnp.ndarray:
        turn = state.turn
        p = turn.astype(jnp.int32) - 1
        o = 1 - p
        occupancy = self._piece_plane(state.pieces)  # i8[25]
        levels = state.levels
        placement_phase = ~self._placed(state, p)

        # placement part: both squares free of the OPPONENT's workers
        # (santorini.cpp isLegalAction; own workers are necessarily unplaced)
        opp_occ = occupancy == (o + 1).astype(jnp.int8)
        place_ok = ~opp_occ[self._place_a] & ~opp_occ[self._place_b] & placement_phase

        # move+build part
        own_from = occupancy[self._from] == turn
        to_valid = self._to >= 0
        to_c = jnp.maximum(self._to, 0)
        from_lv = levels[self._from].astype(jnp.int32)
        to_lv = levels[to_c].astype(jnp.int32)
        climb_ok = to_lv <= from_lv + 1  # board.cpp getLegalMove avail levels
        to_free = occupancy[to_c] == 0
        move_ok = own_from & to_valid & climb_ok & to_free
        b_valid = self._build >= 0
        b_c = jnp.maximum(self._build, 0)
        b_lv = levels[b_c].astype(jnp.int32)
        not_domed = b_lv <= 3
        # occupancy after the move: moved worker now at `to`, `from` vacated
        occ_after = occupancy[b_c]
        b_free = (
            ((occ_after == 0) | (self._build == self._from))
            & (self._build != self._to)
        )
        build_ok = b_valid & not_domed & b_free
        move_mask = move_ok & build_ok & ~placement_phase

        return jnp.concatenate([move_mask, place_ok])

    def step(self, state: SantoriniState, action: jnp.ndarray) -> SantoriniState:
        p = state.turn.astype(jnp.int32) - 1
        is_place = action >= 1600
        za = jnp.clip(action - 1600, 0, 299)
        a = jnp.clip(action, 0, 1599)

        # placement
        placed_pieces = state.pieces.at[p, 0].set(self._place_a[za]).at[p, 1].set(self._place_b[za])
        # move + build
        frm, to, build = self._from[a], self._to[a], self._build[a]
        which = jnp.where(state.pieces[p, 0] == frm, 0, 1)
        moved_pieces = state.pieces.at[p, which].set(to)
        b_c = jnp.clip(build, 0, _NN - 1)
        new_levels = state.levels.at[b_c].add(jnp.where(is_place, 0, 1).astype(jnp.int8))

        pieces = jnp.where(is_place, placed_pieces, moved_pieces)
        levels = jnp.where(is_place, state.levels, new_levels)
        plane = self._piece_plane(pieces)
        return SantoriniState(
            levels=levels,
            pieces=pieces,
            turn=(jnp.int8(3) - state.turn),
            num_moves=state.num_moves + 1,
            hist_levels=jnp.concatenate([levels[None], state.hist_levels[:-1]], axis=0),
            hist_pieces=jnp.concatenate([plane[None], state.hist_pieces[:-1]], axis=0),
        )

    def _check_win(self, state: SantoriniState, p_idx) -> jnp.ndarray:
        """Any worker of player index p_idx on level 3 (board.cpp
        checkWin)."""
        pos = state.pieces[p_idx]
        lv = state.levels[jnp.clip(pos, 0, _NN - 1)].astype(jnp.int32)
        return jnp.any((pos >= 0) & (lv == 3))

    def is_terminal(self, state: SantoriniState) -> jnp.ndarray:
        all_placed = jnp.all(state.pieces >= 0)
        won = self._check_win(state, 0) | self._check_win(state, 1)
        stuck = ~jnp.any(self.legal_mask(state))
        return all_placed & (won | stuck)

    def eval_score(self, state: SantoriniState) -> jnp.ndarray:
        """santorini.cpp getEvalScore: winner by level 3, else the stuck
        player's opponent."""
        w1 = self._check_win(state, 0)
        w2 = self._check_win(state, 1)
        stuck_score = jnp.where(state.turn == 1, -1.0, 1.0)
        score = jnp.where(w1, 1.0, jnp.where(w2, -1.0, stuck_score))
        return jnp.where(self.is_terminal(state), score, 0.0).astype(jnp.float32)

    def turn(self, state: SantoriniState) -> jnp.ndarray:
        return state.turn

    def features(self, state: SantoriniState) -> jnp.ndarray:
        """50 planes NHWC (santorini.cpp getFeatures)."""
        turn = state.turn
        opp = (3 - turn).astype(jnp.int8)
        avail = jnp.minimum(state.num_moves + 1, _HISTORY)
        valid = (jnp.arange(_HISTORY) < avail)[:, None]  # [8, 1]
        hp = state.hist_pieces
        hl = state.hist_levels
        own = ((hp == turn) & valid).astype(jnp.float32)  # [8, 25]
        other = ((hp == opp) & valid).astype(jnp.float32)
        lvl_planes = [
            ((hl == lv) & valid).astype(jnp.float32) for lv in range(1, 5)
        ]  # 4 x [8, 25]
        per_hist = jnp.stack([own, other] + lvl_planes, axis=1)  # [8, 6, 25]
        planes = per_hist.reshape(48, _NN)
        p1 = jnp.full((1, _NN), (turn == 1).astype(jnp.float32))
        p2 = jnp.full((1, _NN), (turn == 2).astype(jnp.float32))
        feats = jnp.concatenate([planes, p1, p2], axis=0)
        return jnp.transpose(feats.reshape(50, _N, _N), (1, 2, 0))

    def num_rotations(self) -> int:
        return 1
