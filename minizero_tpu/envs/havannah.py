"""Havannah — hex board embedded in a (2n-1)^2 grid; win by bridge (two
corners), fork (three borders), or ring (reference
``minizero/environment/havannah/havannah.{h,cpp}``).

Rules preserved (file:line):
  * valid cells: i+j in [n-1, 3n-3] on the extended grid
    (``havannah.cpp isValidCoor``)
  * swap rule: on move 1 every valid cell is legal including the first
    stone's cell, which swaps it to White (``havannah.cpp act/isLegalAction``)
  * winner checked on the just-played stone's connected group
    (``havannah.cpp updateWinner``): bridge = group touches >= 2 of the 6
    corner cells; fork = group touches >= 3 of the 6 borders (border cells
    exclude corners); ring = group >= 6 cells, new stone has >= 2 own
    neighbours, and either some neighbour has 6 own neighbours (filled ring)
    or the group encloses a hole (``havannah.cpp isCycle/detectHole``)
  * features: 20 planes = 8x2 history + valid-cell plane + swappable plane +
    2 turn planes (``havannah.cpp getFeatures``)

TPU design: group = connected-component labels via min-propagation with
pointer jumping (shared pattern with the Go env); the hole check floods the
complement on a padded grid with the same CC machinery instead of the
reference's iterative sweeps.
"""

from __future__ import annotations

import math

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec

_HISTORY = 8
# hex neighbours of (i, j) on the extended grid (havannah.cpp:296-300)
_NBRS = ((-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0))


@flax.struct.dataclass
class HavannahState:
    board: jnp.ndarray  # i8[EE]
    turn: jnp.ndarray  # i8
    num_moves: jnp.ndarray  # i32
    winner: jnp.ndarray  # i8
    first_action: jnp.ndarray  # i32 (for the swap rule)
    board_history: jnp.ndarray  # i8[8, EE]


class HavannahEnv(Env):
    def __init__(self, board_size: int = 8, use_swap_rule: bool = True):
        n = board_size
        e = 2 * n - 1
        self.n, self.e, self.ee = n, e, e * e
        self.use_swap = use_swap_rule
        self.cc_rounds = int(math.ceil(math.log2(max(self.ee, 2)))) + 4
        self.spec = EnvSpec(
            name=f"havannah{n}x{n}",
            num_players=2,
            board_size=e,  # feature planes live on the extended grid
            action_size=self.ee,
            num_input_channels=20,
            input_height=e,
            input_width=e,
            hidden_height=e,
            hidden_width=e,
            max_game_length=3 * n * n - 3 * n + 2,  # number of valid cells +1
        )
        ii, jj = np.divmod(np.arange(self.ee), e)
        self._valid = jnp.asarray((ii + jj >= n - 1) & (ii + jj <= 3 * n - 3))
        # neighbour table
        nbr = np.tile(np.arange(self.ee)[:, None], (1, 6))
        nvalid = np.zeros((self.ee, 6), bool)
        valid_np = np.asarray(self._valid)
        for p in range(self.ee):
            i, j = divmod(p, e)
            if not valid_np[p]:
                continue
            for k, (di, dj) in enumerate(_NBRS):
                a, b = i + di, j + dj
                if 0 <= a < e and 0 <= b < e and valid_np[a * e + b]:
                    nbr[p, k] = a * e + b
                    nvalid[p, k] = True
        self._nbr = jnp.asarray(nbr)
        self._nbr_valid = jnp.asarray(nvalid)
        # corners (havannah.cpp:78-85)
        corners = [n - 1, e - 1, (n - 1) * e, n * e - 1, (e - 1) * e, (e - 1) * e - 1 + n]
        c = np.zeros(self.ee, bool)
        c[corners] = True
        self._corners = jnp.asarray(c)
        # 6 borders excluding corners (havannah.cpp:66-76)
        borders = np.zeros((6, self.ee), bool)
        for i in range(n - 2):
            borders[0, n + i] = True
            borders[1, (i + 1) * e + n - 2 - i] = True
            borders[2, (n + i) * e] = True
            borders[3, (e - 1) * e + 1 + i] = True
            borders[4, (e - 1 - i) * e - n + 1 + i] = True
            borders[5, (n - 1 - i) * e - 1] = True
        self._borders = jnp.asarray(borders)
        # padded-grid hex neighbour table for the hole flood ((e+2)^2 cells)
        pe = e + 2
        self.pe, self.pee = pe, pe * pe
        pnbr = np.tile(np.arange(self.pee)[:, None], (1, 6))
        pvalid = np.zeros((self.pee, 6), bool)
        for p in range(self.pee):
            i, j = divmod(p, pe)
            for k, (di, dj) in enumerate(_NBRS):
                a, b = i + di, j + dj
                if 0 <= a < pe and 0 <= b < pe:
                    pnbr[p, k] = a * pe + b
                    pvalid[p, k] = True
        self._pnbr = jnp.asarray(pnbr)
        self._pnbr_valid = jnp.asarray(pvalid)
        pi, pj = np.divmod(np.arange(self.pee), pe)
        self._pad_ring = jnp.asarray((pi == 0) | (pi == pe - 1) | (pj == 0) | (pj == pe - 1))
        # map: padded index of each extended-grid cell
        self._pad_index = jnp.asarray(((ii + 1) * pe + (jj + 1)).astype(np.int32))

    # ------------------------------------------------------------- primitives
    def _cc_labels(self, active: jnp.ndarray, nbr, nbr_valid, size: int) -> jnp.ndarray:
        idx = jnp.arange(size, dtype=jnp.int32)
        labels = jnp.where(active, idx, size)
        connected = active[nbr] & nbr_valid & active[:, None]
        for _ in range(self.cc_rounds):
            nl = jnp.where(connected, labels[nbr], size)
            l = jnp.minimum(labels, jnp.min(nl, axis=1))
            l = jnp.minimum(l, l[jnp.clip(l, 0, size - 1)])
            labels = jnp.where(active, l, size)
        return labels

    def _group_of(self, board: jnp.ndarray, pos: jnp.ndarray, player: jnp.ndarray) -> jnp.ndarray:
        """bool[EE]: the connected group of ``player`` stones containing
        ``pos``."""
        active = board == player
        labels = self._cc_labels(active, self._nbr, self._nbr_valid, self.ee)
        return active & (labels == labels[pos])

    def _own_neighbor_count(self, board: jnp.ndarray, player: jnp.ndarray) -> jnp.ndarray:
        """i32[EE]: #own neighbours per cell."""
        own = (board == player).astype(jnp.int32)
        return jnp.sum(jnp.where(self._nbr_valid, own[self._nbr], 0), axis=1)

    def _has_hole(self, group: jnp.ndarray) -> jnp.ndarray:
        """True iff the group encloses a background region (reference
        detectHole, via complement CC on the padded grid)."""
        path_pad = jnp.zeros((self.pee,), bool).at[self._pad_index].set(group)
        background = ~path_pad
        labels = self._cc_labels(background, self._pnbr, self._pnbr_valid, self.pee)
        ring_labels = jnp.zeros((self.pee + 1,), bool).at[
            jnp.where(self._pad_ring, labels, self.pee)
        ].set(True)
        enclosed = background & ~ring_labels[jnp.clip(labels, 0, self.pee)]
        return jnp.any(enclosed)

    def _winner_after(self, board: jnp.ndarray, pos: jnp.ndarray, player: jnp.ndarray) -> jnp.ndarray:
        group = self._group_of(board, pos, player)
        bridge = jnp.sum((group & self._corners).astype(jnp.int32)) >= 2
        border_hits = jnp.sum(
            jnp.any(group[None, :] & self._borders, axis=1).astype(jnp.int32)
        )
        fork = border_hits >= 3
        # ring (isCycle)
        own_nbrs = self._own_neighbor_count(board, player)
        big_enough = jnp.sum(group.astype(jnp.int32)) >= 6
        two_back = own_nbrs[pos] >= 2
        nbr_full = jnp.any(
            self._nbr_valid[pos]
            & (board[self._nbr[pos]] == player)
            & (own_nbrs[self._nbr[pos]] == 6)
        )
        ring = big_enough & two_back & (nbr_full | self._has_hole(group))
        return jnp.where(bridge | fork | ring, player, jnp.int8(0)).astype(jnp.int8)

    # --------------------------------------------------------------- protocol
    def init(self) -> HavannahState:
        return HavannahState(
            board=jnp.zeros((self.ee,), jnp.int8),
            turn=jnp.int8(1),
            num_moves=jnp.int32(0),
            winner=jnp.int8(0),
            first_action=jnp.int32(-1),
            board_history=jnp.zeros((_HISTORY, self.ee), jnp.int8),
        )

    def legal_mask(self, state: HavannahState) -> jnp.ndarray:
        empty = (state.board == 0) & self._valid
        if self.use_swap:
            return jnp.where(state.num_moves == 1, self._valid, empty)
        return empty

    def step(self, state: HavannahState, action: jnp.ndarray) -> HavannahState:
        player = state.turn
        is_swap = (
            jnp.bool_(self.use_swap)
            & (state.num_moves == 1)
            & (action == state.first_action)
        )
        board = jnp.where(
            is_swap, state.board.at[jnp.maximum(state.first_action, 0)].set(0), state.board
        )
        board = board.at[action].set(player)
        winner = jnp.where(
            state.winner != 0, state.winner, self._winner_after(board, action, player)
        )
        return HavannahState(
            board=board,
            turn=(jnp.int8(3) - player),
            num_moves=state.num_moves + 1,
            winner=winner.astype(jnp.int8),
            first_action=jnp.where(state.num_moves == 0, action.astype(jnp.int32), state.first_action),
            board_history=jnp.concatenate([board[None], state.board_history[:-1]], axis=0),
        )

    def is_terminal(self, state: HavannahState) -> jnp.ndarray:
        full = ~jnp.any((state.board == 0) & self._valid)
        return (state.winner != 0) | full

    def eval_score(self, state: HavannahState) -> jnp.ndarray:
        w = state.winner
        return jnp.where(w == 1, 1.0, jnp.where(w == 2, -1.0, 0.0)).astype(jnp.float32)

    def turn(self, state: HavannahState) -> jnp.ndarray:
        return state.turn

    def features(self, state: HavannahState) -> jnp.ndarray:
        """20 planes NHWC (havannah.cpp getFeatures)."""
        e, ee = self.e, self.ee
        turn = state.turn
        opp = (3 - turn).astype(state.board.dtype)
        hist = state.board_history
        own_h = (hist == turn).astype(jnp.float32)
        opp_h = (hist == opp).astype(jnp.float32)
        planes = jnp.stack([own_h, opp_h], axis=1).reshape(2 * _HISTORY, ee)
        boundary = self._valid.astype(jnp.float32)[None]
        swappable = jnp.full(
            (1, ee),
            (jnp.bool_(self.use_swap) & (state.num_moves == 1)).astype(jnp.float32),
        )
        p1 = jnp.full((1, ee), (turn == 1).astype(jnp.float32))
        p2 = jnp.full((1, ee), (turn == 2).astype(jnp.float32))
        feats = jnp.concatenate([planes, boundary, swappable, p1, p2], axis=0)
        return jnp.transpose(feats.reshape(20, e, e), (1, 2, 0))

    def num_rotations(self) -> int:
        return 1
