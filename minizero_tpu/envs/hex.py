"""Hex with swap rule (reference ``minizero/environment/hex/hex.{h,cpp}``).

Player 1 connects the left and right edges, Player 2 the top and bottom
(``hex.cpp:act`` edge flags). With the swap rule, the second player may play
on the first stone's cell to swap — the stone is reflected over the
anti-diagonal and recoloured (``hex.cpp`` swap branch). Winner detection is a
connected-components reachability check over the 6-neighbour hex adjacency
(the reference propagates edge flags incrementally); the winner is computed
at ``step`` and cached. No rotation augmentation (hex boards have no square
symmetry; reference ``hex.h:61-62`` maps rotations to identity).
"""

from __future__ import annotations

import math

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec


@flax.struct.dataclass
class HexState:
    board: jnp.ndarray  # i8[NN]
    turn: jnp.ndarray  # i8
    num_moves: jnp.ndarray  # i32
    winner: jnp.ndarray  # i8


class HexEnv(Env):
    def __init__(self, board_size: int = 11, use_swap_rule: bool = True):
        n = board_size
        self.n = n
        self.nn = n * n
        self.use_swap_rule = use_swap_rule
        self.cc_rounds = int(math.ceil(math.log2(max(self.nn, 2)))) + 4
        self.spec = EnvSpec(
            name=f"hex_{n}x{n}",
            num_players=2,
            board_size=n,
            action_size=self.nn,
            num_input_channels=4,
            input_height=n,
            input_width=n,
            hidden_height=n,
            hidden_width=n,
            max_game_length=self.nn + 1,
        )
        # 6-neighbour hex adjacency (reference updateWinner offsets)
        nbr = np.tile(np.arange(self.nn)[:, None], (1, 6))
        valid = np.zeros((self.nn, 6), bool)
        offsets = ((-1, -1), (-1, 0), (0, -1), (0, 1), (1, 0), (1, 1))  # (dr, dc)
        for p in range(self.nn):
            r, c = divmod(p, n)
            for j, (dr, dc) in enumerate(offsets):
                rr, cc = r + dr, c + dc
                if 0 <= rr < n and 0 <= cc < n:
                    nbr[p, j] = rr * n + cc
                    valid[p, j] = True
        self._nbr = jnp.asarray(nbr, jnp.int32)
        self._nbr_valid = jnp.asarray(valid)
        cols = np.arange(self.nn) % n
        rows = np.arange(self.nn) // n
        self._edge1_p1 = jnp.asarray(cols == 0)  # left
        self._edge2_p1 = jnp.asarray(cols == n - 1)  # right
        self._edge1_p2 = jnp.asarray(rows == 0)  # top
        self._edge2_p2 = jnp.asarray(rows == n - 1)  # bottom

    def num_rotations(self) -> int:
        return 1  # no square symmetry (reference hex.h:61-62)

    def init(self) -> HexState:
        return HexState(
            board=jnp.zeros((self.nn,), jnp.int8),
            turn=jnp.int8(1),
            num_moves=jnp.int32(0),
            winner=jnp.int8(0),
        )

    def _connected_to(self, board, player, seed_mask):
        """bool[NN]: stones of ``player`` reachable from ``seed_mask`` through
        same-colour hex neighbours (OR-propagation with pointer-jump-free
        doubling via repeated rounds)."""
        mine = board == player
        reach = seed_mask & mine
        connected = mine[self._nbr] & self._nbr_valid & mine[:, None]
        for _ in range(2 * self.n):
            nbr_reach = jnp.any(connected & reach[self._nbr], axis=1)
            new_reach = reach | (mine & nbr_reach)
            reach = new_reach
        return reach

    def _winner(self, board) -> jnp.ndarray:
        p1_reach = self._connected_to(board, jnp.int8(1), self._edge1_p1)
        p1_win = jnp.any(p1_reach & self._edge2_p1)
        p2_reach = self._connected_to(board, jnp.int8(2), self._edge1_p2)
        p2_win = jnp.any(p2_reach & self._edge2_p2)
        return jnp.where(p1_win, jnp.int8(1), jnp.where(p2_win, jnp.int8(2), jnp.int8(0)))

    def step(self, state: HexState, action: jnp.ndarray) -> HexState:
        n = self.n
        is_swap = (
            jnp.bool_(self.use_swap_rule)
            & (state.num_moves == 1)
            & (state.board[action] != 0)
        )
        # swap: reflect first stone over the anti-diagonal, recolour to P2
        r = action // n
        c = action % n
        reflected = (n - 1 - c) * n + (n - 1 - r)
        board = jnp.where(is_swap, state.board.at[action].set(0), state.board)
        target = jnp.where(is_swap, reflected, action)
        board = board.at[target].set(state.turn)
        winner = self._winner(board)
        return HexState(
            board=board,
            turn=(jnp.int8(3) - state.turn),
            num_moves=state.num_moves + 1,
            winner=winner,
        )

    def legal_mask(self, state: HexState) -> jnp.ndarray:
        empty = state.board == 0
        if self.use_swap_rule:
            # on move 2 every cell is playable (occupied first stone = swap),
            # reference hex.cpp isLegalAction
            return jnp.where(state.num_moves == 1, jnp.ones_like(empty), empty)
        return empty

    def is_terminal(self, state: HexState) -> jnp.ndarray:
        return state.winner != 0

    def eval_score(self, state: HexState) -> jnp.ndarray:
        w = state.winner
        return jnp.where(w == 1, 1.0, jnp.where(w == 2, -1.0, 0.0)).astype(jnp.float32)

    def turn(self, state: HexState) -> jnp.ndarray:
        return state.turn

    def features(self, state: HexState) -> jnp.ndarray:
        own = (state.board == state.turn).astype(jnp.float32)
        opp = (state.board == (3 - state.turn)).astype(jnp.float32)
        p1 = jnp.full((self.nn,), (state.turn == 1).astype(jnp.float32))
        p2 = jnp.full((self.nn,), (state.turn == 2).astype(jnp.float32))
        return jnp.stack([own, opp, p1, p2], axis=-1).reshape(self.n, self.n, 4)
