"""Clobber — pieces capture orthogonally-adjacent opponent pieces; the player
without a move loses (reference
``minizero/environment/clobber/clobber.{h,cpp}``).

Action id = ``dir * N*N + from_pos`` with dir 0=up(+row) 1=down 2=left 3=right
(``clobber.cpp:53-84``). Legal iff the from-square holds the mover's piece and
the destination (inside the board) holds an opponent piece
(``clobber.cpp:184-203``); the whole [4*NN] mask is produced with four shifted
compares. Terminal when the mover has no move; the opponent then wins
(``clobber.cpp:205-217, 288-292``). Features: 18 planes = 8x2 history + 2
turn planes (``clobber.cpp:219-248``); no rotation augmentation
(``clobber.h:77-78``).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec

_HISTORY = 8


@flax.struct.dataclass
class ClobberState:
    board: jnp.ndarray  # i8[NN]
    turn: jnp.ndarray  # i8
    num_moves: jnp.ndarray  # i32
    board_history: jnp.ndarray  # i8[8, NN], [0] = current


class ClobberEnv(Env):
    def __init__(self, board_size: int = 10):
        self.n = board_size
        self.nn = board_size * board_size
        self.spec = EnvSpec(
            name="clobber",
            num_players=2,
            board_size=board_size,
            action_size=4 * self.nn,
            num_input_channels=18,
            input_height=board_size,
            input_width=board_size,
            hidden_height=board_size,
            hidden_width=board_size,
            max_game_length=self.nn,
        )
        # dest position per action; -1 when off-board (clobber.cpp:53-84)
        n = board_size
        dest = np.full((4, self.nn), -1, np.int32)
        for pos in range(self.nn):
            r, c = divmod(pos, n)
            for d, (dr, dc) in enumerate(((1, 0), (-1, 0), (0, -1), (0, 1))):
                rr, cc = r + dr, c + dc
                if 0 <= rr < n and 0 <= cc < n:
                    dest[d, pos] = rr * n + cc
        self._dest = jnp.asarray(dest.reshape(-1))  # i32[4*NN]
        self._from = jnp.asarray(np.tile(np.arange(self.nn, dtype=np.int32), 4))

    def _initial_board(self) -> jnp.ndarray:
        n = self.n
        rows, cols = np.divmod(np.arange(self.nn), n)
        p1 = (rows + cols) % 2 == 1  # even row -> cols 1,3,..; odd row -> 0,2,..
        return jnp.asarray(np.where(p1, 1, 2).astype(np.int8))

    def init(self) -> ClobberState:
        board = self._initial_board()
        history = jnp.zeros((_HISTORY, self.nn), jnp.int8).at[0].set(board)
        return ClobberState(
            board=board,
            turn=jnp.int8(1),
            num_moves=jnp.int32(0),
            board_history=history,
        )

    def step(self, state: ClobberState, action: jnp.ndarray) -> ClobberState:
        from_pos = self._from[action]
        dest = jnp.maximum(self._dest[action], 0)
        board = state.board.at[from_pos].set(0).at[dest].set(state.turn)
        return ClobberState(
            board=board,
            turn=(jnp.int8(3) - state.turn),
            num_moves=state.num_moves + 1,
            board_history=jnp.concatenate([board[None], state.board_history[:-1]], axis=0),
        )

    def legal_mask(self, state: ClobberState) -> jnp.ndarray:
        own = state.board[self._from] == state.turn
        dest_ok = self._dest >= 0
        dest_opp = state.board[jnp.maximum(self._dest, 0)] == (3 - state.turn)
        return own & dest_ok & dest_opp

    def is_terminal(self, state: ClobberState) -> jnp.ndarray:
        return ~jnp.any(self.legal_mask(state))

    def eval_score(self, state: ClobberState) -> jnp.ndarray:
        """The stuck player's opponent wins (clobber.cpp:288-292); 0 when the
        game is not over."""
        stuck = ~jnp.any(self.legal_mask(state))
        win = jnp.where(state.turn == 1, -1.0, 1.0)
        return jnp.where(stuck, win, 0.0).astype(jnp.float32)

    def turn(self, state: ClobberState) -> jnp.ndarray:
        return state.turn

    def features(self, state: ClobberState) -> jnp.ndarray:
        """18 planes NHWC (clobber.cpp:219-248)."""
        n, nn = self.n, self.nn
        turn = state.turn
        opp = (3 - turn).astype(state.board.dtype)
        hist = state.board_history
        own_h = (hist == turn).astype(jnp.float32)
        opp_h = (hist == opp).astype(jnp.float32)
        planes = jnp.stack([own_h, opp_h], axis=1).reshape(2 * _HISTORY, nn)
        p1 = jnp.full((1, nn), (turn == 1).astype(jnp.float32))
        p2 = jnp.full((1, nn), (turn == 2).astype(jnp.float32))
        feats = jnp.concatenate([planes, p1, p2], axis=0)
        return jnp.transpose(feats.reshape(18, n, n), (1, 2, 0))

    def num_rotations(self) -> int:
        return 1  # reference disables rotation for clobber (clobber.h:77-78)
