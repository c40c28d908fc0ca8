"""Connect6 — two stones per turn, six in a row wins (reference
``minizero/environment/connect6/connect6.{h,cpp}``).

Turn schedule: Black places 1 stone on move 0, then each player places 2
stones (``connect6.h:24``). Win = six or more in a row through the last move
(``connect6.cpp:217-225``); terminal additionally on a full board
(``connect6.cpp:65-69``).

Features: 24 planes = 8x2 board history + 4 threat-space planes (empty cells
of 6-windows holding exactly 5/4 own stones and no opponent stones, for the
mover and the opponent) + 4 turn/moves-left planes (``connect6.cpp:131-178``).
The reference scans every window per feature call on CPU; here the window
membership is a static [W, NN] matrix so threat planes are two gathers and a
matmul that XLA maps onto the MXU.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec

_HISTORY = 8
_WIN = 6


def _window_tables(n: int):
    """All 6-cell windows in 4 directions: (indices i32[W, 6], membership
    f32[W, NN])."""
    wins = []
    for dr, dc in ((0, 1), (1, 0), (1, 1), (1, -1)):
        for r in range(n):
            for c in range(n):
                rr, cc = r + (_WIN - 1) * dr, c + (_WIN - 1) * dc
                if 0 <= rr < n and 0 <= cc < n:
                    wins.append([(r + i * dr) * n + (c + i * dc) for i in range(_WIN)])
    idx = np.asarray(wins, np.int32)
    member = np.zeros((len(wins), n * n), np.float32)
    for w, cells in enumerate(wins):
        member[w, cells] = 1.0
    return idx, member


@flax.struct.dataclass
class Connect6State:
    board: jnp.ndarray  # i8[NN]
    turn: jnp.ndarray  # i8
    num_moves: jnp.ndarray  # i32
    winner: jnp.ndarray  # i8
    board_history: jnp.ndarray  # i8[8, NN], [0] = current


class Connect6Env(Env):
    def __init__(self, board_size: int = 19):
        self.n = board_size
        self.nn = board_size * board_size
        self.spec = EnvSpec(
            name="connect6",
            num_players=2,
            board_size=board_size,
            action_size=self.nn,
            num_input_channels=24,
            input_height=board_size,
            input_width=board_size,
            hidden_height=board_size,
            hidden_width=board_size,
            max_game_length=self.nn,
        )
        idx, member = _window_tables(board_size)
        self._win_idx = jnp.asarray(idx)  # [W, 6]
        self._win_member = jnp.asarray(member)  # [W, NN]

    @staticmethod
    def _turn_for(num_moves: jnp.ndarray) -> jnp.ndarray:
        """Player to move after ``num_moves`` stones: B,W,W,B,B,W,W,...
        (reference connect6.h:24)."""
        return (1 + ((num_moves + 1) // 2) % 2).astype(jnp.int8)

    def init(self) -> Connect6State:
        return Connect6State(
            board=jnp.zeros((self.nn,), jnp.int8),
            turn=jnp.int8(1),
            num_moves=jnp.int32(0),
            winner=jnp.int8(0),
            board_history=jnp.zeros((_HISTORY, self.nn), jnp.int8),
        )

    def step(self, state: Connect6State, action: jnp.ndarray) -> Connect6State:
        p = state.turn
        board = state.board.at[action].set(p)
        cells = board[self._win_idx]  # [W, 6]
        win = jnp.any(jnp.all(cells == p, axis=1))
        winner = jnp.where(state.winner != 0, state.winner, jnp.where(win, p, jnp.int8(0)))
        num_moves = state.num_moves + 1
        return Connect6State(
            board=board,
            turn=self._turn_for(num_moves),
            num_moves=num_moves,
            winner=winner.astype(jnp.int8),
            board_history=jnp.concatenate([board[None], state.board_history[:-1]], axis=0),
        )

    def legal_mask(self, state: Connect6State) -> jnp.ndarray:
        return state.board == 0

    def is_terminal(self, state: Connect6State) -> jnp.ndarray:
        return (state.winner != 0) | (state.num_moves >= self.nn)

    def eval_score(self, state: Connect6State) -> jnp.ndarray:
        w = state.winner
        return jnp.where(w == 1, 1.0, jnp.where(w == 2, -1.0, 0.0)).astype(jnp.float32)

    def turn(self, state: Connect6State) -> jnp.ndarray:
        return state.turn

    def _threat_space(self, board: jnp.ndarray, p: jnp.ndarray, target: int) -> jnp.ndarray:
        """f32[NN] empty cells of 6-windows with exactly ``target`` stones of
        ``p`` and none of the opponent (reference scanThreadSpace,
        connect6.cpp:81-124)."""
        cells = board[self._win_idx]  # [W, 6]
        own = jnp.sum((cells == p).astype(jnp.int32), axis=1)
        opp = jnp.sum((cells == (3 - p)).astype(jnp.int32), axis=1)
        sel = ((own == target) & (opp == 0)).astype(jnp.float32)  # [W]
        covered = jnp.dot(sel, self._win_member, preferred_element_type=jnp.float32) > 0
        return (covered & (board == 0)).astype(jnp.float32)

    def features(self, state: Connect6State) -> jnp.ndarray:
        """24 planes NHWC (reference connect6.cpp:131-178)."""
        n, nn = self.n, self.nn
        turn = state.turn
        opp = (3 - turn).astype(state.board.dtype)
        hist = state.board_history
        own_h = (hist == turn).astype(jnp.float32)  # [8, NN]
        opp_h = (hist == opp).astype(jnp.float32)
        planes = jnp.stack([own_h, opp_h], axis=1).reshape(2 * _HISTORY, nn)
        threat = jnp.stack(
            [
                self._threat_space(state.board, turn, 5),
                self._threat_space(state.board, turn, 4),
                self._threat_space(state.board, opp, 5),
                self._threat_space(state.board, opp, 4),
            ]
        )  # [4, NN]
        # turn/moves-left planes: 2*(turn==P2) + ((num_moves + 1) % 2)
        turn_idx = 2 * (turn == 2).astype(jnp.int32) + (state.num_moves + 1) % 2
        turn_planes = (jnp.arange(4)[:, None] == turn_idx).astype(jnp.float32) * jnp.ones((1, nn))
        feats = jnp.concatenate([planes, threat, turn_planes], axis=0)  # [24, NN]
        return jnp.transpose(feats.reshape(24, n, n), (1, 2, 0))
