"""Breakthrough — pawns advance straight or diagonally (captures diagonal
only); reaching the far rank or wiping the opponent wins (reference
``minizero/environment/breakthrough/breakthrough.{h,cpp}``).

The move table reproduces the reference's incremental per-board-size
enumeration exactly (``breakthrough.cpp initialize()``): moves for board
sizes 5..8 are appended in nested-size order so a size-n game's policy ids
are a prefix of the table and match the reference's ids (policy sizes
104/160/228/308 for n=5..8).

Features: 20 planes = 8x2 history + own/opponent threat planes (pieces with a
diagonal capture available) + 2 turn planes (``breakthrough.cpp
getFeatures``). No rotation augmentation (``breakthrough.h:70-71``).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec

_HISTORY = 8
_MAX_N = 8
_DIRS = ((-1, 1), (0, 1), (1, 1), (-1, -1), (0, -1), (1, -1))  # (dx, dy)


def _move_table(board_size: int):
    """(from_xy, dest_xy) arrays in the reference's move-id order for
    ``board_size`` (reference initialize(): smaller-board moves first)."""
    seen = set()
    moves = []  # (fx, fy, dx, dy)
    for n in range(5, _MAX_N + 1):
        for y in range(n):
            for x in range(n):
                for ddx, ddy in _DIRS:
                    xx, yy = x + ddx, y + ddy
                    if 0 <= xx < n and 0 <= yy < n:
                        key = (x, y, xx, yy)
                        if key not in seen:
                            seen.add(key)
                            moves.append(key)
        if n == board_size:
            break
    fx = np.array([m[0] for m in moves], np.int32)
    fy = np.array([m[1] for m in moves], np.int32)
    dx = np.array([m[2] for m in moves], np.int32)
    dy = np.array([m[3] for m in moves], np.int32)
    return fx, fy, dx, dy


@flax.struct.dataclass
class BreakthroughState:
    board: jnp.ndarray  # i8[NN]
    turn: jnp.ndarray  # i8
    num_moves: jnp.ndarray  # i32
    board_history: jnp.ndarray  # i8[8, NN], [0] = current


class BreakthroughEnv(Env):
    def __init__(self, board_size: int = 8):
        assert 5 <= board_size <= _MAX_N
        self.n = board_size
        self.nn = board_size * board_size
        fx, fy, dx, dy = _move_table(board_size)
        # moves outside the current board are impossible by construction
        self._from = jnp.asarray(fx + board_size * fy)
        self._dest = jnp.asarray(dx + board_size * dy)
        self._straight = jnp.asarray(fx == dx)
        self._dy = jnp.asarray(dy - fy)  # +1 or -1
        self.spec = EnvSpec(
            name=f"breakthrough_{board_size}x{board_size}",
            num_players=2,
            board_size=board_size,
            action_size=len(fx),
            num_input_channels=20,
            input_height=board_size,
            input_width=board_size,
            hidden_height=board_size,
            hidden_width=board_size,
            max_game_length=4 * self.nn,
        )

    def _initial_board(self) -> jnp.ndarray:
        n = self.n
        rows = np.arange(self.nn) // n
        board = np.zeros(self.nn, np.int8)
        board[rows <= 1] = 1  # ranks 1-2
        board[rows >= n - 2] = 2  # far ranks
        return jnp.asarray(board)

    def init(self) -> BreakthroughState:
        board = self._initial_board()
        history = jnp.zeros((_HISTORY, self.nn), jnp.int8).at[0].set(board)
        return BreakthroughState(
            board=board,
            turn=jnp.int8(1),
            num_moves=jnp.int32(0),
            board_history=history,
        )

    def step(self, state: BreakthroughState, action: jnp.ndarray) -> BreakthroughState:
        from_pos = self._from[action]
        dest = self._dest[action]
        board = state.board.at[from_pos].set(0).at[dest].set(state.turn)
        return BreakthroughState(
            board=board,
            turn=(jnp.int8(3) - state.turn),
            num_moves=state.num_moves + 1,
            board_history=jnp.concatenate([board[None], state.board_history[:-1]], axis=0),
        )

    def legal_mask(self, state: BreakthroughState) -> jnp.ndarray:
        """reference isLegalAction (breakthrough.cpp): own piece moving one
        rank toward the opponent; straight moves cannot capture."""
        board = state.board
        turn = state.turn
        own = board[self._from] == turn
        forward = self._dy == jnp.where(turn == 1, 1, -1)
        dest_val = board[self._dest]
        not_own_dest = dest_val != turn
        no_straight_capture = ~(self._straight & (dest_val != 0))
        return own & forward & not_own_dest & no_straight_capture

    def _winner(self, state: BreakthroughState) -> jnp.ndarray:
        board2d = state.board.reshape(self.n, self.n)
        p1_gone = ~jnp.any(state.board == 1)
        p2_gone = ~jnp.any(state.board == 2)
        p1_home = jnp.any(board2d[-1] == 1)  # P1 reaches far rank
        p2_home = jnp.any(board2d[0] == 2)  # P2 reaches rank 1
        w = jnp.where(p1_gone, 2, jnp.where(p2_gone, 1, 0))
        return jnp.where(p1_home, 1, jnp.where(p2_home, 2, w)).astype(jnp.int8)

    def is_terminal(self, state: BreakthroughState) -> jnp.ndarray:
        return self._winner(state) != 0

    def eval_score(self, state: BreakthroughState) -> jnp.ndarray:
        w = self._winner(state)
        return jnp.where(w == 1, 1.0, jnp.where(w == 2, -1.0, 0.0)).astype(jnp.float32)

    def turn(self, state: BreakthroughState) -> jnp.ndarray:
        return state.turn

    def _threat_plane(self, board: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
        """f32[NN]: pieces of ``p`` with an opponent piece a diagonal step
        ahead (reference isThreatPosition, with proper edge clipping)."""
        n = self.n
        b2 = board.reshape(n, n)
        opp = (3 - p).astype(board.dtype)
        own = b2 == p
        opp_m = (b2 == opp).astype(jnp.float32)
        # shift the opponent mask one rank toward p's rear, one file sideways
        pad = jnp.pad(opp_m, 1)
        up = jnp.where(p == 1, 1, -1)  # p1 attacks row+1
        # attacked-from positions: opp at (r+up, c+/-1)
        rows = jnp.arange(n)[:, None] + up + 1
        left = pad[rows, jnp.arange(n)[None, :]]  # (r+up, c-1) via pad offset
        right = pad[rows, jnp.arange(n)[None, :] + 2]
        threat = own & ((left + right) > 0)
        return threat.astype(jnp.float32).reshape(-1)

    def features(self, state: BreakthroughState) -> jnp.ndarray:
        """20 planes NHWC (reference breakthrough.cpp getFeatures)."""
        n, nn = self.n, self.nn
        turn = state.turn
        opp = (3 - turn).astype(state.board.dtype)
        hist = state.board_history
        own_h = (hist == turn).astype(jnp.float32)
        opp_h = (hist == opp).astype(jnp.float32)
        planes = jnp.stack([own_h, opp_h], axis=1).reshape(2 * _HISTORY, nn)
        t_own = self._threat_plane(state.board, turn)
        t_opp = self._threat_plane(state.board, opp.astype(jnp.int8))
        p1 = jnp.full((nn,), (turn == 1).astype(jnp.float32))
        p2 = jnp.full((nn,), (turn == 2).astype(jnp.float32))
        feats = jnp.concatenate([planes, t_own[None], t_opp[None], p1[None], p2[None]], axis=0)
        return jnp.transpose(feats.reshape(20, n, n), (1, 2, 0))

    def num_rotations(self) -> int:
        return 1  # reference disables rotation (breakthrough.h:70-71)
