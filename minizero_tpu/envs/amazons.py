"""Game of the Amazons — queen moves + arrow shots; the player left without a
move loses (reference ``minizero/environment/amazons/amazons.{h,cpp}``).

Composite turn: each player's turn is TWO actions — move an amazon (queen
move over empty squares), then shoot an arrow (queen move from the amazon's
landing square) that permanently blocks a square. Turn schedule
``amazons.h:51``: P1 P1 P2 P2 ... Action ids follow the reference table
(``amazons.cpp initialize()``): first every (from, dir, len) queen move in
(pos, dir, len) order, then NN arrow-target ids (policy sizes
345/616/1001/1520/2193/3040 for n=5..10, ``amazons.h:70``).

Legality via static tables: ``move legal = own amazon at from AND every ray
cell through dest empty`` — one [A_move, NN] path matmul; the arrow mask
projects path-clear moves from the last landing square onto their dest with a
second static matmul. A player with an empty mask loses
(``amazons.cpp updateLegalAction``).

Features: 28 planes = 8x2 own/opp amazon snapshots (every second history
entry, aligned to move phases) + 8 arrow snapshots (aligned to arrow phases)
+ 4 phase planes (``amazons.cpp getFeatures``).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec

_HISTORY = 16  # raw action-level snapshots; features sample every 2nd
# (dx, dy) in reference order, amazons.cpp initialize()
_DIRS = ((-1, -1), (0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (-1, 1), (0, 1), (1, 1))

_ARROW = 3  # board cell value for an arrow


def _move_table(n: int):
    """Queen-move table in reference id order: (from, dest, path[A, NN])."""
    frm, dst, paths = [], [], []
    for y in range(n):
        for x in range(n):
            for dx, dy in _DIRS:
                if dx == 0 and dy == 0:
                    continue
                path = []
                xx, yy = x + dx, y + dy
                while 0 <= xx < n and 0 <= yy < n:
                    path.append(xx + n * yy)
                    frm.append(x + n * y)
                    dst.append(xx + n * yy)
                    row = np.zeros(n * n, np.float32)
                    row[path] = 1.0  # ray cells INCLUDING dest
                    paths.append(row)
                    xx += dx
                    yy += dy
    return (
        np.asarray(frm, np.int32),
        np.asarray(dst, np.int32),
        np.stack(paths),
    )


@flax.struct.dataclass
class AmazonsState:
    board: jnp.ndarray  # i8[NN]: 0 empty, 1/2 amazons, 3 arrow
    num_actions: jnp.ndarray  # i32
    last_dest: jnp.ndarray  # i32: landing square of the last amazon move
    board_history: jnp.ndarray  # i8[16, NN], [0] = current


class AmazonsEnv(Env):
    def __init__(self, board_size: int = 8):
        assert 5 <= board_size <= 10
        n = board_size
        self.n, self.nn = n, n * n
        frm, dst, paths = _move_table(n)
        self.num_moves_part = len(frm)
        self._from = jnp.asarray(frm)
        self._dest = jnp.asarray(dst)
        self._path = jnp.asarray(paths)  # [A_move, NN]
        dest_oh = np.zeros((len(frm), self.nn), np.float32)
        dest_oh[np.arange(len(frm)), dst] = 1.0
        self._dest_onehot = jnp.asarray(dest_oh)
        self.spec = EnvSpec(
            name=f"amazons_{n}x{n}",
            num_players=2,
            board_size=n,
            action_size=self.num_moves_part + self.nn,
            num_input_channels=28,
            input_height=n,
            input_width=n,
            hidden_height=n,
            hidden_width=n,
            max_game_length=2 * self.nn,
        )

    def _initial_board(self) -> jnp.ndarray:
        n = self.n
        interval = n // 3 - (1 if n % 3 == 0 else 0)
        board = np.zeros(self.nn, np.int8)
        for x, y in ((0, interval), (interval, 0), (n - 1 - interval, 0), (n - 1, interval)):
            board[x + n * y] = 1
        for x, y in (
            (0, n - 1 - interval), (interval, n - 1),
            (n - 1 - interval, n - 1), (n - 1, n - 1 - interval),
        ):
            board[x + n * y] = 2
        return jnp.asarray(board)

    def init(self) -> AmazonsState:
        board = self._initial_board()
        # reference pushes the initial board twice (amazons.cpp reset)
        history = jnp.zeros((_HISTORY, self.nn), jnp.int8).at[0].set(board).at[1].set(board)
        return AmazonsState(
            board=board,
            num_actions=jnp.int32(0),
            last_dest=jnp.int32(-1),
            board_history=history,
        )

    @staticmethod
    def _turn_of(num_actions: jnp.ndarray) -> jnp.ndarray:
        """P1 P1 P2 P2 repeating (amazons.h:51)."""
        return jnp.where(num_actions % 4 < 2, jnp.int8(1), jnp.int8(2))

    def turn(self, state: AmazonsState) -> jnp.ndarray:
        return self._turn_of(state.num_actions)

    def legal_mask(self, state: AmazonsState) -> jnp.ndarray:
        board = state.board
        turn = self._turn_of(state.num_actions)
        empty = (board == 0).astype(jnp.float32)
        blocked = jnp.dot(self._path, 1.0 - empty) > 0  # any non-empty ray cell
        is_move_phase = state.num_actions % 2 == 0
        move_mask = (board[self._from] == turn) & ~blocked & is_move_phase
        arrow_sel = ((self._from == state.last_dest) & ~blocked).astype(jnp.float32)
        arrow_mask = (jnp.dot(arrow_sel, self._dest_onehot) > 0) & ~is_move_phase
        return jnp.concatenate([move_mask, arrow_mask])

    def step(self, state: AmazonsState, action: jnp.ndarray) -> AmazonsState:
        board = state.board
        turn = self._turn_of(state.num_actions)
        is_arrow = action >= self.num_moves_part
        a = jnp.clip(action, 0, self.num_moves_part - 1)
        frm, dst = self._from[a], self._dest[a]
        arrow_pos = jnp.clip(action - self.num_moves_part, 0, self.nn - 1)
        moved = board.at[frm].set(0).at[dst].set(turn)
        shot = board.at[arrow_pos].set(_ARROW)
        new_board = jnp.where(is_arrow, shot, moved)
        return AmazonsState(
            board=new_board,
            num_actions=state.num_actions + 1,
            last_dest=jnp.where(is_arrow, state.last_dest, dst).astype(jnp.int32),
            board_history=jnp.concatenate([new_board[None], state.board_history[:-1]], axis=0),
        )

    def is_terminal(self, state: AmazonsState) -> jnp.ndarray:
        return ~jnp.any(self.legal_mask(state))

    def eval_score(self, state: AmazonsState) -> jnp.ndarray:
        """The stuck player's opponent wins (amazons.cpp
        updateLegalAction tail); 0 while the game is live."""
        stuck = ~jnp.any(self.legal_mask(state))
        turn = self._turn_of(state.num_actions)
        win = jnp.where(turn == 1, -1.0, 1.0)
        return jnp.where(stuck, win, 0.0).astype(jnp.float32)

    def features(self, state: AmazonsState) -> jnp.ndarray:
        """28 planes NHWC (amazons.cpp getFeatures)."""
        n, nn = self.n, self.nn
        turn = self._turn_of(state.num_actions)
        opp = (3 - turn).astype(jnp.int8)
        hist = state.board_history  # [16, NN]
        size = state.num_actions + 2  # reference history length
        avail = jnp.minimum(16, size)
        # amazon snapshot offsets: (size-1) % 2, stride 2
        off_move = (size - 1) % 2
        idx_move = off_move + 2 * jnp.arange(8)
        valid_move = idx_move < avail
        snaps = hist[jnp.clip(idx_move, 0, _HISTORY - 1)]  # [8, NN]
        own = (snaps == turn) & valid_move[:, None]
        other = (snaps == opp) & valid_move[:, None]
        pairs = jnp.stack([own, other], axis=1).reshape(16, nn).astype(jnp.float32)
        # arrow snapshot offsets: size % 2, stride 2
        off_arrow = size % 2
        idx_arrow = off_arrow + 2 * jnp.arange(8)
        valid_arrow = idx_arrow < avail
        snaps_a = hist[jnp.clip(idx_arrow, 0, _HISTORY - 1)]
        arrows = ((snaps_a == _ARROW) & valid_arrow[:, None]).astype(jnp.float32)  # [8, NN]
        phase = state.num_actions % 4
        phase_planes = (jnp.arange(4)[:, None] == phase).astype(jnp.float32) * jnp.ones((1, nn))
        feats = jnp.concatenate([pairs, arrows, phase_planes], axis=0)  # [28, NN]
        return jnp.transpose(feats.reshape(28, n, n), (1, 2, 0))

    def num_rotations(self) -> int:
        return 1  # composite move ids; reference rotation not implemented
