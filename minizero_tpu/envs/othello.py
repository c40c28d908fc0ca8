"""Othello — vectorised JAX implementation.

Reference: ``minizero/environment/othello/othello.{h,cpp}``. The reference
uses std::bitset rays per direction (``othello.cpp:109-148``,
``getCanPutPoint`` / ``getFlipPoint``); here the same ray algebra runs on 2-D
bool planes with masked shifts, unrolled over the 8 directions — pure
elementwise ops XLA fuses into a handful of kernels.

Semantics: pass is legal only when the mover has no placing move
(``othello.cpp:195-201``), terminal = two consecutive passes
(``othello.cpp:203-209``), eval = stone count difference (``othello.cpp:
211-236``). Features: own / opponent / turn planes (4 channels).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec

_DIRS = ((0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (1, -1), (-1, 1), (-1, -1))


@flax.struct.dataclass
class OthelloState:
    board: jnp.ndarray  # i8[NN] 0/1/2
    turn: jnp.ndarray  # i8
    num_moves: jnp.ndarray  # i32
    consecutive_pass: jnp.ndarray  # i8
    legal_own: jnp.ndarray  # bool[NN]: placing moves for `turn`
    legal_opp: jnp.ndarray  # bool[NN]: placing moves for the other player


def _shift(x: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """Shift a [N, N] plane by (dr, dc), zero-filling (no wrap)."""
    n = x.shape[0]
    out = jnp.roll(x, (dr, dc), axis=(0, 1))
    if dr > 0:
        out = out.at[:dr, :].set(False)
    elif dr < 0:
        out = out.at[dr:, :].set(False)
    if dc > 0:
        out = out.at[:, :dc].set(False)
    elif dc < 0:
        out = out.at[:, dc:].set(False)
    return out


class OthelloEnv(Env):
    def __init__(self, board_size: int = 8):
        self.n = board_size
        self.nn = board_size * board_size
        self.spec = EnvSpec(
            name=f"othello_{board_size}x{board_size}",
            num_players=2,
            board_size=board_size,
            action_size=self.nn + 1,
            num_input_channels=4,
            input_height=board_size,
            input_width=board_size,
            hidden_height=board_size,
            hidden_width=board_size,
            max_game_length=2 * self.nn,
            has_pass=True,
        )

    def _legal_plane(self, own: jnp.ndarray, opp: jnp.ndarray) -> jnp.ndarray:
        """bool[N,N] placing moves for the player holding ``own`` stones
        (reference getCanPutPoint, othello.cpp:46-66)."""
        empty = ~(own | opp)
        legal = jnp.zeros_like(own)
        for dr, dc in _DIRS:
            t = opp & _shift(own, dr, dc)
            for _ in range(self.n - 2):
                t = t | (opp & _shift(t, dr, dc))
            legal = legal | (empty & _shift(t, dr, dc))
        return legal

    def _flips(self, placed: jnp.ndarray, own: jnp.ndarray, opp: jnp.ndarray) -> jnp.ndarray:
        """bool[N,N] opponent stones flipped by ``placed`` (reference
        getFlipPoint, othello.cpp:68-89)."""
        flip = jnp.zeros_like(own)
        for dr, dc in _DIRS:
            x = opp & _shift(placed, dr, dc)
            for _ in range(self.n - 2):
                x = x | (opp & _shift(x, dr, dc))
            closed = jnp.any(own & _shift(x, dr, dc))
            flip = flip | jnp.where(closed, x, False)
        return flip

    def init(self) -> OthelloState:
        n, nn = self.n, self.nn
        board = np.zeros((nn,), np.int8)
        h = n // 2
        board[(h - 1) * n + (h - 1)] = 2  # white
        board[h * n + h] = 2
        board[(h - 1) * n + h] = 1  # black
        board[h * n + (h - 1)] = 1
        board = jnp.asarray(board)
        own = (board == 1).reshape(n, n)
        opp = (board == 2).reshape(n, n)
        return OthelloState(
            board=board,
            turn=jnp.int8(1),
            num_moves=jnp.int32(0),
            consecutive_pass=jnp.int8(0),
            legal_own=self._legal_plane(own, opp).reshape(nn),
            legal_opp=self._legal_plane(opp, own).reshape(nn),
        )

    def step(self, state: OthelloState, action: jnp.ndarray) -> OthelloState:
        n, nn = self.n, self.nn
        is_pass = action >= nn
        pos = jnp.clip(action, 0, nn - 1)
        turn = state.turn
        opp_colour = (3 - turn).astype(state.board.dtype)
        own = (state.board == turn).reshape(n, n)
        opp = (state.board == opp_colour).reshape(n, n)
        placed = jnp.zeros((nn,), bool).at[pos].set(~is_pass).reshape(n, n)
        flips = self._flips(placed, own, opp)
        new_own = own | placed | flips
        new_opp = opp & ~flips
        board = jnp.where(
            is_pass,
            state.board,
            jnp.where(new_own.reshape(nn), turn, jnp.where(new_opp.reshape(nn), opp_colour, jnp.int8(0))),
        )
        b_own = (board == opp_colour).reshape(n, n)  # next player's stones
        b_opp = (board == turn).reshape(n, n)
        return OthelloState(
            board=board,
            turn=opp_colour,
            num_moves=state.num_moves + 1,
            consecutive_pass=jnp.where(is_pass, state.consecutive_pass + 1, 0).astype(jnp.int8),
            legal_own=self._legal_plane(b_own, b_opp).reshape(nn),
            legal_opp=self._legal_plane(b_opp, b_own).reshape(nn),
        )

    def legal_mask(self, state: OthelloState) -> jnp.ndarray:
        has_move = jnp.any(state.legal_own)
        return jnp.concatenate([state.legal_own, (~has_move)[None]])

    def is_terminal(self, state: OthelloState) -> jnp.ndarray:
        return state.consecutive_pass >= 2

    def eval_score(self, state: OthelloState) -> jnp.ndarray:
        black = jnp.sum((state.board == 1).astype(jnp.int32))
        white = jnp.sum((state.board == 2).astype(jnp.int32))
        neither_moves = ~(jnp.any(state.legal_own) | jnp.any(state.legal_opp))
        score = jnp.where(black > white, 1.0, jnp.where(black < white, -1.0, 0.0))
        return jnp.where(neither_moves, score, 0.0).astype(jnp.float32)

    def turn(self, state: OthelloState) -> jnp.ndarray:
        return state.turn

    def features(self, state: OthelloState) -> jnp.ndarray:
        """4 planes: own, opponent, P1-turn, P2-turn (reference
        othello.cpp:238-263), NHWC."""
        n = self.n
        own = (state.board == state.turn).astype(jnp.float32)
        opp = (state.board == (3 - state.turn)).astype(jnp.float32)
        p1 = jnp.full((self.nn,), (state.turn == 1).astype(jnp.float32))
        p2 = jnp.full((self.nn,), (state.turn == 2).astype(jnp.float32))
        return jnp.stack([own, opp, p1, p2], axis=-1).reshape(n, n, 4)
