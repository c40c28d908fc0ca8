"""Gomoku / Outer-Open Gomoku (reference
``minizero/environment/gomoku/gomoku.{h,cpp}``).

4 feature planes (own/opponent/turn), policy = N*N, win = five in a row
(exactly five when ``exactly_five`` — an overline does not win, reference
``gomoku.cpp:140-163``), draw on full board. The winner is derived from the
last move with vectorised directional run-length counts and cached in the
state. ``outer_open`` restricts Black's first move to the outer two rings
(``gomoku.cpp:53-56``).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec


@flax.struct.dataclass
class GomokuState:
    board: jnp.ndarray  # i8[NN]
    turn: jnp.ndarray  # i8
    num_moves: jnp.ndarray  # i32
    winner: jnp.ndarray  # i8 0/1/2


class GomokuEnv(Env):
    def __init__(self, board_size: int = 15, exactly_five: bool = True, rule: str = "standard"):
        self.n = board_size
        self.nn = board_size * board_size
        self.exactly_five = exactly_five
        self.rule = rule
        self.spec = EnvSpec(
            name="gomoku" if rule == "standard" else "outer_open_gomoku",
            num_players=2,
            board_size=board_size,
            action_size=self.nn,
            num_input_channels=4,
            input_height=board_size,
            input_width=board_size,
            hidden_height=board_size,
            hidden_width=board_size,
            max_game_length=self.nn,
        )
        outer = np.zeros((board_size, board_size), bool)
        outer[:2, :] = outer[-2:, :] = True
        outer[:, :2] = outer[:, -2:] = True
        self._outer = jnp.asarray(outer.reshape(-1))

    def init(self) -> GomokuState:
        return GomokuState(
            board=jnp.zeros((self.nn,), jnp.int8),
            turn=jnp.int8(1),
            num_moves=jnp.int32(0),
            winner=jnp.int8(0),
        )

    def _run_length(self, board2d, pos_r, pos_c, player, dr, dc):
        """Stones of ``player`` in a ray from (pos_r, pos_c) along (dr, dc),
        including the start (reference calculateNumberOfConnection,
        gomoku.cpp:151-164)."""
        n = self.n

        def body(i, carry):
            count, alive = carry
            r = pos_r + dr * i
            c = pos_c + dc * i
            inside = (r >= 0) & (r < n) & (c >= 0) & (c < n)
            match = inside & (board2d[jnp.clip(r, 0, n - 1), jnp.clip(c, 0, n - 1)] == player)
            alive = alive & match
            return (count + alive.astype(jnp.int32), alive)

        count, _ = jax.lax.fori_loop(0, 6, body, (jnp.int32(0), jnp.bool_(True)))
        return count

    def _wins(self, count):
        if self.exactly_five:
            return count == 5
        return count >= 5

    def step(self, state: GomokuState, action: jnp.ndarray) -> GomokuState:
        board = state.board.at[action].set(state.turn)
        board2d = board.reshape(self.n, self.n)
        r = action // self.n
        c = action % self.n
        p = state.turn
        win = jnp.bool_(False)
        for dr, dc in ((1, 0), (0, 1), (1, 1), (1, -1)):
            count = (
                self._run_length(board2d, r, c, p, dr, dc)
                + self._run_length(board2d, r, c, p, -dr, -dc)
                - 1
            )
            win = win | self._wins(count)
        winner = jnp.where(win, p, jnp.int8(0))
        return GomokuState(
            board=board,
            turn=(jnp.int8(3) - state.turn),
            num_moves=state.num_moves + 1,
            winner=winner.astype(jnp.int8),
        )

    def legal_mask(self, state: GomokuState) -> jnp.ndarray:
        empty = state.board == 0
        if self.rule == "outer_open":
            return jnp.where(state.num_moves == 0, empty & self._outer, empty)
        return empty

    def is_terminal(self, state: GomokuState) -> jnp.ndarray:
        return (state.winner != 0) | jnp.all(state.board != 0)

    def eval_score(self, state: GomokuState) -> jnp.ndarray:
        w = state.winner
        return jnp.where(w == 1, 1.0, jnp.where(w == 2, -1.0, 0.0)).astype(jnp.float32)

    def turn(self, state: GomokuState) -> jnp.ndarray:
        return state.turn

    def features(self, state: GomokuState) -> jnp.ndarray:
        own = (state.board == state.turn).astype(jnp.float32)
        opp = (state.board == (3 - state.turn)).astype(jnp.float32)
        p1 = jnp.full((self.nn,), (state.turn == 1).astype(jnp.float32))
        p2 = jnp.full((self.nn,), (state.turn == 2).astype(jnp.float32))
        return jnp.stack([own, opp, p1, p2], axis=-1).reshape(self.n, self.n, 4)
