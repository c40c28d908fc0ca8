"""TicTacToe — the reference's simplest env template
(``minizero/environment/tictactoe/tictactoe.{h,cpp}``), re-expressed as pure
fixed-shape JAX functions.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec


@flax.struct.dataclass
class TicTacToeState:
    board: jnp.ndarray  # int8[9]: 0 empty, 1 O (player1), 2 X (player2)
    turn: jnp.ndarray  # int8 scalar: 1 or 2
    num_moves: jnp.ndarray  # int32 scalar


# All 8 winning lines as position-index triples.
_LINES = np.array(
    [[0, 1, 2], [3, 4, 5], [6, 7, 8], [0, 3, 6], [1, 4, 7], [2, 5, 8], [0, 4, 8], [2, 4, 6]],
    dtype=np.int32,
)


class TicTacToeEnv(Env):
    spec = EnvSpec(
        name="tictactoe",
        num_players=2,
        board_size=3,
        action_size=9,
        num_input_channels=4,
        input_height=3,
        input_width=3,
        hidden_height=3,
        hidden_width=3,
        max_game_length=9,
    )

    def init(self) -> TicTacToeState:
        return TicTacToeState(
            board=jnp.zeros((9,), jnp.int8),
            turn=jnp.int8(1),
            num_moves=jnp.int32(0),
        )

    def step(self, state: TicTacToeState, action: jnp.ndarray) -> TicTacToeState:
        # reference tictactoe.cpp:20-27
        board = state.board.at[action].set(state.turn)
        return TicTacToeState(
            board=board,
            turn=(jnp.int8(3) - state.turn),
            num_moves=state.num_moves + 1,
        )

    def legal_mask(self, state: TicTacToeState) -> jnp.ndarray:
        return state.board == 0

    def _winner(self, state: TicTacToeState) -> jnp.ndarray:
        """0 none, 1 player1, 2 player2 (reference ``eval()``,
        tictactoe.cpp:118-144)."""
        lines = state.board[jnp.asarray(_LINES)]  # [8, 3]
        line_win = (lines[:, 0] == lines[:, 1]) & (lines[:, 1] == lines[:, 2]) & (lines[:, 0] != 0)
        return jnp.max(jnp.where(line_win, lines[:, 0], jnp.int8(0)))

    def is_terminal(self, state: TicTacToeState) -> jnp.ndarray:
        return (self._winner(state) != 0) | jnp.all(state.board != 0)

    def eval_score(self, state: TicTacToeState) -> jnp.ndarray:
        w = self._winner(state)
        return jnp.where(w == 1, 1.0, jnp.where(w == 2, -1.0, 0.0)).astype(jnp.float32)

    def turn(self, state: TicTacToeState) -> jnp.ndarray:
        return state.turn

    def features(self, state: TicTacToeState) -> jnp.ndarray:
        """4 planes: own stones, opponent stones, P1-turn, P2-turn
        (reference tictactoe.cpp:71-97), NHWC."""
        own = (state.board == state.turn).astype(jnp.float32)
        opp = (state.board == (3 - state.turn)).astype(jnp.float32)
        p1 = jnp.full((9,), (state.turn == 1).astype(jnp.float32))
        p2 = jnp.full((9,), (state.turn == 2).astype(jnp.float32))
        return jnp.stack([own, opp, p1, p2], axis=-1).reshape(3, 3, 4)
