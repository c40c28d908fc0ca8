"""NoGo — Go variant where captures and suicide are illegal and passing is
forbidden; the player left without a legal move loses.

TPU-native counterpart of the reference's NoGo env
(``minizero/environment/nogo/nogo.h:25-85``), built as a thin override of the
vectorised Go env: since no capture can ever occur, the board only gains
stones, so no superko bookkeeping is needed and the whole legality mask is a
couple of vectorised neighbour reductions.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from minizero_tpu.envs.go import GoEnv, GoState


class NoGoEnv(GoEnv):
    def __init__(self, board_size: int = 9):
        super().__init__(board_size=board_size, komi=0.0)
        nn = board_size * board_size
        self.spec = dataclasses.replace(
            self.spec, name=f"nogo_{board_size}x{board_size}", max_game_length=nn
        )

    def _legal_mask_for(self, board, labels, lib_at, onehot, block_chunks, turn,
                        hash_a, hash_b, history_a, history_b, num_moves):
        """Legal iff: empty point, does NOT capture (no adjacent 1-liberty
        opponent block) and is not suicide (an empty neighbour or a >1-liberty
        own neighbour block exists); pass is never legal
        (reference nogo.h:25-57)."""
        empty = board == 0
        opp = (3 - turn).astype(board.dtype)
        nbr_board = board[self._nbr]  # [NN, 4]
        nbr_lib = lib_at[self._nbr]
        v = self._nbr_valid
        nbr_empty = jnp.any(v & (nbr_board == 0), axis=1)
        own_safe = jnp.any(v & (nbr_board == turn) & (nbr_lib > 1), axis=1)
        captures = jnp.any(v & (nbr_board == opp) & (nbr_lib == 1), axis=1)
        board_legal = empty & ~captures & (nbr_empty | own_safe)
        return jnp.concatenate([board_legal, jnp.zeros((1,), bool)])

    def init(self) -> GoState:
        state = super().init()
        # pass (last slot) is never legal in NoGo
        return state.replace(legal=state.legal.at[self.nn].set(False))

    def is_terminal(self, state: GoState) -> jnp.ndarray:
        """Terminal when the player to move has no legal action
        (reference nogo.h:59-66)."""
        return ~jnp.any(state.legal)

    def eval_score(self, state: GoState) -> jnp.ndarray:
        """The player to move (who is stuck) loses (reference nogo.h:68-76)."""
        return jnp.where(state.turn == 1, -1.0, 1.0).astype(jnp.float32)

    def terminal_score_inputs(self, state: GoState) -> jnp.ndarray:
        # NoGo's score reads only the turn (NOT GoEnv's board/Tromp-Taylor)
        return state.turn

    def eval_score_from(self, turn: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(turn == 1, -1.0, 1.0).astype(jnp.float32)
