"""2048 — single-player stochastic sliding puzzle (reference
``minizero/environment/stochastic/puzzle2048/puzzle2048.{h,cpp}``,
``bitboard.h``).

Actions 0..3 = up/right/down/left (``bitboard.h slide``); a slide is legal
iff it changes the board; reward = sum of merged tile values; after each
slide a chance tile spawns at a uniform empty cell — 2 (exp 1) with p=0.9
else 4 (exp 2) (``puzzle2048.cpp actChanceEvent``). Reset spawns two tiles
(``puzzle2048.cpp reset``). Terminal when no slide changes the board; eval =
total reward; discrete 601-bin value/reward with the MuZero transform
(``puzzle2048.h:16``, loader ``getReward``).

Functional chance: the state carries a JAX PRNG key (the reference seeds a
per-env mt19937); ``step`` = slide + spawn, fully jittable. Features = 16
one-hot exponent planes; action features = 4 filled planes.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec

_N = 4


def _slide_row_left(row):
    """(new_row, score) for one row of 4 tile exponents (i32[4])."""
    # compact nonzeros to the left, order-preserving
    order = jnp.argsort(row == 0, stable=True)
    r = row[order]
    e0, e1, e2, e3 = r[0], r[1], r[2], r[3]
    m01 = (e0 > 0) & (e0 == e1)
    m12 = (~m01) & (e1 > 0) & (e1 == e2)
    m23a = m01 & (e2 > 0) & (e2 == e3)  # 0-1 merged, 2-3 also merges
    m23b = (~m01) & (~m12) & (e2 > 0) & (e2 == e3)
    z = jnp.zeros((), row.dtype)
    out = jnp.where(
        m01,
        jnp.where(
            m23a,
            jnp.stack([e0 + 1, e2 + 1, z, z]),
            jnp.stack([e0 + 1, e2, e3, z]),
        ),
        jnp.where(
            m12,
            jnp.stack([e0, e1 + 1, e3, z]),
            jnp.where(
                m23b,
                jnp.stack([e0, e1, e2 + 1, z]),
                r,
            ),
        ),
    )
    score = (
        jnp.where(m01, jnp.left_shift(1, (e0 + 1).astype(jnp.int32)), 0)
        + jnp.where(m23a | m23b, jnp.left_shift(1, (e2 + 1).astype(jnp.int32)), 0)
        + jnp.where(m12, jnp.left_shift(1, (e1 + 1).astype(jnp.int32)), 0)
    )
    return out, score


def _slide(board2d, direction):
    """(new_board [4,4], score, changed) for direction 0=up 1=right 2=down
    3=left."""

    def left(b):
        rows, scores = jax.vmap(_slide_row_left)(b)
        return rows, jnp.sum(scores)

    def apply(b, pre, post):
        nb, s = left(pre(b))
        return post(nb), s

    up = apply(board2d, lambda b: b.T, lambda b: b.T)
    right = apply(board2d, lambda b: b[:, ::-1], lambda b: b[:, ::-1])
    down = apply(board2d, lambda b: b[::-1].T, lambda b: b.T[::-1])
    left_ = apply(board2d, lambda b: b, lambda b: b)
    boards = jnp.stack([up[0], right[0], down[0], left_[0]])
    scores = jnp.stack([up[1], right[1], down[1], left_[1]])
    nb = boards[direction]
    return nb, scores[direction], jnp.any(nb != board2d)


@flax.struct.dataclass
class Puzzle2048State:
    board: jnp.ndarray  # i8[16] tile exponents
    reward: jnp.ndarray  # f32 last slide reward
    total: jnp.ndarray  # f32 total score
    rng: jnp.ndarray  # PRNG key for chance events
    num_moves: jnp.ndarray  # i32


class Puzzle2048Env(Env):
    spec = EnvSpec(
        name="puzzle2048",
        num_players=1,
        board_size=_N,
        action_size=4,
        num_input_channels=16,
        input_height=_N,
        input_width=_N,
        hidden_height=_N,
        hidden_width=_N,
        num_action_feature_channels=4,
        discrete_value_size=601,
        max_game_length=8192,
    )

    def _spawn(self, board: jnp.ndarray, rng: jnp.ndarray) -> jnp.ndarray:
        """Chance tile at a uniform empty cell: exp 1 w.p. 0.9 else 2
        (puzzle2048.cpp:51-62); no-op on a full board."""
        k1, k2 = jax.random.split(rng)
        empty = board == 0
        n_empty = jnp.sum(empty.astype(jnp.int32))
        nth = jax.random.randint(k1, (), 0, jnp.maximum(n_empty, 1))
        cum = jnp.cumsum(empty.astype(jnp.int32)) - 1
        pos = jnp.argmax(empty & (cum == nth))
        tile = jnp.where(jax.random.randint(k2, (), 0, 10) == 0, 2, 1).astype(board.dtype)
        return jnp.where(n_empty > 0, board.at[pos].set(tile), board)

    def init(self) -> Puzzle2048State:
        return self.init_random(jax.random.PRNGKey(0))

    def init_random(self, rng: jnp.ndarray) -> Puzzle2048State:
        k1, k2, k3 = jax.random.split(rng, 3)
        board = jnp.zeros((_N * _N,), jnp.int8)
        board = self._spawn(board, k1)
        board = self._spawn(board, k2)
        return Puzzle2048State(
            board=board,
            reward=jnp.float32(0.0),
            total=jnp.float32(0.0),
            rng=k3,
            num_moves=jnp.int32(0),
        )

    def step(self, state: Puzzle2048State, action: jnp.ndarray) -> Puzzle2048State:
        k_spawn, k_next = jax.random.split(state.rng)
        nb, score, changed = _slide(state.board.reshape(_N, _N), action)
        nb = nb.reshape(-1)
        nb = jnp.where(changed, self._spawn(nb, k_spawn), state.board)
        return Puzzle2048State(
            board=nb,
            reward=jnp.where(changed, score.astype(jnp.float32), 0.0),
            total=state.total + jnp.where(changed, score.astype(jnp.float32), 0.0),
            rng=k_next,
            num_moves=state.num_moves + 1,
        )

    def legal_mask(self, state: Puzzle2048State) -> jnp.ndarray:
        b = state.board.reshape(_N, _N)
        return jnp.stack([_slide(b, jnp.int32(d))[2] for d in range(4)])

    def is_terminal(self, state: Puzzle2048State) -> jnp.ndarray:
        return ~jnp.any(self.legal_mask(state))

    def eval_score(self, state: Puzzle2048State) -> jnp.ndarray:
        return state.total

    def reward(self, state: Puzzle2048State) -> jnp.ndarray:
        return state.reward

    def turn(self, state: Puzzle2048State) -> jnp.ndarray:
        return jnp.int8(1)

    def features(self, state: Puzzle2048State) -> jnp.ndarray:
        """16 one-hot exponent planes NHWC (puzzle2048.cpp getFeatures)."""
        grid = state.board.reshape(_N, _N)
        return (grid[:, :, None] == jnp.arange(16, dtype=grid.dtype)[None, None, :]).astype(
            jnp.float32
        )

    def action_features(self, action: jnp.ndarray) -> jnp.ndarray:
        """4 channels; the chosen action's plane is all ones
        (puzzle2048.cpp getActionFeatures)."""
        planes = (jnp.arange(4) == action).astype(jnp.float32)
        return jnp.broadcast_to(planes[None, None, :], (_N, _N, 4))

    def num_rotations(self) -> int:
        return 1
