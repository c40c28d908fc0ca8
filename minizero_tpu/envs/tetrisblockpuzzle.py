"""Tetris Block Puzzle — place held tetromino-like blocks on an 8x8 board;
full rows/columns clear for reward (reference
``minizero/environment/stochastic/tetrisblockpuzzle/*``).

Action space: 801 placement masks — every anchor position where one of the 19
block shapes fits inside the board, enumerated in (block, row, col) order
(``tetrisblockpuzzle.cpp initialize``). A move is legal iff the block is in
the (sorted) holding hand and its mask does not overlap the board
(``isLegalAction``). After a placement, full rows and columns clear
simultaneously; reward = number cleared (``bitboard.h crash``). The used
hand slot refills from the preview queue or a fresh uniform chance block of
19 (``actChanceEvent``); the hand is kept sorted. Terminal: no legal action
or 13500 steps; eval = total reward; 601-bin discrete value.

Features: 2 board planes + 19 one-hot planes per holding slot + 19 per
preview slot (``getFeatures``).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec

_N = 8
_NN = 64
_NUM_BLOCKS = 19
_MAX_STEPS = 13500

# kBlocksPos (tetrisblockpuzzle.cpp:22-47)
_BLOCKS = (
    ((0, 0), (0, 1), (1, 0), (1, 1)),
    ((0, 0), (0, 1), (1, 1), (1, 2)),
    ((0, 1), (1, 0), (1, 1), (2, 0)),
    ((0, 1), (0, 2), (1, 0), (1, 1)),
    ((0, 0), (1, 0), (1, 1), (2, 1)),
    ((0, 0), (0, 1), (0, 2), (0, 3)),
    ((0, 0), (1, 0), (2, 0), (3, 0)),
    ((0, 0), (1, 0), (1, 1), (1, 2)),
    ((0, 0), (0, 1), (1, 0), (2, 0)),
    ((0, 0), (0, 1), (0, 2), (1, 2)),
    ((0, 1), (1, 1), (2, 0), (2, 1)),
    ((0, 2), (1, 0), (1, 1), (1, 2)),
    ((0, 0), (1, 0), (2, 0), (2, 1)),
    ((0, 0), (0, 1), (0, 2), (1, 0)),
    ((0, 0), (0, 1), (1, 1), (2, 1)),
    ((0, 0), (0, 1), (0, 2), (1, 1)),
    ((0, 1), (1, 0), (1, 1), (2, 1)),
    ((0, 1), (1, 0), (1, 1), (1, 2)),
    ((0, 0), (1, 0), (1, 1), (2, 0)),
)


def _action_tables():
    masks, block_ids = [], []
    for b, cells in enumerate(_BLOCKS):
        for i in range(_N):
            for j in range(_N):
                if all(0 <= i + r < _N and 0 <= j + c < _N for r, c in cells):
                    m = np.zeros(_NN, bool)
                    for r, c in cells:
                        m[(i + r) * _N + (j + c)] = True
                    masks.append(m)
                    block_ids.append(b)
    return np.stack(masks), np.asarray(block_ids, np.int32)


@flax.struct.dataclass
class TetrisState:
    board: jnp.ndarray  # bool[64]
    holding: jnp.ndarray  # i8[nh] sorted block ids
    preview: jnp.ndarray  # i8[np] FIFO preview queue (may be size 0)
    reward: jnp.ndarray  # f32 last clear count
    total: jnp.ndarray  # f32
    rng: jnp.ndarray
    num_moves: jnp.ndarray  # i32


class TetrisBlockPuzzleEnv(Env):
    def __init__(self, num_holding_block: int = 3, num_preview: int = 0):
        masks, block_ids = _action_tables()
        assert len(masks) == 801  # kTetrisBlockPuzzleActionSize
        self._masks = jnp.asarray(masks)
        self._masks_f = jnp.asarray(masks.astype(np.float32))
        self._block_ids = jnp.asarray(block_ids)
        self.nh = int(num_holding_block)
        self.np_ = int(num_preview)
        self.spec = EnvSpec(
            name="tetrisblockpuzzle",
            num_players=1,
            board_size=_N,
            action_size=len(masks),
            num_input_channels=2 + _NUM_BLOCKS * (self.nh + self.np_),
            input_height=_N,
            input_width=_N,
            hidden_height=_N,
            hidden_width=_N,
            num_action_feature_channels=_NUM_BLOCKS,
            discrete_value_size=601,
            max_game_length=_MAX_STEPS,
        )

    # --------------------------------------------------------------- protocol
    def init(self) -> TetrisState:
        return self.init_random(jax.random.PRNGKey(0))

    def init_random(self, rng: jnp.ndarray) -> TetrisState:
        k_hold, k_prev, k_next = jax.random.split(rng, 3)
        holding = jnp.sort(
            jax.random.randint(k_hold, (self.nh,), 0, _NUM_BLOCKS).astype(jnp.int8)
        )
        preview = jax.random.randint(k_prev, (max(self.np_, 1),), 0, _NUM_BLOCKS).astype(jnp.int8)[
            : self.np_
        ]
        return TetrisState(
            board=jnp.zeros((_NN,), bool),
            holding=holding,
            preview=preview,
            reward=jnp.float32(0.0),
            total=jnp.float32(0.0),
            rng=k_next,
            num_moves=jnp.int32(0),
        )

    def _crash(self, board: jnp.ndarray):
        """Clear full rows/columns; returns (board, count)
        (bitboard.h crash)."""
        b = board.reshape(_N, _N)
        full_rows = jnp.all(b, axis=1)
        full_cols = jnp.all(b, axis=0)
        count = jnp.sum(full_rows.astype(jnp.int32)) + jnp.sum(full_cols.astype(jnp.int32))
        cleared = b & ~full_rows[:, None] & ~full_cols[None, :]
        return cleared.reshape(-1), count

    def step(self, state: TetrisState, action: jnp.ndarray) -> TetrisState:
        k_gen, k_next = jax.random.split(state.rng)
        mask = self._masks[action]
        fits = ~jnp.any(state.board & mask)
        placed = state.board | mask
        cleared, count = self._crash(placed)
        board = jnp.where(fits, cleared, state.board)
        reward = jnp.where(fits, count.astype(jnp.float32), 0.0)
        # remove the used block from hand, refill, re-sort
        block = self._block_ids[action].astype(jnp.int8)
        slot = jnp.argmax(state.holding == block)
        new_block = jax.random.randint(k_gen, (), 0, _NUM_BLOCKS).astype(jnp.int8)
        if self.np_ > 0:
            refill = state.preview[0]
            preview = jnp.concatenate([state.preview[1:], new_block[None]])
        else:
            refill = new_block
            preview = state.preview
        holding = jnp.sort(state.holding.at[slot].set(refill))
        return TetrisState(
            board=board,
            holding=jnp.where(fits, holding, state.holding),
            preview=jnp.where(fits, preview, state.preview) if self.np_ > 0 else state.preview,
            reward=reward,
            total=state.total + reward,
            rng=k_next,
            num_moves=state.num_moves + 1,
        )

    def legal_mask(self, state: TetrisState) -> jnp.ndarray:
        overlap = jnp.dot(self._masks_f, state.board.astype(jnp.float32)) > 0
        in_hand = jnp.any(
            self._block_ids[:, None] == state.holding[None, :].astype(jnp.int32), axis=1
        )
        return ~overlap & in_hand

    def is_terminal(self, state: TetrisState) -> jnp.ndarray:
        return (~jnp.any(self.legal_mask(state))) | (state.num_moves >= _MAX_STEPS)

    def eval_score(self, state: TetrisState) -> jnp.ndarray:
        return state.total

    def reward(self, state: TetrisState) -> jnp.ndarray:
        return state.reward

    def turn(self, state: TetrisState) -> jnp.ndarray:
        return jnp.int8(1)

    def features(self, state: TetrisState) -> jnp.ndarray:
        """[8, 8, 2 + 19*(nh+np)] (tetrisblockpuzzle.cpp getFeatures)."""
        empty = (~state.board).astype(jnp.float32)
        occ = state.board.astype(jnp.float32)
        planes = [empty, occ]
        for i in range(self.nh):
            onehot = (jnp.arange(_NUM_BLOCKS) == state.holding[i].astype(jnp.int32)).astype(
                jnp.float32
            )
            planes.append(jnp.broadcast_to(onehot[:, None], (_NUM_BLOCKS, _NN)).reshape(-1))
        for i in range(self.np_):
            onehot = (jnp.arange(_NUM_BLOCKS) == state.preview[i].astype(jnp.int32)).astype(
                jnp.float32
            )
            planes.append(jnp.broadcast_to(onehot[:, None], (_NUM_BLOCKS, _NN)).reshape(-1))
        feats = jnp.concatenate([p.reshape(-1) for p in planes])
        c = 2 + _NUM_BLOCKS * (self.nh + self.np_)
        return jnp.transpose(feats.reshape(c, _N, _N), (1, 2, 0))

    def action_features(self, action: jnp.ndarray) -> jnp.ndarray:
        """19 channels: the placed mask drawn on its block's channel."""
        mask = self._masks[action].astype(jnp.float32).reshape(_N, _N)
        block = self._block_ids[action]
        onehot = (jnp.arange(_NUM_BLOCKS) == block).astype(jnp.float32)
        return mask[:, :, None] * onehot[None, None, :]

    def num_rotations(self) -> int:
        return 1
