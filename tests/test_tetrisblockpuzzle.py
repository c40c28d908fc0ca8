"""Tetris Block Puzzle tests (reference tetrisblockpuzzle.cpp semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.tetrisblockpuzzle import _BLOCKS, TetrisBlockPuzzleEnv

_ENV = TetrisBlockPuzzleEnv(num_holding_block=3, num_preview=0)


def test_action_table_size_and_blocks():
    assert _ENV.spec.action_size == 801
    assert len(_BLOCKS) == 19
    # every mask has exactly 4 cells
    assert (np.asarray(_ENV._masks).sum(axis=1) == 4).all()


def test_legal_requires_block_in_hand_and_fit():
    env = _ENV
    s = env.init_random(jax.random.PRNGKey(0))
    mask = np.asarray(env.legal_mask(s))
    block_ids = np.asarray(env._block_ids)
    holding = set(np.asarray(s.holding).tolist())
    legal_blocks = set(block_ids[np.nonzero(mask)[0]].tolist())
    assert legal_blocks <= holding
    assert mask.any()


def test_place_clears_full_row():
    env = _ENV
    s = env.init_random(jax.random.PRNGKey(1))
    # fill row 0 except cols 0-1; hand gets block 0 (the 2x2 O block)
    board = np.zeros(64, bool)
    board[2:8] = True  # row 0, cols 2..7
    s = s.replace(
        board=jnp.asarray(board),
        holding=jnp.asarray(np.array([0, 5, 6], np.int8)),
    )
    # O block anchored at (0, 0) is action id 0 (block 0, i=0, j=0)
    assert bool(env.legal_mask(s)[0])
    s2 = env.step(s, jnp.int32(0))
    b = np.asarray(s2.board).reshape(8, 8)
    assert float(s2.reward) == 1.0  # row 0 cleared
    assert not b[0].any()  # cleared row
    assert b[1, 0] and b[1, 1]  # bottom half of the O remains
    # used block replaced in hand, hand stays sorted and sized 3
    h = np.asarray(s2.holding)
    assert len(h) == 3 and (np.sort(h) == h).all()


def test_simultaneous_row_and_col_clear():
    env = _ENV
    s = env.init_random(jax.random.PRNGKey(2))
    board = np.zeros((8, 8), bool)
    board[0, 2:] = True  # row 0 needs cols 0,1
    board[2:, 0] = True  # col 0 needs rows 0,1
    board[2:, 1] = True  # col 1 needs rows 0,1
    s = s.replace(board=jnp.asarray(board.reshape(-1)), holding=jnp.asarray(np.array([0, 0, 0], np.int8)))
    s2 = env.step(s, jnp.int32(0))  # O at (0,0) completes row 0 + cols 0,1... and rows 1
    # rows 0,1? row 1: cols 0,1 filled by block, 2.. empty -> not full.
    assert float(s2.reward) == 3.0  # row 0, col 0, col 1
    b = np.asarray(s2.board).reshape(8, 8)
    assert not b[0].any() and not b[:, 0].any() and not b[:, 1].any()


def test_preview_queue_fifo():
    env = TetrisBlockPuzzleEnv(num_holding_block=2, num_preview=2)
    s = env.init_random(jax.random.PRNGKey(3))
    first_preview = int(np.asarray(s.preview)[0])
    legal = np.nonzero(np.asarray(env.legal_mask(s)))[0]
    a = int(legal[0])
    s2 = env.step(s, jnp.int32(a))
    assert first_preview in np.asarray(s2.holding).tolist()
    assert len(np.asarray(s2.preview)) == 2


def test_playout_accumulates_reward():
    env = _ENV
    s = env.init_random(jax.random.PRNGKey(4))
    rng = np.random.RandomState(0)
    step = jax.jit(env.step)
    total = 0.0
    for _ in range(200):
        mask = np.asarray(env.legal_mask(s))
        if not mask.any():
            break
        a = int(rng.choice(np.nonzero(mask)[0]))
        s = step(s, jnp.int32(a))
        total += float(s.reward)
    assert float(s.total) == total
    f = np.asarray(env.features(s))
    assert f.shape == (8, 8, 2 + 19 * 3)
