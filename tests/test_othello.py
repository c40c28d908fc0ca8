"""Othello golden tests vs a transparent Python oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minizero_tpu.envs.othello import OthelloEnv


class PyOthello:
    def __init__(self, n=8):
        self.n, self.nn = n, n * n
        self.board = [0] * self.nn
        h = n // 2
        self.board[(h - 1) * n + (h - 1)] = 2
        self.board[h * n + h] = 2
        self.board[(h - 1) * n + h] = 1
        self.board[h * n + (h - 1)] = 1
        self.turn = 1
        self.passes = 0

    def _ray_flips(self, p, player):
        n = self.n
        flips = []
        r0, c0 = divmod(p, n)
        for dr, dc in ((0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (1, -1), (-1, 1), (-1, -1)):
            line = []
            r, c = r0 + dr, c0 + dc
            while 0 <= r < n and 0 <= c < n:
                q = r * n + c
                if self.board[q] == 3 - player:
                    line.append(q)
                elif self.board[q] == player:
                    flips.extend(line)
                    break
                else:
                    break
                r, c = r + dr, c + dc
        return flips

    def board_moves(self, player):
        return [p for p in range(self.nn) if self.board[p] == 0 and self._ray_flips(p, player)]

    def legal(self, a):
        if a == self.nn:
            return not self.board_moves(self.turn)
        return self.board[a] == 0 and bool(self._ray_flips(a, self.turn))

    def play(self, a):
        assert self.legal(a)
        if a == self.nn:
            self.passes += 1
        else:
            flips = self._ray_flips(a, self.turn)
            self.board[a] = self.turn
            for q in flips:
                self.board[q] = self.turn
            self.passes = 0
        self.turn = 3 - self.turn

    def terminal(self):
        return self.passes >= 2

    def score(self):
        b = sum(1 for v in self.board if v == 1)
        w = sum(1 for v in self.board if v == 2)
        if self.board_moves(1) or self.board_moves(2):
            return 0.0
        return 1.0 if b > w else (-1.0 if b < w else 0.0)


@pytest.mark.parametrize("seed", [0, 1])
def test_othello_random_playout_matches_oracle(seed):
    n = 6
    env = OthelloEnv(board_size=n)
    oracle = PyOthello(n=n)
    rng = np.random.RandomState(seed)
    state = env.init()
    step = jax.jit(env.step)
    for move in range(2 * n * n + 4):
        jm = np.asarray(env.legal_mask(state))
        om = np.array([oracle.legal(a) for a in range(n * n + 1)])
        np.testing.assert_array_equal(jm, om, err_msg=f"move {move} legality mismatch")
        assert bool(env.is_terminal(state)) == oracle.terminal(), f"move {move}"
        if oracle.terminal():
            break
        action = int(rng.choice(np.nonzero(om)[0]))
        oracle.play(action)
        state = step(state, jnp.int32(action))
        np.testing.assert_array_equal(
            np.asarray(state.board), np.array(oracle.board, np.int8), err_msg=f"move {move} board"
        )
    assert float(env.eval_score(state)) == oracle.score()


def test_othello_initial_moves():
    env = OthelloEnv(board_size=8)
    s = env.init()
    mask = np.asarray(env.legal_mask(s))
    # black's four classic opening moves: d3, c4, f5, e6 = 19, 26, 37, 44
    assert set(np.nonzero(mask)[0]) == {19, 26, 37, 44}


def test_othello_flip():
    env = OthelloEnv(board_size=8)
    s = env.init()
    s = env.step(s, jnp.int32(19))  # black d3 flips d4 (27)
    board = np.asarray(s.board)
    assert board[19] == 1 and board[27] == 1
    assert (board == 1).sum() == 4 and (board == 2).sum() == 1
