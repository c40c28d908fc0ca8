"""Connect6 / Clobber / Breakthrough rule tests vs transparent Python
oracles (the deterministic replacement for the reference's ``env_test``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minizero_tpu.envs.breakthrough import BreakthroughEnv, _move_table
from minizero_tpu.envs.clobber import ClobberEnv
from minizero_tpu.envs.connect6 import Connect6Env

_C6 = Connect6Env(board_size=9)
_CLB = ClobberEnv(board_size=6)
_BT = BreakthroughEnv(board_size=6)


# ----------------------------------------------------------------- connect6
def test_connect6_turn_schedule():
    env = _C6
    s = env.init()
    owners = []
    rng = np.random.RandomState(0)
    for _ in range(9):
        owners.append(int(s.turn))
        legal = np.nonzero(np.asarray(env.legal_mask(s)))[0]
        s = env.step(s, jnp.int32(rng.choice(legal)))
    assert owners == [1, 2, 2, 1, 1, 2, 2, 1, 1]  # B W W B B W W B B


def test_connect6_win_six_and_overline():
    env = _C6
    n = 9
    # Black plays 6 in a row on row 0 (cols 0-5); White plays row 8
    s = env.init()
    b_moves = [0, 1, 2, 3, 4, 5]
    w_moves = [72, 73, 74, 75, 76]
    order = [b_moves[0], w_moves[0], w_moves[1], b_moves[1], b_moves[2],
             w_moves[2], w_moves[3], b_moves[3], b_moves[4],
             w_moves[4], 60]  # white's last turn avoids its own six
    for a in order:
        assert not bool(env.is_terminal(s))
        s = env.step(s, jnp.int32(a))
    # black to play: completing 6-in-row wins
    s = env.step(s, jnp.int32(b_moves[5]))
    assert bool(env.is_terminal(s))
    assert float(env.eval_score(s)) == 1.0


def test_connect6_threat_planes():
    env = _C6
    s = env.init()
    # hand position: black has 4 in a row at row 4 cols 0-3 -> threat-4 plane
    board = np.zeros(81, np.int8)
    board[[36, 37, 38, 39]] = 1
    t4 = np.asarray(env._threat_space(jnp.asarray(board), jnp.int8(1), 4))
    # 6-windows on row 4 containing the 4 stones and no white: empties at
    # cols 4,5 (window 0-5), plus col 4..(window 1-6 lacks col0 stone -> only
    # windows fully containing cols 0-3 qualify: starts at col 0 only... and
    # horizontal windows starting col 0 cover cols 0-5)
    assert t4[40] == 1.0 and t4[41] == 1.0  # cols 4,5 of row 4
    assert t4[36] == 0.0  # occupied cells are not threat space
    t5 = np.asarray(env._threat_space(jnp.asarray(board), jnp.int8(1), 5))
    assert t5.sum() == 0.0  # only 4 stones


def test_connect6_features_shape():
    env = _C6
    s = env.init()
    f = np.asarray(env.features(s))
    assert f.shape == (9, 9, 24)
    # move 0: black's turn, one move left -> turn_idx 1
    assert (f[:, :, 21] == 1).all()
    assert f[:, :, 20].sum() == 0 and f[:, :, 22].sum() == 0 and f[:, :, 23].sum() == 0


# ------------------------------------------------------------------ clobber
class PyClobber:
    def __init__(self, n):
        self.n, self.nn = n, n * n
        self.board = [0] * self.nn
        for p in range(self.nn):
            r, c = divmod(p, n)
            self.board[p] = 1 if (r + c) % 2 == 1 else 2
        self.turn = 1

    def moves(self):
        n = self.n
        out = []
        for d, (dr, dc) in enumerate(((1, 0), (-1, 0), (0, -1), (0, 1))):
            for p in range(self.nn):
                if self.board[p] != self.turn:
                    continue
                r, c = divmod(p, n)
                rr, cc = r + dr, c + dc
                if 0 <= rr < n and 0 <= cc < n and self.board[rr * n + cc] == 3 - self.turn:
                    out.append(d * self.nn + p)
        return out

    def play(self, a):
        d, p = divmod(a, self.nn)
        dr, dc = ((1, 0), (-1, 0), (0, -1), (0, 1))[d]
        r, c = divmod(p, self.n)
        dest = (r + dr) * self.n + (c + dc)
        self.board[p] = 0
        self.board[dest] = self.turn
        self.turn = 3 - self.turn


@pytest.mark.parametrize("seed", [0, 1])
def test_clobber_random_playout_matches_oracle(seed):
    env = _CLB
    oracle = PyClobber(6)
    rng = np.random.RandomState(seed)
    s = env.init()
    step = jax.jit(env.step)
    np.testing.assert_array_equal(np.asarray(s.board), np.array(oracle.board, np.int8))
    for move in range(200):
        legal = np.nonzero(np.asarray(env.legal_mask(s)))[0]
        np.testing.assert_array_equal(legal, np.array(sorted(oracle.moves())), err_msg=f"move {move}")
        assert bool(env.is_terminal(s)) == (len(oracle.moves()) == 0)
        if len(oracle.moves()) == 0:
            break
        a = int(rng.choice(legal))
        oracle.play(a)
        s = step(s, jnp.int32(a))
        np.testing.assert_array_equal(np.asarray(s.board), np.array(oracle.board, np.int8))
    # stuck player loses
    expect = -1.0 if oracle.turn == 1 else 1.0
    assert float(env.eval_score(s)) == expect


def test_clobber_features():
    env = _CLB
    s = env.init()
    f = np.asarray(env.features(s))
    assert f.shape == (6, 6, 18)
    # plane 0 = own (P1) stones now; plane 2.. = history (init position)
    assert f[0, 1, 0] == 1.0 and f[0, 0, 1] == 1.0  # (r0,c1)=P1 own, (r0,c0)=P2 opp
    assert f[:, :, 2].sum() == 0  # only one history entry at start
    assert (f[:, :, 16] == 1).all()


# -------------------------------------------------------------- breakthrough
def test_breakthrough_move_table_sizes():
    # reference: 104/160/228/308 moves for n=5..8
    for n, expect in ((5, 104), (6, 160), (7, 228), (8, 308)):
        fx, fy, dx, dy = _move_table(n)
        assert len(fx) == expect, (n, len(fx))


class PyBreakthrough:
    def __init__(self, n):
        self.n, self.nn = n, n * n
        self.board = [0] * self.nn
        for p in range(self.nn):
            r = p // n
            if r <= 1:
                self.board[p] = 1
            elif r >= n - 2:
                self.board[p] = 2
        self.turn = 1
        fx, fy, dx, dy = _move_table(n)
        self.table = list(zip(fx + n * fy, dx + n * dy))

    def legal(self, a):
        f, d = self.table[a]
        if self.board[f] != self.turn:
            return False
        fr, fc = divmod(f, self.n)
        dr, dc = divmod(d, self.n)
        if dr - fr != (1 if self.turn == 1 else -1):
            return False
        if self.board[d] == self.turn:
            return False
        if self.board[d] != 0 and dc == fc:
            return False
        return True

    def play(self, a):
        f, d = self.table[a]
        self.board[f] = 0
        self.board[d] = self.turn
        self.turn = 3 - self.turn

    def winner(self):
        if not any(v == 1 for v in self.board):
            w = 2
        elif not any(v == 2 for v in self.board):
            w = 1
        else:
            w = 0
        if any(self.board[p] == 1 for p in range(self.nn - self.n, self.nn)):
            w = 1
        elif any(self.board[p] == 2 for p in range(self.n)):
            w = 2
        return w


@pytest.mark.parametrize("seed", [0, 1])
def test_breakthrough_random_playout_matches_oracle(seed):
    env = _BT
    oracle = PyBreakthrough(6)
    rng = np.random.RandomState(seed)
    s = env.init()
    step = jax.jit(env.step)
    for move in range(300):
        mask = np.asarray(env.legal_mask(s))
        oracle_mask = np.array([oracle.legal(a) for a in range(env.spec.action_size)])
        np.testing.assert_array_equal(mask, oracle_mask, err_msg=f"move {move}")
        assert bool(env.is_terminal(s)) == (oracle.winner() != 0)
        if oracle.winner() != 0:
            break
        a = int(rng.choice(np.nonzero(oracle_mask)[0]))
        oracle.play(a)
        s = step(s, jnp.int32(a))
        np.testing.assert_array_equal(np.asarray(s.board), np.array(oracle.board, np.int8))
    w = oracle.winner()
    assert w != 0, "game should finish within 300 moves"
    assert float(env.eval_score(s)) == (1.0 if w == 1 else -1.0)


def test_breakthrough_features():
    env = _BT
    s = env.init()
    f = np.asarray(env.features(s))
    assert f.shape == (6, 6, 20)
    assert f[:, :, 16].sum() == 0  # no threats at start
    assert (f[:, :, 18] == 1).all()
