"""Lines of Action rule tests vs a transparent Python oracle
(reference linesofaction.cpp semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minizero_tpu.envs.linesofaction import LinesOfActionEnv, _move_table

_ENV = LinesOfActionEnv()
_STEP = jax.jit(_ENV.step)
_MASK = jax.jit(_ENV.legal_mask)
_TERM = jax.jit(_ENV.is_terminal)
_EVAL = jax.jit(_ENV.eval_score)


class PyLoA:
    N = 8

    def __init__(self):
        n = self.N
        self.board = [0] * (n * n)
        for x in range(1, n - 1):
            self.board[x] = 1
            self.board[(n - 1) * n + x] = 1
        for y in range(1, n - 1):
            self.board[y * n] = 2
            self.board[y * n + n - 1] = 2
        self.turn = 1
        self.history = {(tuple(self.board), self.turn)}
        frm, dst, _, _ = _move_table(n)
        self.table = list(zip(frm.tolist(), dst.tolist()))

    def line_count(self, x, y, dx, dy):
        n = self.N
        cnt = 0
        for s in range(-n, n + 1):
            xx, yy = x + s * dx, y + s * dy
            if 0 <= xx < n and 0 <= yy < n and self.board[xx + n * yy] != 0:
                cnt += 1
        return cnt

    def legal(self, a):
        n = self.N
        f, d = self.table[a]
        if self.board[f] != self.turn:
            return False
        fx, fy = f % n, f // n
        dx_, dy_ = d % n, d // n
        dist = max(abs(dx_ - fx), abs(dy_ - fy))
        sx = (dx_ - fx) // dist
        sy = (dy_ - fy) // dist
        if self.line_count(fx, fy, sx, sy) != dist:
            return False
        for i in range(1, dist):
            if self.board[(fx + i * sx) + n * (fy + i * sy)] == 3 - self.turn:
                return False
        if self.board[d] == self.turn:
            return False
        # cycle rule
        nb = list(self.board)
        nb[f] = 0
        nb[d] = self.turn
        if (tuple(nb), 3 - self.turn) in self.history:
            return False
        return True

    def play(self, a):
        f, d = self.table[a]
        self.board[f] = 0
        self.board[d] = self.turn
        self.turn = 3 - self.turn
        self.history.add((tuple(self.board), self.turn))

    def connected(self, p):
        n = self.N
        cells = [i for i in range(n * n) if self.board[i] == p]
        if not cells:
            return True
        seen = {cells[0]}
        stack = [cells[0]]
        while stack:
            q = stack.pop()
            x, y = q % n, q // n
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    xx, yy = x + dx, y + dy
                    if 0 <= xx < n and 0 <= yy < n:
                        r = xx + n * yy
                        if self.board[r] == p and r not in seen:
                            seen.add(r)
                            stack.append(r)
        return len(seen) == len(cells)

    def terminal(self):
        return self.connected(1) or self.connected(2)

    def score(self):
        c1, c2 = self.connected(1), self.connected(2)
        if c1 and c2:
            return 0.0
        return 1.0 if c1 else (-1.0 if c2 else 0.0)


def test_loa_move_table_and_init():
    frm, dst, dir4, dist = _move_table(8)
    assert len(frm) == _ENV.spec.action_size
    s = _ENV.init()
    b = np.asarray(s.board).reshape(8, 8)
    assert (b[0, 1:7] == 1).all() and (b[7, 1:7] == 1).all()
    assert (b[1:7, 0] == 2).all() and (b[1:7, 7] == 2).all()
    assert b[0, 0] == 0 and b[7, 7] == 0


@pytest.mark.parametrize("seed", [0, 1])
def test_loa_random_playout_matches_oracle(seed):
    env = _ENV
    oracle = PyLoA()
    rng = np.random.RandomState(seed)
    s = env.init()
    for move in range(120):
        mask = np.asarray(_MASK(s))
        oracle_mask = np.array([oracle.legal(a) for a in range(env.spec.action_size)])
        np.testing.assert_array_equal(mask, oracle_mask, err_msg=f"move {move}")
        assert bool(_TERM(s)) == oracle.terminal(), f"move {move}"
        if oracle.terminal():
            break
        legal = np.nonzero(oracle_mask)[0]
        if len(legal) == 0:
            break
        a = int(rng.choice(legal))
        oracle.play(a)
        s = _STEP(s, jnp.int32(a))
        np.testing.assert_array_equal(np.asarray(s.board), np.array(oracle.board, np.int8))
    if oracle.terminal():
        assert float(_EVAL(s)) == oracle.score()


def test_loa_features_shape():
    s = _ENV.init()
    f = np.asarray(_ENV.features(s))
    assert f.shape == (8, 8, 22)
    # line-count planes masked to occupied squares; e.g. square (0,1) holds a
    # piece with 6 pieces on its horizontal line
    assert f[0, 1, 16] == 6 / 8.0
    assert f[0, 0, 16] == 0.0  # empty corner masked out
    assert (f[:, :, 20] == 1).all()
