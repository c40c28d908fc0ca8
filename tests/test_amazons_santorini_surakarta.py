"""Amazons / Santorini / Surakarta rule tests vs transparent Python oracles
(direct ports of the reference C++ semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minizero_tpu.envs.amazons import AmazonsEnv
from minizero_tpu.envs.santorini import SantoriniEnv
from minizero_tpu.envs.surakarta import SurakartaEnv

_AMZ = AmazonsEnv(board_size=6)
_SAN = SantoriniEnv()
_SUR = SurakartaEnv(board_size=6, no_capture_plies=50)


# ------------------------------------------------------------------- amazons
class PyAmazons:
    DIRS = [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]

    def __init__(self, n):
        self.n = n
        self.board = [0] * (n * n)
        interval = n // 3 - (1 if n % 3 == 0 else 0)
        for x, y in ((0, interval), (interval, 0), (n - 1 - interval, 0), (n - 1, interval)):
            self.board[x + n * y] = 1
        for x, y in ((0, n - 1 - interval), (interval, n - 1),
                     (n - 1 - interval, n - 1), (n - 1, n - 1 - interval)):
            self.board[x + n * y] = 2
        self.num_actions = 0
        self.last_dest = -1
        # rebuild the same move-id table
        self.moves = []
        for y in range(n):
            for x in range(n):
                for dx, dy in [(-1, -1), (0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]:
                    if dx == dy == 0:
                        continue
                    xx, yy = x + dx, y + dy
                    while 0 <= xx < n and 0 <= yy < n:
                        self.moves.append((x + n * y, xx + n * yy))
                        xx += dx
                        yy += dy
        self.base = len(self.moves)

    def turn(self):
        return 1 if self.num_actions % 4 < 2 else 2

    def _ray_clear(self, f, d):
        n = self.n
        fx, fy = f % n, f // n
        dx, dy = d % n, d // n
        steps = max(abs(dx - fx), abs(dy - fy))
        sx = (dx - fx) // steps
        sy = (dy - fy) // steps
        if abs(dx - fx) not in (0, steps) or abs(dy - fy) not in (0, steps):
            return False
        for i in range(1, steps + 1):
            if self.board[(fx + i * sx) + n * (fy + i * sy)] != 0:
                return False
        return True

    def legal(self):
        t = self.turn()
        out = set()
        if self.num_actions % 2 == 0:
            for a, (f, d) in enumerate(self.moves):
                if self.board[f] == t and self._ray_clear(f, d):
                    out.add(a)
        else:
            for a, (f, d) in enumerate(self.moves):
                if f == self.last_dest and self._ray_clear(f, d):
                    out.add(self.base + d)
        return out

    def play(self, a):
        t = self.turn()
        if a < self.base:
            f, d = self.moves[a]
            self.board[f] = 0
            self.board[d] = t
            self.last_dest = d
        else:
            self.board[a - self.base] = 3
        self.num_actions += 1


@pytest.mark.parametrize("seed", [0, 1])
def test_amazons_random_playout_matches_oracle(seed):
    env = _AMZ
    oracle = PyAmazons(6)
    rng = np.random.RandomState(seed)
    s = env.init()
    step = jax.jit(env.step)
    mask_fn = jax.jit(env.legal_mask)
    np.testing.assert_array_equal(np.asarray(s.board), np.array(oracle.board, np.int8))
    for move in range(80):
        mask = np.asarray(mask_fn(s))
        oracle_legal = oracle.legal()
        np.testing.assert_array_equal(
            np.nonzero(mask)[0], np.array(sorted(oracle_legal)), err_msg=f"move {move}"
        )
        assert bool(jax.jit(env.is_terminal)(s)) == (len(oracle_legal) == 0)
        if not oracle_legal:
            break
        a = int(rng.choice(sorted(oracle_legal)))
        oracle.play(a)
        s = step(s, jnp.int32(a))
        np.testing.assert_array_equal(np.asarray(s.board), np.array(oracle.board, np.int8))
    if not oracle.legal():
        expect = -1.0 if oracle.turn() == 1 else 1.0
        assert float(jax.jit(env.eval_score)(s)) == expect


def test_amazons_features_phase_planes():
    env = _AMZ
    s = env.init()
    f = np.asarray(env.features(s))
    assert f.shape == (6, 6, 28)
    assert (f[:, :, 24] == 1).all()  # phase 0: black moves amazon
    # amazons of both players visible in the first history pair
    assert f[:, :, 0].sum() == 4 and f[:, :, 1].sum() == 4


# ----------------------------------------------------------------- santorini
class PySantorini:
    N = 5
    DIRS = [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]

    def __init__(self):
        self.levels = [0] * 25
        self.pieces = [[-1, -1], [-1, -1]]
        self.turn = 1

    def occ(self):
        out = [0] * 25
        for p in range(2):
            for pos in self.pieces[p]:
                if pos >= 0:
                    out[pos] = p + 1
        return out

    def legal(self):
        t = self.turn
        p = t - 1
        occ = self.occ()
        out = set()
        if self.pieces[p][0] < 0:
            # placement: 300 combos (x < y), avoid opponent workers
            z = 0
            for x in range(25):
                for y in range(x + 1, 25):
                    z += 1
                    if occ[x] == 0 and occ[y] == 0:
                        out.add(1600 + z - 1)
            return out
        for a in range(1600):
            f = a // 64
            mdir = (a % 64) // 8
            bdir = a % 8
            fx, fy = f % 5, f // 5
            tx, ty = fx + self.DIRS[mdir][0], fy + self.DIRS[mdir][1]
            if not (0 <= tx < 5 and 0 <= ty < 5):
                continue
            to = tx + 5 * ty
            bx, by = tx + self.DIRS[bdir][0], ty + self.DIRS[bdir][1]
            if not (0 <= bx < 5 and 0 <= by < 5):
                continue
            b = bx + 5 * by
            if occ[f] != t:
                continue
            if self.levels[to] > self.levels[f] + 1:
                continue
            if occ[to] != 0:
                continue
            if self.levels[b] > 3:
                continue
            occ_after = list(occ)
            occ_after[f] = 0
            occ_after[to] = t
            if occ_after[b] != 0:
                continue
            out.add(a)
        return out

    def play(self, a):
        p = self.turn - 1
        if a >= 1600:
            z = a - 1600 + 1
            x = int(np.ceil((47.0 - np.sqrt(2401 - 8 * z)) / 2))
            y = z - ((47 - x) * x // 2 + x) + x
            self.pieces[p] = [x, y]
        else:
            f = a // 64
            mdir = (a % 64) // 8
            bdir = a % 8
            fx, fy = f % 5, f // 5
            tx, ty = fx + self.DIRS[mdir][0], fy + self.DIRS[mdir][1]
            to = tx + 5 * ty
            bx, by = tx + self.DIRS[bdir][0], ty + self.DIRS[bdir][1]
            b = bx + 5 * by
            which = 0 if self.pieces[p][0] == f else 1
            self.pieces[p][which] = to
            self.levels[b] += 1
        self.turn = 3 - self.turn

    def win(self, p):
        return any(pos >= 0 and self.levels[pos] == 3 for pos in self.pieces[p])

    def terminal(self):
        if any(pos < 0 for pr in self.pieces for pos in pr):
            return False
        return self.win(0) or self.win(1) or not self.legal()

    def score(self):
        if self.win(0):
            return 1.0
        if self.win(1):
            return -1.0
        return -1.0 if self.turn == 1 else 1.0


@pytest.mark.parametrize("seed", [0, 1])
def test_santorini_random_playout_matches_oracle(seed):
    env = _SAN
    oracle = PySantorini()
    rng = np.random.RandomState(seed)
    s = env.init()
    step = jax.jit(env.step)
    mask_fn = jax.jit(env.legal_mask)
    term_fn = jax.jit(env.is_terminal)
    for move in range(130):
        mask = np.asarray(mask_fn(s))
        oracle_legal = oracle.legal()
        np.testing.assert_array_equal(
            np.nonzero(mask)[0], np.array(sorted(oracle_legal)), err_msg=f"move {move}"
        )
        assert bool(term_fn(s)) == oracle.terminal(), f"move {move}"
        if oracle.terminal():
            break
        a = int(rng.choice(sorted(oracle_legal)))
        oracle.play(a)
        s = step(s, jnp.int32(a))
        np.testing.assert_array_equal(np.asarray(s.levels), np.array(oracle.levels, np.int8))
    if oracle.terminal():
        assert float(jax.jit(env.eval_score)(s)) == oracle.score()


def test_santorini_features_shape():
    s = _SAN.init()
    f = np.asarray(_SAN.features(s))
    assert f.shape == (5, 5, 50)
    assert (f[:, :, 48] == 1).all()


# ----------------------------------------------------------------- surakarta
class PySurakarta:
    """Direct port of the reference trajectory walker
    (surakarta.cpp createSingleTrajectory / findNeighbors / runCircuit)."""

    N = 6

    def __init__(self):
        n = self.N
        self.board = [0] * 36
        for i in range(2 * n):
            self.board[i] = 1
        for i in range((n - 2) * n, n * n):
            self.board[i] = 2
        self.turn = 1
        self.no_capture = 0
        self.history = {(tuple(self.board), self.turn)}
        self.red = (2, 3)
        self.green = (1, 4)
        self.red_traj = self._traj(self.red)
        self.green_traj = self._traj(self.green)

    def _traj(self, line):
        n = self.N
        lo, hi = line
        t = []
        t += [(i, lo, "h") for i in range(n)]
        t.append((-1, -1, None))
        t += [(hi, i, "v") for i in range(n)]
        t.append((-1, -1, None))
        t += [(i, hi, "h") for i in range(n - 1, -1, -1)]
        t.append((-1, -1, None))
        t += [(lo, i, "v") for i in range(n - 1, -1, -1)]
        t.append((-1, -1, None))
        return t

    def _find(self, traj, x, y, d, same):
        for i, p in enumerate(traj):
            if (p[0], p[1]) != (x, y):
                continue
            if same and p[2] != d:
                continue
            return i
        return -1

    def _run_circuit(self, pos, dest, traj, line):
        if pos == dest:
            return False
        n = self.N
        lo, hi = line
        x, y = pos % n, pos // n
        cross = {(lo, lo), (lo, hi), (hi, lo), (hi, hi)}
        if (x, y) in cross:
            starts = [
                self._find(traj, x, y + 1, "v", True),
                self._find(traj, x, y - 1, "v", True),
                self._find(traj, x + 1, y, "h", True),
                self._find(traj, x - 1, y, "h", True),
            ]
        else:
            pt = self._find(traj, x, y, None, False)
            starts = [-1, -1, -1, -1]
            if x in line:
                starts[0] = starts[1] = pt
            if y in line:
                starts[2] = starts[3] = pt
        opp = 3 - self.turn
        for i, si in enumerate(starts):
            if si == -1:
                continue
            stride = 1
            cx, cy = traj[si][0], traj[si][1]
            if (cx == lo and i == 0) or (cx == hi and i == 1):
                stride = -1
            if (cy == lo and i == 3) or (cy == hi and i == 2):
                stride = -1
            idx = si
            if (cx, cy) == (x, y):
                idx += stride
            in_cycle = False
            for _ in range(len(traj) - 1):
                idx %= len(traj)
                p = traj[idx]
                if (p[0], p[1]) == (-1, -1):
                    in_cycle = True
                else:
                    tp = p[1] * n + p[0]
                    if tp == dest and self.board[tp] == opp and in_cycle:
                        return True
                    elif self.board[tp] != 0 and (p[0], p[1]) != (x, y):
                        break
                idx += stride
        return False

    def legal(self, a):
        n = self.N
        f, d = a // 36, a % 36
        if self.board[f] != self.turn:
            return False
        fx, fy = f % n, f // n
        dx, dy = d % n, d // n
        ok = False
        if max(abs(fx - dx), abs(fy - dy)) == 1 and self.board[d] == 0:
            ok = True
        if not ok:
            for traj, line in ((self.red_traj, self.red), (self.green_traj, self.green)):
                p_in = fy in line or fx in line
                d_in = dy in line or dx in line
                if p_in and d_in and self._run_circuit(f, d, traj, line):
                    ok = True
                    break
        if not ok:
            return False
        nb = list(self.board)
        nb[f] = 0
        nb[d] = self.turn
        return (tuple(nb), 3 - self.turn) not in self.history

    def play(self, a):
        f, d = a // 36, a % 36
        if self.board[d] == 3 - self.turn:
            self.no_capture = 0
        else:
            self.no_capture += 1
        self.board[f] = 0
        self.board[d] = self.turn
        self.turn = 3 - self.turn
        self.history.add((tuple(self.board), self.turn))

    def terminal(self):
        if self.no_capture >= 50:
            return True
        c1 = self.board.count(1)
        c2 = self.board.count(2)
        if c1 == 0 or c2 == 0:
            return True
        return not any(self.legal(a) for a in range(36 * 36))

    def score(self):
        c1 = self.board.count(1)
        c2 = self.board.count(2)
        return 1.0 if c1 > c2 else (-1.0 if c2 > c1 else 0.0)


@pytest.mark.parametrize("seed", [0, 1])
def test_surakarta_random_playout_matches_oracle(seed):
    env = _SUR
    oracle = PySurakarta()
    rng = np.random.RandomState(seed)
    s = env.init()
    step = jax.jit(env.step)
    mask_fn = jax.jit(env.legal_mask)
    term_fn = jax.jit(env.is_terminal)
    for move in range(90):
        mask = np.asarray(mask_fn(s))
        oracle_mask = np.array([oracle.legal(a) for a in range(36 * 36)])
        np.testing.assert_array_equal(mask, oracle_mask, err_msg=f"move {move}")
        assert bool(term_fn(s)) == oracle.terminal(), f"move {move}"
        if oracle.terminal():
            break
        # bias toward captures so circuit moves get exercised
        legal = np.nonzero(oracle_mask)[0]
        caps = [a for a in legal if oracle.board[a % 36] == 3 - oracle.turn]
        pool = caps if caps and rng.rand() < 0.7 else legal
        a = int(rng.choice(pool))
        oracle.play(a)
        s = step(s, jnp.int32(a))
        np.testing.assert_array_equal(np.asarray(s.board), np.array(oracle.board, np.int8))
    if oracle.terminal():
        assert float(jax.jit(env.eval_score)(s)) == oracle.score()


def test_surakarta_known_circuit_capture():
    """Hand position: a piece on a red line captures around an arc."""
    env = _SUR
    oracle = PySurakarta()
    # clear the board, place B at (x=2,y=2)=14 (red row/col), W at (x=0,y=2)=12
    oracle.board = [0] * 36
    oracle.board[14] = 1
    oracle.board[12] = 2
    oracle.history = {(tuple(oracle.board), 1)}
    s = env.init().replace(
        board=jnp.asarray(np.array(oracle.board, np.int8)),
        history_a=jnp.zeros_like(env.init().history_a),
        history_b=jnp.zeros_like(env.init().history_b),
    )
    ha, hb = env._board_hash(s.board, jnp.int8(1))
    s = s.replace(hash_a=ha, hash_b=hb,
                  history_a=s.history_a.at[0].set(ha), history_b=s.history_b.at[0].set(hb))
    mask = np.asarray(jax.jit(env.legal_mask)(s))
    oracle_mask = np.array([oracle.legal(a) for a in range(36 * 36)])
    np.testing.assert_array_equal(mask, oracle_mask)
    a = 14 * 36 + 12  # capture W at 12 via the circuit
    assert oracle_mask[a], "expected circuit capture to be legal"
