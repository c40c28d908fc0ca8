"""Havannah / ConHex rule tests vs transparent Python oracles (direct ports
of the reference C++ semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minizero_tpu.envs.conhex import _CELLS, _INVALID, ConHexEnv
from minizero_tpu.envs.havannah import HavannahEnv

_HAV = HavannahEnv(board_size=5, use_swap_rule=True)
_CHX = ConHexEnv(use_swap_rule=True)


# ------------------------------------------------------------------ havannah
class PyHavannah:
    NBRS = [(-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0)]

    def __init__(self, n, swap=True):
        self.n = n
        self.e = 2 * n - 1
        self.swap = swap
        self.board = [0] * (self.e * self.e)
        self.turn = 1
        self.moves = 0
        self.winner = 0
        self.first = -1

    def valid(self, i, j):
        return (
            0 <= i < self.e and 0 <= j < self.e
            and self.n - 1 <= i + j <= 3 * self.n - 3
        )

    def valid_pos(self, p):
        return self.valid(p // self.e, p % self.e)

    def neighbors(self, p):
        i, j = divmod(p, self.e)
        for di, dj in self.NBRS:
            a, b = i + di, j + dj
            if self.valid(a, b):
                yield a * self.e + b

    def legal(self, p):
        if not self.valid_pos(p):
            return False
        if self.swap and self.moves == 1:
            return True
        return self.board[p] == 0

    def corners(self):
        n, e = self.n, self.e
        return {n - 1, e - 1, (n - 1) * e, n * e - 1, (e - 1) * e, (e - 1) * e - 1 + n}

    def borders(self):
        n, e = self.n, self.e
        bs = [set() for _ in range(6)]
        for i in range(n - 2):
            bs[0].add(n + i)
            bs[1].add((i + 1) * e + n - 2 - i)
            bs[2].add((n + i) * e)
            bs[3].add((e - 1) * e + 1 + i)
            bs[4].add((e - 1 - i) * e - n + 1 + i)
            bs[5].add((n - 1 - i) * e - 1)
        return bs

    def group(self, p):
        colour = self.board[p]
        seen = {p}
        stack = [p]
        while stack:
            q = stack.pop()
            for r in self.neighbors(q):
                if self.board[r] == colour and r not in seen:
                    seen.add(r)
                    stack.append(r)
        return seen

    def own_nbrs(self, p, player):
        return sum(1 for q in self.neighbors(p) if self.board[q] == player)

    def detect_hole(self, group):
        e = self.e
        cells = [(p // e, p % e) for p in group]
        imin = min(c[0] for c in cells)
        imax = max(c[0] for c in cells)
        jmin = min(c[1] for c in cells)
        jmax = max(c[1] for c in cells)
        di, dj = imax - imin + 3, jmax - jmin + 3
        data = [[0] * dj for _ in range(di)]
        for i in range(di):
            data[i][0] = data[i][dj - 1] = 1
        for j in range(dj):
            data[0][j] = data[di - 1][j] = 1
        for (ci, cj) in cells:
            data[ci - imin + 1][cj - jmin + 1] = -1
        changed = True
        while changed:
            changed = False
            for i in range(1, di - 1):
                for j in range(1, dj - 1):
                    if data[i][j] >= 0:
                        d = max(data[i][j], data[i - 1][j], data[i - 1][j + 1],
                                data[i][j - 1], data[i][j + 1],
                                data[i + 1][j - 1], data[i + 1][j])
                        if data[i][j] != d:
                            data[i][j] = d
                            changed = True
        return any(data[i][j] == 0 for i in range(di) for j in range(dj))

    def play(self, p):
        player = self.turn
        if self.swap and self.moves == 1 and p == self.first:
            self.board[self.first] = 0
        self.board[p] = player
        group = self.group(p)
        # bridge
        if len(group & self.corners()) >= 2:
            self.winner = player
        # fork
        elif sum(1 for b in self.borders() if group & b) >= 3:
            self.winner = player
        # ring
        elif len(group) >= 6 and self.own_nbrs(p, player) >= 2:
            full = any(
                self.board[q] == player and self.own_nbrs(q, player) == 6
                for q in self.neighbors(p)
            )
            if full or self.detect_hole(group):
                self.winner = player
        if self.moves == 0:
            self.first = p
        self.turn = 3 - self.turn
        self.moves += 1

    def terminal(self):
        if self.winner:
            return True
        return all(
            self.board[p] != 0 or not self.valid_pos(p)
            for p in range(self.e * self.e)
        )

    def score(self):
        return 1.0 if self.winner == 1 else (-1.0 if self.winner == 2 else 0.0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_havannah_random_playout_matches_oracle(seed):
    env = _HAV
    oracle = PyHavannah(5)
    rng = np.random.RandomState(seed)
    s = env.init()
    step = jax.jit(env.step)
    mask_fn = jax.jit(env.legal_mask)
    term_fn = jax.jit(env.is_terminal)
    for move in range(70):
        mask = np.asarray(mask_fn(s))
        oracle_mask = np.array([oracle.legal(p) for p in range(env.ee)])
        np.testing.assert_array_equal(mask, oracle_mask, err_msg=f"move {move}")
        assert bool(term_fn(s)) == oracle.terminal(), f"move {move}"
        if oracle.terminal():
            break
        a = int(rng.choice(np.nonzero(oracle_mask)[0]))
        oracle.play(a)
        s = step(s, jnp.int32(a))
        np.testing.assert_array_equal(np.asarray(s.board), np.array(oracle.board, np.int8))
        assert int(s.winner) == oracle.winner, f"move {move} winner mismatch"
    assert float(jax.jit(env.eval_score)(s)) == oracle.score()


def test_havannah_bridge_win():
    env = HavannahEnv(board_size=4, use_swap_rule=False)
    # corners of the n=4 board: connect 3 (=n-1 top-left area) and 6 (e-1)
    # via the top row: positions (0,3),(0,4),(0,5),(0,6) on e=7 grid
    s = env.init()
    moves = [3, 45, 4, 39, 5, 33, 6]  # black top row; white elsewhere
    step = jax.jit(env.step)
    for a in moves:
        assert bool(env.legal_mask(s)[a])
        s = step(s, jnp.int32(a))
    assert int(s.winner) == 1  # two corners connected = bridge


def test_havannah_ring_win():
    env = HavannahEnv(board_size=5, use_swap_rule=False)
    s = env.init()
    e = env.e
    # black ring surrounding (4,4) on the e=9 grid: the 6 hex neighbours
    ring = [(3, 4), (3, 5), (4, 3), (4, 5), (5, 3), (5, 4)]
    black = [i * e + j for i, j in ring]
    white = [0 * e + 8, 0 * e + 7, 1 * e + 7, 1 * e + 8, 2 * e + 7]
    moves = []
    for b, w in zip(black, white + [None]):
        moves.append(b)
        if w is not None:
            moves.append(w)
    step = jax.jit(env.step)
    for i, a in enumerate(moves):
        s = step(s, jnp.int32(a))
    assert int(s.winner) == 1  # empty-centre ring


def test_havannah_swap():
    env = _HAV
    s = env.init()
    s = env.step(s, jnp.int32(40))  # black centre-ish
    mask = np.asarray(env.legal_mask(s))
    assert mask[40]  # swap: replaying the same cell is legal
    s2 = env.step(s, jnp.int32(40))
    board = np.asarray(s2.board)
    assert board[40] == 2  # stone now belongs to white
    assert (board != 1).all()


# ------------------------------------------------------------------- conhex
class PyConHex:
    def __init__(self, swap=True):
        self.swap = swap
        self.holes = [0] * 81
        self.cell_owner = [0] * 41
        self.turn = 1
        self.moves = 0
        self.winner = 0
        self.first = -1
        self.invalid = set(_INVALID)
        self.cells = [list(h) for h, _ in _CELLS]
        self.flags = [f for _, f in _CELLS]
        hole_cells = [[] for _ in range(81)]
        for cid, hs in enumerate(self.cells):
            for h in hs:
                hole_cells[h].append(cid)
        self.hole_cells = hole_cells
        self.adj = [set() for _ in range(41)]
        for h in range(81):
            if len(hole_cells[h]) == 3:
                for a in hole_cells[h]:
                    for b in hole_cells[h]:
                        if a != b:
                            self.adj[a].add(b)

    def legal(self, p):
        if p in self.invalid:
            return False
        if self.swap and self.moves == 1:
            return True
        return self.holes[p] == 0

    def play(self, p):
        player = self.turn
        if self.swap and self.moves == 1 and p == self.first:
            row, col = p // 9, p % 9
            p = (9 - 1 - col) * 9 + (9 - 1 - row)
            self.holes = [0] * 81
            self.cell_owner = [0] * 41
        self.holes[p] = player
        for cid in self.hole_cells[p]:
            if self.cell_owner[cid] != 0:
                continue
            cnt = sum(1 for h in self.cells[cid] if self.holes[h] == player)
            need = 2 if len(self.cells[cid]) == 3 else 3
            if cnt >= need:
                self.cell_owner[cid] = player
        # connectivity
        if self.connected(player):
            self.winner = self.winner or player
        if self.moves == 0:
            self.first = p
        self.turn = 3 - self.turn
        self.moves += 1

    def connected(self, player):
        if player == 1:
            srcs = [c for c in range(41) if self.flags[c] & 1 and self.cell_owner[c] == player]
            dsts = {c for c in range(41) if self.flags[c] & 8 and self.cell_owner[c] == player}
        else:
            srcs = [c for c in range(41) if self.flags[c] & 4 and self.cell_owner[c] == player]
            dsts = {c for c in range(41) if self.flags[c] & 2 and self.cell_owner[c] == player}
        seen = set(srcs)
        stack = list(srcs)
        while stack:
            c = stack.pop()
            if c in dsts:
                return True
            for d in self.adj[c]:
                if self.cell_owner[d] == player and d not in seen:
                    seen.add(d)
                    stack.append(d)
        return bool(seen & dsts)

    def terminal(self):
        return self.winner != 0 or all(
            self.holes[p] != 0 or p in self.invalid for p in range(81)
        )

    def score(self):
        return 1.0 if self.winner == 1 else (-1.0 if self.winner == 2 else 0.0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_conhex_random_playout_matches_oracle(seed):
    env = _CHX
    oracle = PyConHex()
    rng = np.random.RandomState(seed)
    s = env.init()
    step = jax.jit(env.step)
    mask_fn = jax.jit(env.legal_mask)
    term_fn = jax.jit(env.is_terminal)
    for move in range(81):
        mask = np.asarray(mask_fn(s))
        oracle_mask = np.array([oracle.legal(p) for p in range(81)])
        np.testing.assert_array_equal(mask, oracle_mask, err_msg=f"move {move}")
        assert bool(term_fn(s)) == oracle.terminal(), f"move {move}"
        if oracle.terminal():
            break
        a = int(rng.choice(np.nonzero(oracle_mask)[0]))
        oracle.play(a)
        s = step(s, jnp.int32(a))
        np.testing.assert_array_equal(np.asarray(s.holes), np.array(oracle.holes, np.int8))
        np.testing.assert_array_equal(
            np.asarray(s.cell_owner), np.array(oracle.cell_owner, np.int8),
            err_msg=f"move {move} cell capture mismatch",
        )
        assert int(s.winner) == oracle.winner, f"move {move}"
    assert float(jax.jit(env.eval_score)(s)) == oracle.score()


def test_conhex_swap_reflection():
    env = _CHX
    s = env.init()
    s = env.step(s, jnp.int32(1))  # black at (0, 1)
    s2 = env.step(s, jnp.int32(1))  # white swaps
    holes = np.asarray(s2.holes)
    # reflection of (r=0, c=1) over the anti-diagonal -> (r=7, c=8) = 71
    assert holes[1] == 0 and holes[71] == 2
