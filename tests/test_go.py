"""Go rule tests: a transparent pure-Python Go oracle (sets + flood fill,
positional superko, Tromp-Taylor) cross-checked against the vectorised JAX env
at every move of random playouts — the deterministic replacement for the
reference's ``env_test`` random round-trip (mode_handler.cpp:167-192)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minizero_tpu.envs.go import GoEnv


class PyGo:
    """Minimal transparent Go oracle (positional superko, Tromp-Taylor)."""

    def __init__(self, n=5, komi=7.5):
        self.n, self.nn, self.komi = n, n * n, komi
        self.board = [0] * self.nn
        self.turn = 1
        self.history = set()  # past position hashes (board tuples)
        self.passes = 0
        self.moves = 0

    def neighbors(self, p):
        r, c = divmod(p, self.n)
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            rr, cc = r + dr, c + dc
            if 0 <= rr < self.n and 0 <= cc < self.n:
                yield rr * self.n + cc

    def block_and_libs(self, board, p):
        colour = board[p]
        block, libs, stack, seen = set(), set(), [p], {p}
        while stack:
            q = stack.pop()
            block.add(q)
            for r in self.neighbors(q):
                if board[r] == 0:
                    libs.add(r)
                elif board[r] == colour and r not in seen:
                    seen.add(r)
                    stack.append(r)
        return block, libs

    def result_board(self, p):
        """Board after playing p for self.turn, or None if basically illegal."""
        if self.board[p] != 0:
            return None
        board = list(self.board)
        board[p] = self.turn
        opp = 3 - self.turn
        for q in self.neighbors(p):
            if board[q] == opp:
                block, libs = self.block_and_libs(board, q)
                if not libs:
                    for r in block:
                        board[r] = 0
        block, libs = self.block_and_libs(board, p)
        if not libs:
            return None  # suicide
        return board

    def legal(self, p):
        if p == self.nn:
            return True
        board = self.result_board(p)
        if board is None:
            return False
        return tuple(board) not in self.history

    def play(self, p):
        assert self.legal(p)
        if p == self.nn:
            self.passes += 1
            self.history.add(tuple(self.board))
        else:
            self.board = self.result_board(p)
            self.passes = 0
            self.history.add(tuple(self.board))
        self.turn = 3 - self.turn
        self.moves += 1

    def terminal(self):
        return self.passes >= 2 or self.moves > 2 * self.nn

    def score(self):
        black = sum(1 for v in self.board if v == 1)
        white = sum(1 for v in self.board if v == 2) + self.komi
        seen = set()
        for p in range(self.nn):
            if self.board[p] != 0 or p in seen:
                continue
            region, stack, touch = {p}, [p], set()
            while stack:
                q = stack.pop()
                for r in self.neighbors(q):
                    if self.board[r] == 0:
                        if r not in region:
                            region.add(r)
                            stack.append(r)
                    else:
                        touch.add(self.board[r])
            seen |= region
            # reference order: no white boundary -> black else only white -> white
            if 2 not in touch:
                black += len(region)
            elif 1 not in touch:
                white += len(region)
        return 1.0 if black > white else (-1.0 if black < white else 0.0)


def _oracle_superko_history_matches(env, state, oracle):
    return True  # hashes differ by design; superko equivalence is via legality


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_go_random_playout_matches_oracle(seed):
    n = 5
    env = GoEnv(board_size=n, komi=7.5)
    oracle = PyGo(n=n, komi=7.5)
    rng = np.random.RandomState(seed)
    state = env.init()
    step = jax.jit(env.step)
    for move in range(2 * n * n + 2):
        jax_mask = np.asarray(env.legal_mask(state))
        oracle_mask = np.array([oracle.legal(p) for p in range(n * n + 1)])
        np.testing.assert_array_equal(jax_mask, oracle_mask, err_msg=f"move {move} legality mismatch")
        assert bool(env.is_terminal(state)) == oracle.terminal(), f"move {move} terminal mismatch"
        if oracle.terminal():
            break
        # random legal move, mild pass bias to finish games
        legal_ids = np.nonzero(oracle_mask)[0]
        board_moves = legal_ids[legal_ids < n * n]
        if len(board_moves) == 0 or rng.rand() < 0.1:
            action = n * n
        else:
            action = int(rng.choice(board_moves))
        oracle.play(action)
        state = step(state, jnp.int32(action))
        np.testing.assert_array_equal(
            np.asarray(state.board), np.array(oracle.board, np.int8), err_msg=f"move {move} board mismatch"
        )
    assert float(env.eval_score(state)) == oracle.score()


def test_go_capture():
    env = GoEnv(board_size=5)
    s = env.init()
    # black surrounds white stone at 12 (r2,c2): neighbors 7, 11, 13, 17
    for a in [7, 12, 11, 24, 13]:  # B7 W12 B11 W24 B13
        s = env.step(s, jnp.int32(a))
    # white to move; black plays 17 next after a white move elsewhere
    s = env.step(s, jnp.int32(23))  # W23
    s = env.step(s, jnp.int32(17))  # B17 captures W12
    board = np.asarray(s.board)
    assert board[12] == 0  # captured
    assert board[17] == 1


def test_go_suicide_illegal():
    env = GoEnv(board_size=3)
    s = env.init()
    # black stones at 1,3 make 0 a one-point eye; with white to move,
    # playing 0 is suicide
    for a in [1, 8, 3, 7, 5]:  # B1 W8 B3 W7 B5 -> white to move
        s = env.step(s, jnp.int32(a))
    mask = np.asarray(env.legal_mask(s))
    assert not mask[0]  # suicide for white
    # 4 is legal for white: adjacent own block W7 has liberties 4,6
    assert mask[4]


def test_go_simple_ko():
    """Classic ko: recapture immediately is illegal under positional superko."""
    env = GoEnv(board_size=5)
    s = env.init()
    #  . B W .          B=black W=white; ko at center
    #  B W . W     -> black plays 12 capturing 11... build concrete shape:
    # black: 1, 5, 11? Let's use standard: B at 1,5,7; W at 2,8,12 -> hmm
    # Shape: B: 6, 10, 16; W: 7, 13, 17; empty 11,12 center pair.
    for a in [6, 7, 10, 13, 16, 17]:
        s = env.step(s, jnp.int32(a))
    # black plays 12: W at ... build ko by capture: W plays 11? Actually:
    # B plays 12 -> surrounds nothing; W plays 11 -> W11 has neighbors 6(B),10(B),12(B),16(B)? 11 is r2c1: neighbors 6,10,12,16
    s = env.step(s, jnp.int32(12))  # B12: neighbors 7(W),11(empty),13(W),17(W)
    # now W captures B12 by playing 11? no: B12's liberties: 11 only? r2c2=12,
    # neighbors 7(W),11(empty),13(W),17(W) -> single liberty 11
    s = env.step(s, jnp.int32(11))  # W11 captures B12
    board = np.asarray(s.board)
    assert board[12] == 0 and board[11] == 2
    # black recapture at 12 would recreate the pre-capture position -> illegal
    mask = np.asarray(env.legal_mask(s))
    assert not mask[12]


def test_go_two_passes_end():
    env = GoEnv(board_size=5)
    s = env.init()
    s = env.step(s, jnp.int32(12))
    s = env.step(s, jnp.int32(25))  # pass
    assert not bool(env.is_terminal(s))
    s = env.step(s, jnp.int32(25))  # pass
    assert bool(env.is_terminal(s))
    # single black stone, rest empty touching only black -> black owns all
    assert float(env.eval_score(s)) == 1.0  # 25 > 7.5 komi


def test_go_features_shape_and_history():
    env = GoEnv(board_size=5)
    s = env.init()
    f = np.asarray(env.features(s))
    assert f.shape == (5, 5, 18)
    assert f[:, :, :16].sum() == 0
    assert (f[:, :, 16] == 1).all() and (f[:, :, 17] == 0).all()
    s = env.step(s, jnp.int32(12))
    f = np.asarray(env.features(s))
    # white to move: own=white (none), opp=black stone at 12
    assert f[:, :, 0].sum() == 0
    assert f[2, 2, 1] == 1
    assert (f[:, :, 17] == 1).all()


def test_cc_rounds_sufficient_for_spiral():
    """Worst-case connected component: a spiral corridor of graph-distance
    ~NN must still be labelled in the fixed unrolled rounds."""
    n = 9
    env = GoEnv(board_size=n)
    # build a spiral path over the board
    grid = np.full((n, n), -1)
    r = c = 0
    dr, dc = 0, 1
    order = []
    for i in range(n * n):
        grid[r, c] = i
        order.append(r * n + c)
        nr, nc = r + dr, c + dc
        if not (0 <= nr < n and 0 <= nc < n and grid[nr, nc] == -1):
            dr, dc = dc, -dr
            nr, nc = r + dr, c + dc
        r, c = nr, nc
    # the full board as one giant block (diameter ~2n)
    board = jnp.ones((n * n,), jnp.int8)
    labels = env._stone_labels(board)
    assert int(np.asarray(labels).max()) == 0  # single component, label 0

    # worst case: black stones forming a 1-wide snake along the spiral order
    # (graph diameter ~NN) — alternate cells empty so the snake is the spiral
    snake = np.zeros((n * n,), np.int8)
    snake[np.asarray(order)] = 1  # full board again, via spiral order
    # 1-wide comb corridor of empty cells (diameter ~NN/2) between stones
    comb = np.zeros((n, n), np.int8)
    comb[:, ::2] = 1
    comb[0, :] = 0  # connect corridors along the top row
    board2 = jnp.asarray(comb).reshape(-1).astype(jnp.int8)
    empty = np.asarray(board2) == 0
    connected = np.asarray(env._nbr_valid) & empty[np.asarray(env._nbr)] & empty[:, None]
    labels2 = env._cc_labels(jnp.asarray(empty), jnp.asarray(connected))
    l = np.asarray(labels2)
    emp = np.nonzero(empty)[0]
    assert len(set(l[emp])) == 1  # the comb corridor is one region
