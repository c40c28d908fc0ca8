"""NoGo + Kill-All Go rule tests: pure-Python oracles / hand-built positions
cross-checked against the vectorised JAX envs (the deterministic replacement
for the reference's ``env_test``, mode_handler.cpp:167-192)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minizero_tpu.envs.killallgo import KillAllGoEnv
from minizero_tpu.envs.nogo import NoGoEnv


class PyNoGo:
    """Transparent NoGo oracle (reference nogo.h:25-76)."""

    def __init__(self, n=5):
        self.n, self.nn = n, n * n
        self.board = [0] * self.nn
        self.turn = 1

    def neighbors(self, p):
        r, c = divmod(p, self.n)
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            rr, cc = r + dr, c + dc
            if 0 <= rr < self.n and 0 <= cc < self.n:
                yield rr * self.n + cc

    def block_libs(self, p):
        colour = self.board[p]
        libs, stack, seen = set(), [p], {p}
        while stack:
            q = stack.pop()
            for r in self.neighbors(q):
                if self.board[r] == 0:
                    libs.add(r)
                elif self.board[r] == colour and r not in seen:
                    seen.add(r)
                    stack.append(r)
        return libs

    def legal(self, p):
        if p >= self.nn or self.board[p] != 0:
            return False
        ok = False
        for q in self.neighbors(p):
            if self.board[q] == 0:
                ok = True
            elif self.board[q] == self.turn:
                if len(self.block_libs(q)) > 1:
                    ok = True
            else:
                if len(self.block_libs(q)) == 1:
                    return False  # would capture
        return ok

    def play(self, p):
        assert self.legal(p)
        self.board[p] = self.turn
        self.turn = 3 - self.turn

    def terminal(self):
        return not any(self.legal(p) for p in range(self.nn))

    def score(self):
        return -1.0 if self.turn == 1 else 1.0


_NOGO5 = NoGoEnv(board_size=5)
_KAG7 = KillAllGoEnv(board_size=7)
_KAG_STEP = jax.jit(_KAG7.step)
_KAG_TERMINAL = jax.jit(_KAG7.is_terminal)
_KAG_EVAL = jax.jit(_KAG7.eval_score)


@pytest.mark.parametrize("seed", [0, 1])
def test_nogo_random_playout_matches_oracle(seed):
    n = 5
    env = _NOGO5
    oracle = PyNoGo(n=n)
    rng = np.random.RandomState(seed)
    state = env.init()
    step = jax.jit(env.step)
    for move in range(n * n + 1):
        jax_mask = np.asarray(env.legal_mask(state))
        oracle_mask = np.array([oracle.legal(p) for p in range(n * n)] + [False])
        np.testing.assert_array_equal(jax_mask, oracle_mask, err_msg=f"move {move} legality mismatch")
        assert bool(env.is_terminal(state)) == oracle.terminal(), f"move {move} terminal mismatch"
        if oracle.terminal():
            break
        action = int(rng.choice(np.nonzero(oracle_mask)[0]))
        oracle.play(action)
        state = step(state, jnp.int32(action))
        np.testing.assert_array_equal(np.asarray(state.board), np.array(oracle.board, np.int8))
    assert oracle.terminal()
    assert float(env.eval_score(state)) == oracle.score()


def test_nogo_no_pass_and_capture_illegal():
    env = _NOGO5
    s = env.init()
    mask = np.asarray(env.legal_mask(s))
    assert not mask[25]  # pass never legal
    # black surrounds white stone at 12 except one liberty at 17
    for a in [7, 12, 11, 24, 13, 23]:  # B7 W12 B11 W24 B13 W23
        s = env.step(s, jnp.int32(a))
    mask = np.asarray(env.legal_mask(s))
    assert not mask[17]  # playing 17 would capture W12 -> illegal in NoGo


def _benson_of(env, board_np, player):
    board = jnp.asarray(board_np, jnp.int8)
    labels = env._stone_labels(board)
    return np.asarray(env._benson_bitboard(board, labels, player))


def test_benson_two_eyes_alive():
    n = 7
    env = _KAG7
    board = np.zeros(n * n, np.int8)
    stones = [1, 3, 7, 8, 9, 10]  # (0,1),(0,3),(1,0)..(1,3); eyes at 0 and 2
    board[stones] = 1
    benson = _benson_of(env, board, 1)
    expected = np.zeros(n * n, bool)
    expected[stones] = True
    expected[[0, 2]] = True  # the two vital eye regions
    np.testing.assert_array_equal(benson, expected)
    assert not _benson_of(env, board, 2).any()


def test_benson_one_eye_dead():
    n = 7
    env = _KAG7
    board = np.zeros(n * n, np.int8)
    board[[1, 7, 8]] = 1  # single eye at 0 only
    assert not _benson_of(env, board, 1).any()


def test_benson_full_board_black_terminal():
    n = 7
    env = _KAG7
    board = np.ones(n * n, np.int8)
    board[[0, 2]] = 0  # two eyes; all the rest black
    benson = _benson_of(env, board, 1)
    assert benson.all()
    labels = env._stone_labels(jnp.asarray(board, jnp.int8))
    state = env.init().replace(board=jnp.asarray(board, jnp.int8), labels=labels)
    assert bool(_KAG_TERMINAL(state))
    assert float(_KAG_EVAL(state)) == 1.0


def test_killallgo_legality_staging():
    env = _KAG7
    s = env.init()
    nn = 49
    mask = np.asarray(env.legal_mask(s))
    assert not mask[nn] and mask[:nn].all()  # move 0: any stone, no pass
    s = _KAG_STEP(s, jnp.int32(24))  # B centre
    mask = np.asarray(env.legal_mask(s))
    assert mask[nn] and not mask[:nn].any()  # move 1: White must pass
    s = _KAG_STEP(s, jnp.int32(nn))  # W pass (forced)
    mask = np.asarray(env.legal_mask(s))
    assert not mask[nn]  # move 2: Black must not pass
    s = _KAG_STEP(s, jnp.int32(0))
    mask = np.asarray(env.legal_mask(s))
    assert mask[nn]  # move 3 onwards: plain Go (pass allowed)


def test_killallgo_white_two_eyes_ends_game():
    env = _KAG7
    s = env.init()
    step = _KAG_STEP
    # B opening + forced W pass, then White builds a two-eye corner group
    # (eyes at 42, 44) while Black fills the top rows
    w_stones = [43, 45, 35, 36, 37, 38]
    b_stones = [2, 4, 6, 8, 10, 12]
    moves = [0, 49]  # B0, W pass
    for b, w in zip(b_stones, w_stones):
        moves += [b, w]
    for i, a in enumerate(moves[:-1]):
        s = step(s, jnp.int32(a))
        assert not bool(_KAG_TERMINAL(s)), f"terminal too early at move {i}"
    s = step(s, jnp.int32(moves[-1]))
    assert bool(_KAG_TERMINAL(s))  # white group is pass-alive
    assert float(_KAG_EVAL(s)) == -1.0  # white wins


def test_killallgo_white_wiped_out_black_wins():
    env = _KAG7
    board = np.zeros(49, np.int8)
    board[[24, 25]] = 1  # black stones only
    labels = env._stone_labels(jnp.asarray(board, jnp.int8))
    state = env.init().replace(board=jnp.asarray(board, jnp.int8), labels=labels)
    assert float(_KAG_EVAL(state)) == 1.0


def test_killallgo_seki_detection():
    """Seki table generation + the vectorized area lookup in the env
    (reference killallgo_seki_7x7.cpp isSeki/lookupSekiBitboard)."""
    import jax.numpy as jnp

    from minizero_tpu.envs import seki7x7
    from minizero_tpu.envs.killallgo import KillAllGoEnv

    env = KillAllGoEnv(7, use_seki=True, seki_min_size=5, seki_max_size=5)
    table = seki7x7.ensure_table(5, 5)
    assert len(table) > 100  # the 5-cell sekis alone number >1k

    n = 7

    def dilate4(bb):
        out = bb
        for i in range(49):
            if not (bb >> i) & 1:
                continue
            r, c = divmod(i, n)
            for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                if 0 <= r + dr < n and 0 <= c + dc < n:
                    out |= 1 << ((r + dr) * n + c + dc)
        return out

    def dilate8(bb):
        out = bb
        for i in range(49):
            if not (bb >> i) & 1:
                continue
            r, c = divmod(i, n)
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    if 0 <= r + dr < n and 0 <= c + dc < n:
                        out |= 1 << ((r + dr) * n + c + dc)
        return out

    def state_from_bits(black_bits, white_bits):
        board = np.zeros(49, np.int8)
        for i in range(49):
            if (black_bits >> i) & 1:
                board[i] = 1
            elif (white_bits >> i) & 1:
                board[i] = 2
        board = jnp.asarray(board)
        return env.init().replace(board=board, labels=env._stone_labels(board))

    hits = 0
    for row in range(min(len(table), 5)):
        black, eyes = int(table[row, 0]), int(table[row, 1])
        shape = black | eyes
        ring = dilate8(shape) & ~shape
        outer = dilate4(ring) & ~shape & ~ring
        state = state_from_bits(black | outer, ring)
        assert bool(env._seki_detected(state)), (hex(black), hex(eyes))
        assert bool(env.is_terminal(state))
        assert float(env.eval_score(state)) == -1.0  # white survives
        # negative: open one ring stone -> the area grows, pattern mismatch
        hole = ring & (-ring)
        state2 = state_from_bits(black | outer, ring & ~hole)
        assert not bool(env._seki_detected(state2))
        hits += 1
    assert hits > 0

    # plain env (no seki flag) still works and never consults the table
    env_plain = KillAllGoEnv(7)
    assert not env_plain.use_seki


def test_killallgo_ko_rule_config():
    """env_killallgo_ko_rule reaches the Go superko hash (reference
    configuration.cpp:187 aliases env_go_ko_rule for killallgo builds)."""
    from minizero_tpu.config import default_config
    from minizero_tpu.envs import make_env

    cfg = default_config("killallgo").replace(env_killallgo_ko_rule="situational")
    env = make_env(cfg)
    assert isinstance(env, KillAllGoEnv)
    assert env.situational
    assert not make_env(default_config("killallgo")).situational
