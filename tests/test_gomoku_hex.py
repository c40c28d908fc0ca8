"""Gomoku and Hex rule tests."""

import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.gomoku import GomokuEnv
from minizero_tpu.envs.hex import HexEnv


class TestGomoku:
    def test_five_in_row_wins(self):
        env = GomokuEnv(board_size=9)
        s = env.init()
        # black: 0,1,2,3,4 (top row); white: 9..12
        for a in [0, 9, 1, 10, 2, 11, 3, 12, 4]:
            s = env.step(s, jnp.int32(a))
        assert bool(env.is_terminal(s))
        assert float(env.eval_score(s)) == 1.0

    def test_overline_no_win_when_exactly_five(self):
        env = GomokuEnv(board_size=9, exactly_five=True)
        s = env.init()
        # black builds 0,1,2,3 then 5, then plays 4 -> line of SIX 0..5
        for a in [0, 18, 1, 19, 2, 20, 3, 21, 5, 22, 4]:
            s = env.step(s, jnp.int32(a))
        assert not bool(env.is_terminal(s))  # overline: no win

    def test_overline_wins_freestyle(self):
        env = GomokuEnv(board_size=9, exactly_five=False)
        s = env.init()
        for a in [0, 18, 1, 19, 2, 20, 3, 21, 5, 22, 4]:
            s = env.step(s, jnp.int32(a))
        assert bool(env.is_terminal(s))
        assert float(env.eval_score(s)) == 1.0

    def test_diagonal_win_player2(self):
        env = GomokuEnv(board_size=9)
        s = env.init()
        # white diag 0,10,20,30,40; black fills elsewhere
        for a in [1, 0, 2, 10, 3, 20, 4, 30, 6, 40]:
            s = env.step(s, jnp.int32(a))
        assert bool(env.is_terminal(s))
        assert float(env.eval_score(s)) == -1.0

    def test_outer_open_first_move(self):
        env = GomokuEnv(board_size=9, rule="outer_open")
        s = env.init()
        mask = np.asarray(env.legal_mask(s)).reshape(9, 9)
        assert not mask[4, 4]  # centre blocked on the first move
        assert mask[0, 0] and mask[8, 8]
        s = env.step(s, jnp.int32(0))
        mask2 = np.asarray(env.legal_mask(s)).reshape(9, 9)
        assert mask2[4, 4]  # later moves unrestricted


class TestHex:
    def test_p1_left_right_win(self):
        env = HexEnv(board_size=5, use_swap_rule=False)
        s = env.init()
        # P1 fills row 2 (cols 0..4), P2 scatters on rows 0 and 4 w/o winning
        for a in [10, 0, 11, 1, 12, 2, 13, 3, 14]:
            s = env.step(s, jnp.int32(a))
        assert bool(env.is_terminal(s))
        assert float(env.eval_score(s)) == 1.0

    def test_p2_top_bottom_win(self):
        env = HexEnv(board_size=5, use_swap_rule=False)
        s = env.init()
        # P2 fills column 2 rows 0..4; P1 plays column 0 rows 0..3 (no win)
        for a in [0, 2, 5, 7, 10, 12, 15, 17, 4, 22]:
            s = env.step(s, jnp.int32(a))
        assert bool(env.is_terminal(s))
        assert float(env.eval_score(s)) == -1.0

    def test_hex_diagonal_adjacency(self):
        """(r, c) connects to (r+1, c+1) in this hex mapping."""
        env = HexEnv(board_size=3, use_swap_rule=False)
        s = env.init()
        # P1: (0,0)=0, (1,1)=4, (2,2)=8 is NOT a left-right chain; instead use
        # (0,0)->(1,1) adjacency check directly via a connecting path:
        # P1 stones 0 (c0), 4 (c1), 8 (c2): 0-(+1,+1)-4 adjacent, 4-8 adjacent
        for a in [0, 1, 4, 2, 8]:
            s = env.step(s, jnp.int32(a))
        assert bool(env.is_terminal(s))
        assert float(env.eval_score(s)) == 1.0

    def test_swap_rule(self):
        env = HexEnv(board_size=5, use_swap_rule=True)
        s = env.init()
        s = env.step(s, jnp.int32(6))  # P1 plays (1,1)
        mask = np.asarray(env.legal_mask(s))
        assert mask[6]  # occupied first stone is "playable" = swap
        s2 = env.step(s, jnp.int32(6))  # P2 swaps
        board = np.asarray(s2.board).reshape(5, 5)
        assert board[1, 1] == 0
        # reflection over anti-diagonal: (1,1) -> (5-1-1, 5-1-1) = (3,3)
        assert board[3, 3] == 2
        assert int(s2.turn) == 1

    def test_random_playout_has_winner(self):
        env = HexEnv(board_size=5, use_swap_rule=False)
        rng = np.random.RandomState(0)
        s = env.init()
        step = jax.jit(env.step)
        for _ in range(25):
            if bool(env.is_terminal(s)):
                break
            mask = np.asarray(env.legal_mask(s))
            a = int(rng.choice(np.nonzero(mask)[0]))
            s = step(s, jnp.int32(a))
        assert bool(env.is_terminal(s))  # hex cannot draw
        assert float(env.eval_score(s)) != 0.0
