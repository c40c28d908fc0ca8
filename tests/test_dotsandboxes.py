"""Dots and Boxes rule tests vs a transparent Python oracle (reference
``environment/dotsandboxes/dotsandboxes.cpp`` semantics: line placement,
box capture with continue-turn, box-majority scoring, 90-channel features)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minizero_tpu.envs.dotsandboxes import (
    DOT,
    EMPTY_BOX,
    LINE,
    NO_LINE,
    DotsAndBoxesEnv,
)


class Oracle:
    """Plain-Python transcription of the reference env
    (dotsandboxes.cpp:94-245)."""

    def __init__(self, n):
        self.n = n
        self.full = 2 * n + 1
        self.board = []
        for y in range(self.full):
            for x in range(self.full):
                if x % 2 == 0 and y % 2 == 0:
                    self.board.append(DOT)
                elif x % 2 == 0 or y % 2 == 0:
                    self.board.append(NO_LINE)
                else:
                    self.board.append(EMPTY_BOX)
        self.turn = 1
        self.board_history = [list(self.board)]
        self.continue_history = [0]

    def legal(self):
        return [self.board[2 * a + 1] == NO_LINE for a in range(2 * self.n * (self.n + 1))]

    def _lines_around(self, pos):
        w = self.full
        x, y = pos % w, pos // w
        out = []
        for dx, dy in ((1, 0), (0, 1), (-1, 0), (0, -1)):
            xx, yy = x + dx, y + dy
            if 0 <= xx < w and 0 <= yy < w:
                out.append(yy * w + xx)
        return out

    def act(self, action):
        pos = 2 * action + 1
        assert self.board[pos] == NO_LINE
        self.board[pos] = LINE
        cont = False
        for apos in self._lines_around(pos):
            if self.board[apos] != EMPTY_BOX:
                continue
            if all(self.board[p] == LINE for p in self._lines_around(apos)):
                self.board[apos] = self.turn
                cont = True
        self.board_history.append(list(self.board))
        self.continue_history.append(self.turn if cont else 0)
        if not cont:
            self.turn = 3 - self.turn

    def terminal(self):
        return EMPTY_BOX not in self.board

    def score(self):
        p1 = self.board.count(1)
        p2 = self.board.count(2)
        return 1.0 if p1 > p2 else (-1.0 if p2 > p1 else 0.0)

    def features(self):
        """dotsandboxes.cpp:247-325, re-laid-out NHWC."""
        spatial = self.full * self.full
        feats = np.zeros((spatial, 90), np.float32)
        past = min(8, len(self.board_history))
        own, opp = self.turn, 3 - self.turn
        for h in range(past):
            b = self.board_history[-1 - h]
            cp = self.continue_history[-1 - h]
            c = 11 * h
            for pos in range(spatial):
                g = b[pos]
                if g == own:
                    feats[pos, c] = 1
                elif g == opp:
                    feats[pos, c + 1] = 1
                elif g == EMPTY_BOX:
                    feats[pos, c + 2] = 1
                elif g == NO_LINE:
                    feats[pos, c + 3] = 1
                elif g == LINE:
                    feats[pos, c + 4] = 1
                x, y = pos % self.full, pos // self.full
                if x % 2 == 1 and y % 2 == 1:
                    cnt = sum(b[p] != NO_LINE for p in self._lines_around(pos))
                    if cnt:
                        feats[pos, c + 4 + cnt] = 1
                feats[pos, c + 9] = 1.0 if cp == own else 0.0
                feats[pos, c + 10] = 1.0 if cp == opp else 0.0
        feats[:, 88] = 1.0 if self.turn == 1 else 0.0
        feats[:, 89] = 1.0 if self.turn == 2 else 0.0
        return feats.reshape(self.full, self.full, 90)


@pytest.mark.parametrize("n,seed", [(2, 0), (3, 1), (3, 2)])
def test_random_playout_matches_oracle(n, seed):
    env = DotsAndBoxesEnv(board_size=n)
    oracle = Oracle(n)
    state = env.init()
    step = jax.jit(env.step)
    rng = np.random.RandomState(seed)
    moves = 0
    while not oracle.terminal():
        legal = oracle.legal()
        mask = np.asarray(env.legal_mask(state))
        np.testing.assert_array_equal(mask, legal)
        assert not bool(env.is_terminal(state))
        action = int(rng.choice(np.nonzero(legal)[0]))
        oracle.act(action)
        state = step(state, jnp.int32(action))
        assert int(state.turn) == oracle.turn
        np.testing.assert_array_equal(np.asarray(state.board), oracle.board)
        moves += 1
        if moves % 5 == 0 or oracle.terminal():
            np.testing.assert_array_equal(
                np.asarray(env.features(state)), oracle.features()
            )
    assert bool(env.is_terminal(state))
    assert float(env.eval_score(state)) == oracle.score()
    assert moves == 2 * n * (n + 1)  # every line gets drawn exactly once


def test_capture_grants_extra_turn():
    # on the 1x1 board there are 4 lines; the player who draws the 4th owns
    # the single box and it is player 2 after 1,2,3 alternation
    env = DotsAndBoxesEnv(board_size=1)
    state = env.init()
    for a in range(4):
        assert int(state.turn) == [1, 2, 1, 2][a]
        state = env.step(state, jnp.int32(a))
    assert bool(env.is_terminal(state))
    # box owner = player 2 -> score -1
    assert float(env.eval_score(state)) == -1.0
    # capture kept the turn with player 2
    assert int(state.turn) == 2


def test_coord_strings_roundtrip():
    env = DotsAndBoxesEnv(board_size=9)
    for a in range(env.spec.action_size):
        s = env.action_to_string(a)
        assert env.string_to_action(s) == a, (a, s)
    # reference examples (dotsandboxes.cpp:26-42): A1A2 vertical, A1B1 horizontal
    assert env.string_to_action("A1B1") == 0
    assert env.string_to_action("a1a2") == env.string_to_action("A2A1")
    assert env.string_to_action("A1C1") == -1  # not adjacent
    assert env.string_to_action("Z9Z10") == -1


def test_spec_matches_reference_dims():
    env = DotsAndBoxesEnv(board_size=9)
    # dotsandboxes.h:71-76: 90 channels on the 19x19 full grid, policy 180
    assert env.spec.num_input_channels == 90
    assert env.spec.input_height == 19 and env.spec.input_width == 19
    assert env.spec.action_size == 180
    assert env.num_rotations() == 1
