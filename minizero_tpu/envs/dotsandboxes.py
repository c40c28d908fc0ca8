"""Dots and Boxes — TPU-native re-design of the reference env
(``minizero/environment/dotsandboxes/dotsandboxes.{h,cpp}``).

The reference keeps a (2N+1)x(2N+1) cell grid mixing dots, line slots and
boxes (``dotsandboxes.cpp:107-137``) and, per move, walks the 4 neighbours of
the placed line to find newly closed boxes (``dotsandboxes.cpp:163-175``).
Here the same grid is a fixed-shape int8 array and capture detection is a
whole-board shift-and-count: a box is newly owned iff it is unowned and all
four surrounding line cells are set — which can only happen for boxes
adjacent to the just-placed line, so the global form is exactly equivalent
to the reference's local walk (and gather-free).

Key identities carried over from the reference:
  * line cells are exactly the odd flat positions of the full grid, so
    action id -> position is ``pos = 2*id + 1`` (``dotsandboxes.h:88``) and
    the legal mask is a static stride slice ``grid[1::2] == NO_LINE``;
  * if a move closes >=1 box the mover moves again (``current_player_continue_``,
    ``dotsandboxes.cpp:178-183``);
  * terminal = every box owned (``dotsandboxes.cpp:214-218``); score = box
    majority (``dotsandboxes.cpp:220-245``);
  * features = 8-step history x 11 planes + 2 turn planes = 90 channels on
    the full (2N+1)x(2N+1) grid (``dotsandboxes.cpp:247-325``); no dihedral
    augmentation (``getRotatePosition`` is the identity, ``dotsandboxes.h:69-70``).

AlphaZero-only, like the reference (``getActionFeatures`` throws,
``dotsandboxes.cpp:327-330``).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec

# grid cell codes (reference Grid enum, dotsandboxes.h:13-21)
EMPTY_BOX = 0
P1_BOX = 1
P2_BOX = 2
NO_LINE = 3
LINE = 4
DOT = 5
_HISTORY = 8


@flax.struct.dataclass
class DotsAndBoxesState:
    board: jnp.ndarray  # i8[(2N+1)*(2N+1)] cell codes
    turn: jnp.ndarray  # i8 scalar: 1 or 2
    num_moves: jnp.ndarray  # i32 scalar
    board_history: jnp.ndarray  # i8[8, (2N+1)*(2N+1)] ring: [0] = current; -1 pad
    continue_history: jnp.ndarray  # i8[8]: player who closed a box and moves again, 0 none


class DotsAndBoxesEnv(Env):
    def __init__(self, board_size: int = 9):
        n = board_size
        self.n = n
        self.full = 2 * n + 1
        action_size = 2 * n * (n + 1)  # getNumGirdLines (dotsandboxes.h:89)
        self.spec = EnvSpec(
            name="dotsandboxes",
            num_players=2,
            board_size=n,
            action_size=action_size,
            num_input_channels=90,
            input_height=self.full,
            input_width=self.full,
            hidden_height=self.full,
            hidden_width=self.full,
            max_game_length=action_size,  # every move sets one line
        )
        ys, xs = np.mgrid[0 : self.full, 0 : self.full]
        self._box_mask = jnp.asarray(((ys % 2 == 1) & (xs % 2 == 1)).reshape(-1))
        init = np.full((self.full, self.full), EMPTY_BOX, np.int8)
        init[(ys % 2 == 0) & (xs % 2 == 0)] = DOT
        init[(ys % 2 == 0) ^ (xs % 2 == 0)] = NO_LINE
        self._init_board = jnp.asarray(init.reshape(-1))

    # -- helpers -------------------------------------------------------------

    def _adjacent_line_count(self, grid_flat: jnp.ndarray) -> jnp.ndarray:
        """i32[(2N+1)^2]: per cell, number of LINE cells among its 4 grid
        neighbours (only meaningful at box cells, which are interior)."""
        g = (grid_flat == LINE).astype(jnp.int32).reshape(self.full, self.full)
        padded = jnp.pad(g, 1)
        cnt = (
            padded[:-2, 1:-1] + padded[2:, 1:-1] + padded[1:-1, :-2] + padded[1:-1, 2:]
        )
        return cnt.reshape(-1)

    # -- transition -----------------------------------------------------------

    def init(self) -> DotsAndBoxesState:
        hist = jnp.full((_HISTORY, self.full * self.full), -1, jnp.int8)
        hist = hist.at[0].set(self._init_board)
        return DotsAndBoxesState(
            board=self._init_board,
            turn=jnp.int8(1),
            num_moves=jnp.int32(0),
            board_history=hist,
            continue_history=jnp.zeros((_HISTORY,), jnp.int8),
        )

    def step(self, state: DotsAndBoxesState, action: jnp.ndarray) -> DotsAndBoxesState:
        pos = 2 * action + 1  # lineIdxToPos (dotsandboxes.h:88)
        board = state.board.at[pos].set(jnp.int8(LINE))
        # a box is newly closed iff unowned with all 4 lines present
        newly = (board == EMPTY_BOX) & (self._adjacent_line_count(board) == 4)
        board = jnp.where(newly, state.turn, board).astype(jnp.int8)
        closed = jnp.any(newly)
        # mover continues on a close (dotsandboxes.cpp:178-183)
        new_turn = jnp.where(closed, state.turn, jnp.int8(3) - state.turn).astype(jnp.int8)
        continue_player = jnp.where(closed, state.turn, jnp.int8(0)).astype(jnp.int8)
        return DotsAndBoxesState(
            board=board,
            turn=new_turn,
            num_moves=state.num_moves + 1,
            board_history=jnp.concatenate([board[None], state.board_history[:-1]], axis=0),
            continue_history=jnp.concatenate(
                [continue_player[None], state.continue_history[:-1]], axis=0
            ),
        )

    # -- observation ----------------------------------------------------------

    def legal_mask(self, state: DotsAndBoxesState) -> jnp.ndarray:
        # line cells are exactly the odd flat positions (dotsandboxes.h:88)
        return state.board[1::2] == NO_LINE

    def is_terminal(self, state: DotsAndBoxesState) -> jnp.ndarray:
        return ~jnp.any(state.board == EMPTY_BOX)

    def eval_score(self, state: DotsAndBoxesState) -> jnp.ndarray:
        p1 = jnp.sum(state.board == P1_BOX)
        p2 = jnp.sum(state.board == P2_BOX)
        return jnp.where(p1 > p2, 1.0, jnp.where(p2 > p1, -1.0, 0.0)).astype(jnp.float32)

    def turn(self, state: DotsAndBoxesState) -> jnp.ndarray:
        return state.turn

    def features(self, state: DotsAndBoxesState) -> jnp.ndarray:
        """90 planes NHWC (reference layout, dotsandboxes.cpp:247-325):
        8 history steps x [own boxes, opp boxes, empty boxes, no-line, line,
        1..4 lines around box, own-continue, opp-continue] + 2 turn planes.
        History slots beyond the game start are -1-padded -> all-zero planes,
        matching the reference's untouched channels."""
        own = state.turn
        opp = jnp.int8(3) - state.turn
        box = self._box_mask
        planes = []
        for h in range(_HISTORY):
            b = state.board_history[h]
            cnt = self._adjacent_line_count(b)
            cp = state.continue_history[h]
            planes.extend(
                [
                    b == own,
                    b == opp,
                    b == EMPTY_BOX,
                    b == NO_LINE,
                    b == LINE,
                    box & (cnt == 1),
                    box & (cnt == 2),
                    box & (cnt == 3),
                    box & (cnt == 4),
                    jnp.full_like(box, cp == own),
                    jnp.full_like(box, cp == opp),
                ]
            )
        planes.append(jnp.full_like(box, state.turn == 1))
        planes.append(jnp.full_like(box, state.turn == 2))
        feats = jnp.stack(planes, axis=-1).astype(jnp.float32)
        return feats.reshape(self.full, self.full, 90)

    # -- symmetry: none (dotsandboxes.h:69-70) ---------------------------------

    def rotate_features(self, feats, rotation):
        return feats

    def rotate_policy_back(self, policy, rotation):
        return policy

    def rotate_features_batch(self, feats, rotations):
        return feats

    def rotate_policy_back_batch(self, policy, rotations):
        return policy

    def num_rotations(self) -> int:
        return 1

    # -- console ---------------------------------------------------------------

    def render(self, state) -> str:
        """Text board (reference toStringDebug, dotsandboxes.cpp:377-397)."""
        b = np.asarray(state.board).reshape(self.full, self.full)
        sym = {EMPTY_BOX: " ", P1_BOX: "X", P2_BOX: "O", NO_LINE: " ", DOT: "*"}
        rows = []
        for y in range(self.full - 1, -1, -1):
            cells = []
            for x in range(self.full):
                v = int(b[y, x])
                cells.append(("-" if y % 2 == 0 else "|") if v == LINE else sym.get(v, "?"))
            rows.append(" ".join(cells))
        return "\n".join(rows) + "\n"

    def action_to_string(self, action_id: int) -> str:
        """Line coordinate "A1A2" (reference getCoordString,
        dotsandboxes.cpp:68-92)."""
        n = self.n
        dots = n + 1
        x2 = action_id % (2 * n + 1)
        y2 = action_id // (2 * n + 1)
        shift = y2 * dots

        def dot_str(p):
            x, y = p % dots, p // dots
            return chr(x + ord("A") + (1 if x >= 8 else 0)) + str(y + 1)

        if x2 < n:  # horizontal
            return dot_str(x2 + shift) + dot_str(x2 + 1 + shift)
        return dot_str(x2 - n + shift) + dot_str(x2 + 1 + shift)

    def string_to_action(self, coord: str) -> int:
        """Parse "A1A2"-style line coords (reference coordToActionID,
        dotsandboxes.cpp:11-66)."""
        s = coord.strip().upper()
        n = self.n
        dots = n + 1

        def parse(buf):
            if not buf or not buf[0].isalpha():
                return -1
            x = ord(buf[0]) - ord("A") - (1 if buf[0] > "I" else 0)
            try:
                y = int(buf[1:]) - 1
            except ValueError:
                return -1
            if x >= dots or y >= dots or x < 0 or y < 0:
                return -1
            return x + dots * y

        if len(s) == 4:
            a, b = s[:2], s[2:]
        elif len(s) == 5:
            mid = 3 if s[2].isdigit() else 2
            a, b = s[:mid], s[mid:]
        elif len(s) == 6:
            a, b = s[:3], s[3:]
        else:
            return -1
        fp, dp = parse(a), parse(b)
        if fp == -1 or dp == -1:
            return -1
        if fp > dp:
            fp, dp = dp, fp
        diff = dp - fp
        if diff not in (1, dots):
            return -1
        level = fp // dots
        fp -= level * dots
        dp -= level * dots
        return (fp if diff == 1 else dp - 1) + level * (2 * dots - 1)
