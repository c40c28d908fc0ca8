"""Surakarta — 8-neighbour steps plus loop ("circuit") captures along the
red/green arcs; most pieces when the game ends wins (reference
``minizero/environment/surakarta/surakarta.{h,cpp}``).

Policy = N^4 (from * NN + dest) (``surakarta.h:70``). Rules preserved:
  * normal move: one step in 8 directions onto an EMPTY square
    (``surakarta.cpp:358-363``) — normal moves never capture
  * capture: travel along a circuit trajectory (red lines = rows/cols 2 and
    n-3, green = 1 and n-2, ``surakarta.cpp:143-149``), passing at least one
    arc, with every intermediate square empty (own start square may be
    passed through), landing on an opponent piece
    (``surakarta.cpp runCircuit``)
  * repetition rule: a move may not recreate a previous (position, turn)
    (``surakarta.cpp isCircularAction``) — additive dual-Zobrist here
  * terminal: ``env_surakarta_no_capture_plies`` plies without a capture
    (fifty-move rule), a side with no pieces, or no legal moves; winner =
    most pieces (``surakarta.cpp isTerminal/eval``)
  * features: 18 planes = 8x2 history + 2 turn planes

TPU design: the reference walks the circuit per candidate move at runtime;
here every possible walk (loop x entry point x direction) is unrolled at
construction into static [W, L] visit-order tables, so the whole capture mask
is a handful of gathers + one scatter-max — no data-dependent loops.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.struct
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec

_HISTORY = 8
_MARKER = (-1, -1)


def _trajectory(n: int, line: Tuple[int, int]):
    """The reference's circuit trajectory with arc markers
    (surakarta.cpp createSingleTrajectory). Points are (x, y, dir) with dir
    'h'/'v'; markers are (-1, -1, None)."""
    lo, hi = line
    traj = []
    traj += [(i, lo, "h") for i in range(n)]
    traj.append(_MARKER + (None,))
    traj += [(hi, i, "v") for i in range(n)]
    traj.append(_MARKER + (None,))
    traj += [(i, hi, "h") for i in range(n - 1, -1, -1)]
    traj.append(_MARKER + (None,))
    traj += [(lo, i, "v") for i in range(n - 1, -1, -1)]
    traj.append(_MARKER + (None,))
    return traj


def _find_start(traj, x, y, d, same_dir):
    for idx, p in enumerate(traj):
        if (p[0], p[1]) != (x, y):
            continue
        if same_dir and p[2] != d:
            continue
        return idx
    return -1


def _walks_for_loop(n: int, line: Tuple[int, int]):
    """Static walk tables replicating runCircuit's enumeration: for every
    from-square and each of its four directional loop entries, the ordered
    board positions visited (markers counted as arc crossings)."""
    traj = _trajectory(n, line)
    L = len(traj)
    lo, hi = line
    cross = {(lo, lo), (lo, hi), (hi, lo), (hi, hi)}
    walks = []  # (from_pos, [visited positions], [arc flag at each])
    for y in range(n):
        for x in range(n):
            if x not in line and y not in line:
                continue
            # findNeighbors (surakarta.cpp:239-280)
            if (x, y) in cross:
                starts = [
                    _find_start(traj, x, y + 1, "v", True),   # up
                    _find_start(traj, x, y - 1, "v", True),   # down
                    _find_start(traj, x + 1, y, "h", True),   # right
                    _find_start(traj, x - 1, y, "h", True),   # left
                ]
            else:
                pt = _find_start(traj, x, y, None, False)
                starts = [-1, -1, -1, -1]
                if x in line:
                    starts[0] = starts[1] = pt
                if y in line:
                    starts[2] = starts[3] = pt
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
                visited, arcs = [], []
                arc = False
                for _ in range(L - 1):
                    idx %= L
                    p = traj[idx]
                    if (p[0], p[1]) == _MARKER:
                        arc = True
                    else:
                        visited.append(p[1] * n + p[0])
                        arcs.append(arc)
                    idx += stride
                walks.append((y * n + x, visited, arcs))
    return walks


@flax.struct.dataclass
class SurakartaState:
    board: jnp.ndarray  # i8[NN]
    turn: jnp.ndarray  # i8
    num_moves: jnp.ndarray  # i32
    no_capture_plies: jnp.ndarray  # i32
    hash_a: jnp.ndarray  # i32
    hash_b: jnp.ndarray  # i32
    history_a: jnp.ndarray  # i32[MAX+1]
    history_b: jnp.ndarray  # i32[MAX+1]
    board_history: jnp.ndarray  # i8[8, NN]


class SurakartaEnv(Env):
    def __init__(self, board_size: int = 6, no_capture_plies: int = 50):
        n = board_size
        self.n, self.nn = n, n * n
        self.no_capture_limit = int(no_capture_plies)
        self.max_moves = 4 * self.nn  # fifty-move rule bounds games anyway
        self.spec = EnvSpec(
            name="surakarta",
            num_players=2,
            board_size=n,
            action_size=self.nn * self.nn,
            num_input_channels=18,
            input_height=n,
            input_width=n,
            hidden_height=n,
            hidden_width=n,
            max_game_length=self.max_moves,
        )
        red = (2, n - 3)
        green = (1, n - 2)
        walks: List = _walks_for_loop(n, red) + _walks_for_loop(n, green)
        L = max(len(v) for _, v, _ in walks)
        W = len(walks)
        wf = np.zeros(W, np.int32)
        wv = np.full((W, L), -1, np.int32)
        wa = np.zeros((W, L), bool)
        for w, (f, visited, arcs) in enumerate(walks):
            wf[w] = f
            wv[w, : len(visited)] = visited
            wa[w, : len(arcs)] = arcs
        self._walk_from = jnp.asarray(wf)
        self._walk_pos = jnp.asarray(wv)
        self._walk_arc = jnp.asarray(wa)
        # static neighbour-move mask over N^4 action ids
        frm = np.arange(self.nn * self.nn) // self.nn
        dst = np.arange(self.nn * self.nn) % self.nn
        fx, fy = frm % n, frm // n
        dx, dy = dst % n, dst // n
        self._is_nbr = jnp.asarray(
            (np.abs(fx - dx) <= 1) & (np.abs(fy - dy) <= 1) & (frm != dst)
        )
        self._a_from = jnp.asarray(frm.astype(np.int32))
        self._a_dest = jnp.asarray(dst.astype(np.int32))
        # additive dual Zobrist (square x colour + side to move)
        rs = np.random.RandomState(20260819)
        ka = rs.randint(0, 2**32, size=(self.nn, 2), dtype=np.uint64).astype(np.uint32)
        kb = rs.randint(0, 2**32, size=(self.nn, 2), dtype=np.uint64).astype(np.uint32)
        self._key_a = jnp.asarray(ka.view(np.int32))
        self._key_b = jnp.asarray(kb.view(np.int32))
        tk = rs.randint(0, 2**32, size=(2,), dtype=np.uint64).astype(np.uint32).view(np.int32)
        self._turn_key_a = jnp.int32(tk[0])
        self._turn_key_b = jnp.int32(tk[1])

    # ------------------------------------------------------------- primitives
    def _initial_board(self) -> jnp.ndarray:
        n = self.n
        board = np.zeros(self.nn, np.int8)
        board[: 2 * n] = 1
        board[(n - 2) * n:] = 2
        return jnp.asarray(board)

    def _board_hash(self, board: jnp.ndarray, turn: jnp.ndarray):
        occ = board > 0
        colour = jnp.clip(board.astype(jnp.int32) - 1, 0, 1)
        pos = jnp.arange(self.nn)
        ha = jnp.sum(jnp.where(occ, self._key_a[pos, colour], 0), dtype=jnp.int32)
        hb = jnp.sum(jnp.where(occ, self._key_b[pos, colour], 0), dtype=jnp.int32)
        t = (turn == 2).astype(jnp.int32)
        return ha + t * self._turn_key_a, hb + t * self._turn_key_b

    def _capture_mask(self, board: jnp.ndarray, turn: jnp.ndarray) -> jnp.ndarray:
        """bool[N^4] loop-capture legality (reference runCircuit)."""
        opp = (3 - turn).astype(board.dtype)
        occupied = board > 0
        V = self._walk_pos  # [W, L]
        S = self._walk_from  # [W]
        blocked = occupied[jnp.maximum(V, 0)] & (V >= 0) & (V != S[:, None])
        has_block = jnp.any(blocked, axis=1)
        j = jnp.argmax(blocked, axis=1)  # first blocking entry
        target = V[jnp.arange(V.shape[0]), j]
        arc_ok = self._walk_arc[jnp.arange(V.shape[0]), j]
        valid = (
            has_block
            & arc_ok
            & (board[jnp.maximum(target, 0)] == opp)
            & (board[S] == turn)
        )
        ids = S * self.nn + jnp.maximum(target, 0)
        mask = jnp.zeros((self.nn * self.nn,), bool)
        return mask.at[ids].max(valid)

    def _move_hashes(self, state: SurakartaState):
        """Candidate hashes after every action id (isCircularAction)."""
        board = state.board
        t = jnp.clip(state.turn.astype(jnp.int32) - 1, 0, 1)
        o = 1 - t
        cap = board[self._a_dest] == (3 - state.turn).astype(board.dtype)
        da = (
            -self._key_a[self._a_from, t]
            + self._key_a[self._a_dest, t]
            - jnp.where(cap, self._key_a[self._a_dest, o], 0)
        )
        db = (
            -self._key_b[self._a_from, t]
            + self._key_b[self._a_dest, t]
            - jnp.where(cap, self._key_b[self._a_dest, o], 0)
        )
        ta = jnp.where(t == 0, self._turn_key_a, -self._turn_key_a)
        tb = jnp.where(t == 0, self._turn_key_b, -self._turn_key_b)
        return state.hash_a + da + ta, state.hash_b + db + tb

    # --------------------------------------------------------------- protocol
    def init(self) -> SurakartaState:
        board = self._initial_board()
        ha, hb = self._board_hash(board, jnp.int8(1))
        return SurakartaState(
            board=board,
            turn=jnp.int8(1),
            num_moves=jnp.int32(0),
            no_capture_plies=jnp.int32(0),
            hash_a=ha,
            hash_b=hb,
            history_a=jnp.zeros((self.max_moves + 1,), jnp.int32).at[0].set(ha),
            history_b=jnp.zeros((self.max_moves + 1,), jnp.int32).at[0].set(hb),
            board_history=jnp.zeros((_HISTORY, self.nn), jnp.int8).at[0].set(board),
        )

    def legal_mask(self, state: SurakartaState) -> jnp.ndarray:
        board = state.board
        turn = state.turn
        normal = (
            self._is_nbr
            & (board[self._a_from] == turn)
            & (board[self._a_dest] == 0)
        )
        capture = self._capture_mask(board, turn)
        ha, hb = self._move_hashes(state)
        valid_h = jnp.arange(state.history_a.shape[0]) <= state.num_moves
        repeat = jnp.any(
            (state.history_a[None, :] == ha[:, None])
            & (state.history_b[None, :] == hb[:, None])
            & valid_h[None, :],
            axis=1,
        )
        return (normal | capture) & ~repeat

    def step(self, state: SurakartaState, action: jnp.ndarray) -> SurakartaState:
        board = state.board
        turn = state.turn
        frm = self._a_from[action]
        dst = self._a_dest[action]
        captured = board[dst] == (3 - turn).astype(board.dtype)
        board = board.at[frm].set(0).at[dst].set(turn)
        new_turn = (jnp.int8(3) - turn)
        ha, hb = self._board_hash(board, new_turn)
        num_moves = state.num_moves + 1
        idx = jnp.clip(num_moves, 0, self.max_moves)
        return SurakartaState(
            board=board,
            turn=new_turn,
            num_moves=num_moves,
            no_capture_plies=jnp.where(captured, 0, state.no_capture_plies + 1),
            hash_a=ha,
            hash_b=hb,
            history_a=state.history_a.at[idx].set(ha),
            history_b=state.history_b.at[idx].set(hb),
            board_history=jnp.concatenate([board[None], state.board_history[:-1]], axis=0),
        )

    def is_terminal(self, state: SurakartaState) -> jnp.ndarray:
        wiped = ~jnp.any(state.board == 1) | ~jnp.any(state.board == 2)
        fifty = state.no_capture_plies >= self.no_capture_limit
        stuck = ~jnp.any(self.legal_mask(state))
        return wiped | fifty | stuck | (state.num_moves >= self.max_moves)

    def eval_score(self, state: SurakartaState) -> jnp.ndarray:
        """Most pieces wins (surakarta.cpp eval)."""
        c1 = jnp.sum((state.board == 1).astype(jnp.int32))
        c2 = jnp.sum((state.board == 2).astype(jnp.int32))
        return jnp.where(c1 > c2, 1.0, jnp.where(c2 > c1, -1.0, 0.0)).astype(jnp.float32)

    def turn(self, state: SurakartaState) -> jnp.ndarray:
        return state.turn

    def features(self, state: SurakartaState) -> jnp.ndarray:
        """18 planes NHWC (surakarta.cpp getFeatures)."""
        n, nn = self.n, self.nn
        turn = state.turn
        opp = (3 - turn).astype(state.board.dtype)
        hist = state.board_history
        own_h = (hist == turn).astype(jnp.float32)
        opp_h = (hist == opp).astype(jnp.float32)
        planes = jnp.stack([own_h, opp_h], axis=1).reshape(2 * _HISTORY, nn)
        p1 = jnp.full((1, nn), (turn == 1).astype(jnp.float32))
        p2 = jnp.full((1, nn), (turn == 2).astype(jnp.float32))
        feats = jnp.concatenate([planes, p1, p2], axis=0)
        return jnp.transpose(feats.reshape(18, n, n), (1, 2, 0))

    def num_rotations(self) -> int:
        return 1
