"""Lines of Action — sliding captures; first player to connect all their
pieces (8-connectivity) wins (reference
``minizero/environment/linesofaction/linesofaction.{h,cpp}``).

Rules preserved (file:line):
  * move table = every (from, dest) ray pair in 8 directions
    (``linesofaction.cpp:17-64``)
  * a move slides exactly as many squares as there are pieces (both colours)
    on the full line through the from-square (``linesofaction.cpp:184``),
    may not cross an opponent piece (``linesofaction.cpp:186-192``), may not
    land on an own piece (``linesofaction.cpp:194``), and may not recreate a
    previous (position, turn) — the cycle rule (``linesofaction.cpp:195,
    456-470``), tracked here with the additive dual-uint32 Zobrist scheme
    shared with the Go env
  * terminal/eval: a player whose pieces form one 8-connected group wins;
    both connected (after a capture) = draw (``linesofaction.cpp:419-434``)
  * features: 22 planes = 8x2 history + 4 whole-line piece-count planes
    (/8, masked to occupied squares) + 2 turn planes
    (``linesofaction.cpp:227-276``)

TPU design: line counts are one [4, NN, NN] static membership matmul; path
blocking is a static [A, NN] matmul; the legality of all ~1.4k moves comes
out as a single vector with no per-move loop.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec

_HISTORY = 8
_N = 8  # reference kLinesOfActionBoardSize = 8
# direction order matches reference initialize() (linesofaction.cpp:31)
_DIRS = ((1, 0), (0, 1), (-1, 0), (0, -1), (1, 1), (-1, 1), (-1, -1), (1, -1))
# feature line planes use direction indices 0, 1, 4, 5 (linesofaction.cpp:257-266)
_LINE_DIRS = ((1, 0), (0, 1), (1, 1), (1, -1))


def _move_table(n: int):
    """(from, dest, dir4, dist) in the reference's move-id order."""
    moves = []
    for y in range(n):
        for x in range(n):
            for dx, dy in _DIRS:
                xx, yy = x + dx, y + dy
                while 0 <= xx < n and 0 <= yy < n:
                    moves.append((x + n * y, xx + n * yy, (dx, dy)))
                    xx += dx
                    yy += dy
    frm = np.array([m[0] for m in moves], np.int32)
    dst = np.array([m[1] for m in moves], np.int32)
    dir4 = np.zeros(len(moves), np.int32)
    dist = np.zeros(len(moves), np.int32)
    for i, (f, d, (dx, dy)) in enumerate(moves):
        fx, fy = f % n, f // n
        tx, ty = d % n, d // n
        dist[i] = max(abs(tx - fx), abs(ty - fy))
        for k, (lx, ly) in enumerate(_LINE_DIRS):
            if (dx, dy) in ((lx, ly), (-lx, -ly)):
                dir4[i] = k
    return frm, dst, dir4, dist


@flax.struct.dataclass
class LinesOfActionState:
    board: jnp.ndarray  # i8[NN]
    turn: jnp.ndarray  # i8
    num_moves: jnp.ndarray  # i32
    hash_a: jnp.ndarray  # i32 additive Zobrist (mod 2^32)
    hash_b: jnp.ndarray  # i32
    history_a: jnp.ndarray  # i32[MAX+1] past (position, turn) hashes
    history_b: jnp.ndarray  # i32[MAX+1]
    board_history: jnp.ndarray  # i8[8, NN]


class LinesOfActionEnv(Env):
    def __init__(self, board_size: int = _N):
        assert board_size == _N, "reference fixes Lines of Action at 8x8"
        n = board_size
        self.n, self.nn = n, n * n
        frm, dst, dir4, dist = _move_table(n)
        self._from = jnp.asarray(frm)
        self._dest = jnp.asarray(dst)
        self._dir4 = jnp.asarray(dir4)
        self._dist = jnp.asarray(dist)
        self.max_moves = 4 * self.nn  # cycle rule keeps games short; hard cap
        self.spec = EnvSpec(
            name="linesofaction",
            num_players=2,
            board_size=n,
            action_size=len(frm),
            num_input_channels=22,
            input_height=n,
            input_width=n,
            hidden_height=n,
            hidden_width=n,
            max_game_length=self.max_moves,
        )
        # line membership [4, NN, NN]: line[k, p, q] = q on the full line
        # through p along _LINE_DIRS[k]
        line = np.zeros((4, self.nn, self.nn), np.float32)
        for k, (dx, dy) in enumerate(_LINE_DIRS):
            for p in range(self.nn):
                x, y = p % n, p // n
                for s in (1, -1):
                    xx, yy = x, y
                    while 0 <= xx < n and 0 <= yy < n:
                        line[k, p, xx + n * yy] = 1.0
                        xx += s * dx
                        yy += s * dy
        # keep the flattened matmul form: a CONSTANT operand in a batched
        # einsum triggers pathological XLA CPU constant handling (minutes of
        # compile); a plain [4*NN, NN] matmul is instant and equally
        # MXU-friendly
        self._line2 = jnp.asarray(line.reshape(4 * self.nn, self.nn))
        # strict path membership [A, NN] (cells between from and dest)
        path = np.zeros((len(frm), self.nn), np.float32)
        for a, (f, d) in enumerate(zip(frm, dst)):
            fx, fy = f % n, f // n
            tx, ty = d % n, d // n
            steps = max(abs(tx - fx), abs(ty - fy))
            sx = (tx - fx) // steps
            sy = (ty - fy) // steps
            for i in range(1, steps):
                path[a, (fx + i * sx) + n * (fy + i * sy)] = 1.0
        self._path = jnp.asarray(path)
        # 8-neighbour table for connectivity
        nbr = np.tile(np.arange(self.nn)[:, None], (1, 8))
        valid = np.zeros((self.nn, 8), bool)
        for p in range(self.nn):
            x, y = p % n, p // n
            for j, (dx, dy) in enumerate(_DIRS):
                xx, yy = x + dx, y + dy
                if 0 <= xx < n and 0 <= yy < n:
                    nbr[p, j] = xx + n * yy
                    valid[p, j] = True
        self._nbr8 = jnp.asarray(nbr)
        self._nbr8_valid = jnp.asarray(valid)
        # additive dual Zobrist keys (stone colour per square + side to move)
        rs = np.random.RandomState(20260818)
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
        board[1:n - 1] = 1  # bottom row (linesofaction.cpp:78-81)
        board[(n - 1) * n + 1:(n - 1) * n + n - 1] = 1  # top row
        for i in range(1, n - 1):
            board[i * n] = 2
            board[i * n + n - 1] = 2
        return jnp.asarray(board)

    def _board_hash(self, board: jnp.ndarray, turn: jnp.ndarray):
        occ = board > 0
        colour = jnp.clip(board.astype(jnp.int32) - 1, 0, 1)
        pos = jnp.arange(self.nn)
        ha = jnp.sum(jnp.where(occ, self._key_a[pos, colour], 0), dtype=jnp.int32)
        hb = jnp.sum(jnp.where(occ, self._key_b[pos, colour], 0), dtype=jnp.int32)
        t = (turn == 2).astype(jnp.int32)
        return ha + t * self._turn_key_a, hb + t * self._turn_key_b

    def _connected(self, board: jnp.ndarray, p) -> jnp.ndarray:
        """True iff all pieces of p form one 8-connected group (reference
        searchConnection; vacuously true with no pieces, matching BFS from
        nothing... the reference returns reachable==count==0 -> true)."""
        nn = self.nn
        active = board == jnp.asarray(p, board.dtype)
        idx = jnp.arange(nn, dtype=jnp.int32)
        labels = jnp.where(active, idx, nn)
        connected = active[self._nbr8] & self._nbr8_valid & active[:, None]

        def body(_, labels):
            nbr_lab = jnp.where(connected, labels[self._nbr8], nn)
            l = jnp.minimum(labels, jnp.min(nbr_lab, axis=1))
            l = jnp.minimum(l, l[jnp.clip(l, 0, nn - 1)])
            return jnp.where(active, l, nn)

        labels = jax.lax.fori_loop(0, 10, body, labels)  # log2(64)+jump margin
        lab = jnp.where(active, labels, -1)
        mn = jnp.min(jnp.where(active, labels, nn))
        return jnp.all((lab == -1) | (lab == mn))

    # --------------------------------------------------------------- protocol
    def init(self) -> LinesOfActionState:
        board = self._initial_board()
        ha, hb = self._board_hash(board, jnp.int8(1))
        history_a = jnp.zeros((self.max_moves + 1,), jnp.int32).at[0].set(ha)
        history_b = jnp.zeros((self.max_moves + 1,), jnp.int32).at[0].set(hb)
        return LinesOfActionState(
            board=board,
            turn=jnp.int8(1),
            num_moves=jnp.int32(0),
            hash_a=ha,
            hash_b=hb,
            history_a=history_a,
            history_b=history_b,
            board_history=jnp.zeros((_HISTORY, self.nn), jnp.int8).at[0].set(board),
        )

    def _move_hashes(self, state: LinesOfActionState):
        """Candidate (hash_a, hash_b) after every move id (for the cycle
        rule, linesofaction.cpp:456-470)."""
        board = state.board
        turn = state.turn
        t = jnp.clip(turn.astype(jnp.int32) - 1, 0, 1)
        o = 1 - t
        cap = board[self._dest] == (3 - turn).astype(board.dtype)
        da = (
            -self._key_a[self._from, t]
            + self._key_a[self._dest, t]
            - jnp.where(cap, self._key_a[self._dest, o], 0)
        )
        db = (
            -self._key_b[self._from, t]
            + self._key_b[self._dest, t]
            - jnp.where(cap, self._key_b[self._dest, o], 0)
        )
        # turn key: from t to 1-t
        ta = jnp.where(t == 0, self._turn_key_a, -self._turn_key_a)
        tb = jnp.where(t == 0, self._turn_key_b, -self._turn_key_b)
        return state.hash_a + da + ta, state.hash_b + db + tb

    def legal_mask(self, state: LinesOfActionState) -> jnp.ndarray:
        board = state.board
        turn = state.turn
        opp = (3 - turn).astype(board.dtype)
        occ = (board > 0).astype(jnp.float32)
        # piece counts on each full line: [4, NN] = line[k] @ occ
        counts = jnp.dot(self._line2, occ).reshape(4, self.nn)
        own_from = board[self._from] == turn
        right_dist = counts[self._dir4, self._from] == self._dist.astype(jnp.float32)
        no_cross = jnp.dot(self._path, (board == opp).astype(jnp.float32)) == 0
        not_own_dest = board[self._dest] != turn
        ha, hb = self._move_hashes(state)
        valid_h = jnp.arange(state.history_a.shape[0]) <= state.num_moves
        repeat = jnp.any(
            (state.history_a[None, :] == ha[:, None])
            & (state.history_b[None, :] == hb[:, None])
            & valid_h[None, :],
            axis=1,
        )
        return own_from & right_dist & no_cross & not_own_dest & ~repeat

    def step(self, state: LinesOfActionState, action: jnp.ndarray) -> LinesOfActionState:
        board = state.board
        turn = state.turn
        frm = self._from[action]
        dst = self._dest[action]
        board = board.at[frm].set(0).at[dst].set(turn)
        new_turn = (jnp.int8(3) - turn)
        ha, hb = self._board_hash(board, new_turn)
        num_moves = state.num_moves + 1
        hist_idx = jnp.clip(num_moves, 0, self.max_moves)
        return LinesOfActionState(
            board=board,
            turn=new_turn,
            num_moves=num_moves,
            hash_a=ha,
            hash_b=hb,
            history_a=state.history_a.at[hist_idx].set(ha),
            history_b=state.history_b.at[hist_idx].set(hb),
            board_history=jnp.concatenate([board[None], state.board_history[:-1]], axis=0),
        )

    def is_terminal(self, state: LinesOfActionState) -> jnp.ndarray:
        return (
            self._connected(state.board, 1)
            | self._connected(state.board, 2)
            | (state.num_moves >= self.max_moves)
        )

    def eval_score(self, state: LinesOfActionState) -> jnp.ndarray:
        c1 = self._connected(state.board, 1)
        c2 = self._connected(state.board, 2)
        return jnp.where(c1 & c2, 0.0, jnp.where(c1, 1.0, jnp.where(c2, -1.0, 0.0))).astype(jnp.float32)

    def turn(self, state: LinesOfActionState) -> jnp.ndarray:
        return state.turn

    def features(self, state: LinesOfActionState) -> jnp.ndarray:
        """22 planes NHWC (linesofaction.cpp:227-276)."""
        n, nn = self.n, self.nn
        turn = state.turn
        opp = (3 - turn).astype(state.board.dtype)
        hist = state.board_history
        own_h = (hist == turn).astype(jnp.float32)
        opp_h = (hist == opp).astype(jnp.float32)
        planes = jnp.stack([own_h, opp_h], axis=1).reshape(2 * _HISTORY, nn)
        occ = (state.board > 0).astype(jnp.float32)
        counts = jnp.dot(self._line2, occ).reshape(4, self.nn) / 8.0  # [4, NN]
        counts = counts * occ[None, :]
        p1 = jnp.full((1, nn), (turn == 1).astype(jnp.float32))
        p2 = jnp.full((1, nn), (turn == 2).astype(jnp.float32))
        feats = jnp.concatenate([planes, counts, p1, p2], axis=0)
        return jnp.transpose(feats.reshape(22, n, n), (1, 2, 0))

    def num_rotations(self) -> int:
        return 1  # move-indexed policy; reference disables rotation
