"""Go — fixed-shape vectorised JAX implementation.

TPU-native re-design of the reference's Go env
(``minizero/environment/go/go.{h,cpp}``): the reference maintains incremental
pointer-linked blocks/areas with per-move surgery (``go.cpp:132-190``); here
every query is recomputed from the flat board with data-parallel primitives —
connected-component labels by iterated min-propagation, block liberties via
boolean matrix products (which XLA maps onto the MXU), and positional /
situational superko via a dual-uint32 Zobrist hash history compared in one
vectorised sweep. The full legality mask for all board points is produced in
one shot (the reference tests each action separately, ``go.cpp:208-243``) and
is cached in the state at ``step`` time, so the hot search loop reads it for
free.

Semantics preserved (file:line):
  * legality: empty point with an empty neighbour, a >1-liberty own neighbour
    block, or a capturable (1-liberty) opponent neighbour block, and no
    superko repetition of the resulting hash (``go.cpp:208-243``)
  * terminal: two consecutive passes or more than 2*N*N moves
    (``go.cpp:246-257``)
  * scoring: Tromp-Taylor territory vs komi; win -> +/-1 (``go.cpp:259-277``,
    ``go.cpp:703-723``), including the reference's convention that a
    no-boundary empty region counts for Black
  * features: 18 planes = 8 x (own, opponent) history + 2 turn planes
    (``go.cpp:280-307``)
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec

_HISTORY_PLANES = 8


def _xor_reduce(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Bitwise-XOR reduction along ``axis`` (Zobrist accumulation)."""
    return jax.lax.reduce(x, np.uint32(0), jax.lax.bitwise_xor, (axis,))


@flax.struct.dataclass
class GoState:
    board: jnp.ndarray  # i8[NN] 0 empty / 1 black / 2 white
    turn: jnp.ndarray  # i8
    num_moves: jnp.ndarray  # i32
    consecutive_pass: jnp.ndarray  # i8
    hash_a: jnp.ndarray  # u32
    hash_b: jnp.ndarray  # u32
    history_a: jnp.ndarray  # u32[MAXH] post-move hashes (superko table)
    history_b: jnp.ndarray  # u32[MAXH]
    legal: jnp.ndarray  # bool[NN + 1] cached mask for player `turn`
    board_history: jnp.ndarray  # i8[8, NN] ring: [0] = current board


class GoEnv(Env):
    def __init__(self, board_size: int = 9, komi: float = 7.5, ko_rule: str = "positional"):
        nn = board_size * board_size
        self.n = board_size
        self.nn = nn
        self.komi = float(komi)
        self.situational = ko_rule == "situational"
        self.max_moves = 2 * nn + 1
        self.spec = EnvSpec(
            name=f"go_{board_size}x{board_size}",
            num_players=2,
            board_size=board_size,
            action_size=nn + 1,
            num_input_channels=18,
            input_height=board_size,
            input_width=board_size,
            hidden_height=board_size,
            hidden_width=board_size,
            max_game_length=self.max_moves,
            has_pass=True,
        )
        # static adjacency [NN, NN]
        adj = np.zeros((nn, nn), bool)
        for p in range(nn):
            r, c = divmod(p, board_size)
            for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                rr, cc = r + dr, c + dc
                if 0 <= rr < board_size and 0 <= cc < board_size:
                    adj[p, rr * board_size + cc] = True
        self._adj = jnp.asarray(adj)
        self._adj_f = jnp.asarray(adj, jnp.float32)
        # deterministic dual Zobrist tables (reference go.cpp:17-44 seeds a
        # fixed mt19937)
        rs = np.random.RandomState(20260817)
        self._grid_key_a = jnp.asarray(rs.randint(0, 2**32, size=(nn, 2), dtype=np.uint64).astype(np.uint32))
        self._grid_key_b = jnp.asarray(rs.randint(0, 2**32, size=(nn, 2), dtype=np.uint64).astype(np.uint32))
        turn_keys = rs.randint(0, 2**32, size=(2,), dtype=np.uint64).astype(np.uint32)
        self._turn_key_a = jnp.uint32(turn_keys[0] if self.situational else 0)
        self._turn_key_b = jnp.uint32(turn_keys[1] if self.situational else 0)

    # ------------------------------------------------------------ primitives
    def _labels(self, board: jnp.ndarray) -> jnp.ndarray:
        """i32[NN] connected-component labels (min position index per block;
        NN for empty points). Iterated min-propagation over same-colour
        neighbours — the vectorised replacement for the reference's
        incremental block merging (go.cpp:157-178)."""
        nn = self.nn
        occupied = board > 0
        idx = jnp.arange(nn, dtype=jnp.int32)
        labels0 = jnp.where(occupied, idx, nn)
        same = (board[:, None] == board[None, :]) & self._adj  # [NN, NN]

        def cond(carry):
            labels, changed = carry
            return changed

        def body(carry):
            labels, _ = carry
            nbr_min = jnp.min(jnp.where(same, labels[None, :], nn), axis=1)
            new = jnp.where(occupied, jnp.minimum(labels, nbr_min), nn)
            return (new, jnp.any(new != labels))

        labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True)))
        return labels

    def _block_info(self, board: jnp.ndarray):
        """(labels i32[NN], lib_at i32[NN]): per-position block label and that
        block's liberty count (0 for empty points)."""
        nn = self.nn
        labels = self._labels(board)
        empty = board == 0
        onehot = (labels[None, :] == jnp.arange(nn, dtype=jnp.int32)[:, None]) & (board > 0)[None, :]
        # block b's liberties: empty points adjacent to any member stone
        member_f = onehot.astype(jnp.float32)  # [B(labels), P]
        adjacent = jnp.dot(member_f, self._adj_f, preferred_element_type=jnp.float32) > 0  # [B, P]
        lib_count = jnp.sum((adjacent & empty[None, :]).astype(jnp.int32), axis=1)  # [B]
        lib_at = jnp.where(board > 0, lib_count[jnp.clip(labels, 0, nn - 1)], 0)
        return labels, lib_at

    def _block_hashes(self, board: jnp.ndarray, labels: jnp.ndarray):
        """Per-label XOR of member stones' grid keys (the reference keeps this
        incrementally per block, go_block.h)."""
        nn = self.nn
        colour_idx = jnp.clip(board.astype(jnp.int32) - 1, 0, 1)
        key_a = jnp.where(board > 0, self._grid_key_a[jnp.arange(nn), colour_idx], np.uint32(0))
        key_b = jnp.where(board > 0, self._grid_key_b[jnp.arange(nn), colour_idx], np.uint32(0))
        member = (labels[None, :] == jnp.arange(nn, dtype=jnp.int32)[:, None]) & (board > 0)[None, :]
        block_a = _xor_reduce(jnp.where(member, key_a[None, :], np.uint32(0)), 1)
        block_b = _xor_reduce(jnp.where(member, key_b[None, :], np.uint32(0)), 1)
        return block_a, block_b

    def _legal_mask_for(self, state_board, turn, hash_a, hash_b, history_a, history_b, num_moves):
        """bool[NN + 1] legality for ``turn`` (reference go.cpp:208-243)."""
        nn = self.nn
        board = state_board
        labels, lib_at = self._block_info(board)
        empty = board == 0
        opp = (3 - turn).astype(board.dtype)

        nbr_empty = jnp.dot(self._adj_f, empty.astype(jnp.float32), preferred_element_type=jnp.float32) > 0
        own_safe = (board == turn) & (lib_at > 1)
        has_own_safe = jnp.dot(self._adj_f, own_safe.astype(jnp.float32), preferred_element_type=jnp.float32) > 0
        capturable = (board == opp) & (lib_at == 1)
        has_capture = jnp.dot(self._adj_f, capturable.astype(jnp.float32), preferred_element_type=jnp.float32) > 0
        legal_basic = empty & (nbr_empty | has_own_safe | has_capture)

        # superko: hash after the candidate move
        block_a, block_b = self._block_hashes(board, labels)
        label_onehot = (labels[None, :] == jnp.arange(nn, dtype=jnp.int32)[:, None])  # [B, P]
        cap_member = label_onehot & capturable[None, :]
        # cap_blocks[p, b]: candidate p captures block b
        cap_blocks = (
            jnp.dot(self._adj_f, cap_member.astype(jnp.float32).T, preferred_element_type=jnp.float32) > 0
        )  # [P, B]
        cap_hash_a = _xor_reduce(jnp.where(cap_blocks, block_a[None, :], np.uint32(0)), 1)
        cap_hash_b = _xor_reduce(jnp.where(cap_blocks, block_b[None, :], np.uint32(0)), 1)
        t = jnp.clip(turn.astype(jnp.int32) - 1, 0, 1)
        new_a = hash_a ^ self._turn_key_a ^ self._grid_key_a[jnp.arange(nn), t] ^ cap_hash_a
        new_b = hash_b ^ self._turn_key_b ^ self._grid_key_b[jnp.arange(nn), t] ^ cap_hash_b
        valid = jnp.arange(history_a.shape[0]) < num_moves
        repeat = jnp.any(
            (history_a[None, :] == new_a[:, None]) & (history_b[None, :] == new_b[:, None]) & valid[None, :],
            axis=1,
        )
        board_legal = legal_basic & ~repeat
        return jnp.concatenate([board_legal, jnp.ones((1,), bool)])  # pass always legal

    # -------------------------------------------------------------- protocol
    def init(self) -> GoState:
        nn = self.nn
        return GoState(
            board=jnp.zeros((nn,), jnp.int8),
            turn=jnp.int8(1),
            num_moves=jnp.int32(0),
            consecutive_pass=jnp.int8(0),
            hash_a=jnp.uint32(0),
            hash_b=jnp.uint32(0),
            history_a=jnp.zeros((self.max_moves + 1,), jnp.uint32),
            history_b=jnp.zeros((self.max_moves + 1,), jnp.uint32),
            legal=jnp.concatenate([jnp.ones((nn,), bool), jnp.ones((1,), bool)]),
            board_history=jnp.zeros((_HISTORY_PLANES, nn), jnp.int8),
        )

    def step(self, state: GoState, action: jnp.ndarray) -> GoState:
        """Apply a legal action (reference GoEnv::act, go.cpp:132-190)."""
        nn = self.nn
        is_pass = action >= nn
        pos = jnp.clip(action, 0, nn - 1)
        turn = state.turn
        t = jnp.clip(turn.astype(jnp.int32) - 1, 0, 1)
        opp = (3 - turn).astype(state.board.dtype)

        labels, lib_at = self._block_info(state.board)
        # captured blocks: opponent neighbours of pos with exactly 1 liberty
        capturable = (state.board == opp) & (lib_at == 1)
        nbr_of_pos = self._adj[pos]
        captured_seed = nbr_of_pos & capturable
        # expand to whole blocks via labels
        seed_labels = jnp.where(captured_seed, labels, nn)
        is_captured_block = jnp.zeros((nn + 1,), bool).at[seed_labels].max(captured_seed)
        captured_stone = is_captured_block[jnp.clip(labels, 0, nn)] & (state.board > 0)
        captured_stone = captured_stone & ~is_pass

        new_board = jnp.where(captured_stone, jnp.int8(0), state.board)
        new_board = jnp.where(is_pass, new_board, new_board.at[pos].set(turn))

        # hash update (go.cpp:141-155, 168-175)
        cap_key_a = _xor_reduce(
            jnp.where(captured_stone, self._grid_key_a[jnp.arange(nn), 1 - t], np.uint32(0)), 0
        )
        cap_key_b = _xor_reduce(
            jnp.where(captured_stone, self._grid_key_b[jnp.arange(nn), 1 - t], np.uint32(0)), 0
        )
        stone_a = jnp.where(is_pass, np.uint32(0), self._grid_key_a[pos, t])
        stone_b = jnp.where(is_pass, np.uint32(0), self._grid_key_b[pos, t])
        new_hash_a = state.hash_a ^ self._turn_key_a ^ stone_a ^ jnp.where(is_pass, np.uint32(0), cap_key_a)
        new_hash_b = state.hash_b ^ self._turn_key_b ^ stone_b ^ jnp.where(is_pass, np.uint32(0), cap_key_b)

        hist_idx = jnp.clip(state.num_moves, 0, self.max_moves)
        history_a = state.history_a.at[hist_idx].set(new_hash_a)
        history_b = state.history_b.at[hist_idx].set(new_hash_b)

        new_turn = opp
        num_moves = state.num_moves + 1
        consecutive_pass = jnp.where(is_pass, state.consecutive_pass + 1, 0).astype(jnp.int8)
        board_history = jnp.concatenate([new_board[None], state.board_history[:-1]], axis=0)

        legal = self._legal_mask_for(
            new_board, new_turn, new_hash_a, new_hash_b, history_a, history_b, num_moves
        )
        return GoState(
            board=new_board,
            turn=new_turn,
            num_moves=num_moves,
            consecutive_pass=consecutive_pass,
            hash_a=new_hash_a,
            hash_b=new_hash_b,
            history_a=history_a,
            history_b=history_b,
            legal=legal,
            board_history=board_history,
        )

    def legal_mask(self, state: GoState) -> jnp.ndarray:
        return state.legal

    def is_terminal(self, state: GoState) -> jnp.ndarray:
        return (state.consecutive_pass >= 2) | (state.num_moves > 2 * self.nn)

    def eval_score(self, state: GoState) -> jnp.ndarray:
        """Tromp-Taylor result (reference go.cpp:259-277, 703-723)."""
        nn = self.nn
        board = state.board
        empty = board == 0
        touch_b0 = jnp.dot(self._adj_f, (board == 1).astype(jnp.float32), preferred_element_type=jnp.float32) > 0
        touch_w0 = jnp.dot(self._adj_f, (board == 2).astype(jnp.float32), preferred_element_type=jnp.float32) > 0
        touch_b0 = touch_b0 & empty
        touch_w0 = touch_w0 & empty
        empty_adj = self._adj & empty[:, None] & empty[None, :]
        empty_adj_f = empty_adj.astype(jnp.float32)

        def cond(carry):
            tb, tw, changed = carry
            return changed

        def body(carry):
            tb, tw, _ = carry
            nb = (jnp.dot(empty_adj_f, tb.astype(jnp.float32), preferred_element_type=jnp.float32) > 0) | tb
            nw = (jnp.dot(empty_adj_f, tw.astype(jnp.float32), preferred_element_type=jnp.float32) > 0) | tw
            nb = nb & empty
            nw = nw & empty
            return (nb, nw, jnp.any((nb != tb) | (nw != tw)))

        touch_b, touch_w, _ = jax.lax.while_loop(cond, body, (touch_b0, touch_w0, jnp.bool_(True)))
        # region with no white boundary -> black (matches reference order of
        # checks, go.cpp:713-717, including the empty-board quirk)
        black_area = empty & ~touch_w
        white_area = empty & touch_w & ~touch_b
        black = jnp.sum((board == 1).astype(jnp.float32)) + jnp.sum(black_area.astype(jnp.float32))
        white = jnp.sum((board == 2).astype(jnp.float32)) + jnp.sum(white_area.astype(jnp.float32)) + self.komi
        return jnp.where(black > white, 1.0, jnp.where(black < white, -1.0, 0.0)).astype(jnp.float32)

    def turn(self, state: GoState) -> jnp.ndarray:
        return state.turn

    def features(self, state: GoState) -> jnp.ndarray:
        """18 planes NHWC (reference go.cpp:280-307)."""
        n = self.n
        turn = state.turn
        opp = (3 - turn).astype(state.board.dtype)
        hist = state.board_history  # [8, NN]
        own = (hist == turn).astype(jnp.float32)  # [8, NN]
        other = (hist == opp).astype(jnp.float32)
        planes = jnp.stack([own, other], axis=1).reshape(2 * _HISTORY_PLANES, self.nn)
        p1 = jnp.full((1, self.nn), (turn == 1).astype(jnp.float32))
        p2 = jnp.full((1, self.nn), (turn == 2).astype(jnp.float32))
        feats = jnp.concatenate([planes, p1, p2], axis=0)  # [18, NN] (CHW)
        return jnp.transpose(feats.reshape(18, n, n), (1, 2, 0))
