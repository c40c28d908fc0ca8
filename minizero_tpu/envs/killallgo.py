"""Kill-All Go — 7x7 Go variant where Black gets two opening moves (White's
first turn is a forced pass) and White wins unless Black kills every White
stone; terminal as soon as Benson's unconditional-life analysis settles the
game.

TPU-native counterpart of the reference
(``minizero/environment/killallgo/killallgo.{h,cpp}``): legality staging
(``killallgo.cpp:27-32``), Benson-based terminal/eval
(``killallgo.cpp:34-49``), with Benson's algorithm itself re-expressed as
fixed-shape one-hot matmuls + a bounded fixpoint loop instead of the
reference's bitboard worklists (``go.cpp:614-678``).

The optional 7x7 seki table (``killallgo_seki_7x7.cpp``,
``env_killallgo_use_seki``, default false): ``use_seki=True`` loads (or
generates, cached next to ``native/seki_gen.cpp``) the proven-seki pattern
table and adds a vectorized table lookup over every white-enclosed area to
the terminal test — a seki means Black can no longer kill everything, so the
game is adjudicated for White (``killallgo.cpp:36``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.go import GoEnv, GoState


class KillAllGoEnv(GoEnv):
    def __init__(self, board_size: int = 7, use_seki: bool = False,
                 seki_min_size: int = 5, seki_max_size: int = 8,
                 ko_rule: str = "positional"):
        super().__init__(board_size=board_size, komi=0.0, ko_rule=ko_rule)
        self.spec = dataclasses.replace(self.spec, name=f"killallgo_{board_size}x{board_size}")
        self.use_seki = bool(use_seki)
        if self.use_seki:
            if board_size != 7:
                raise ValueError("the seki table is 7x7-only (reference kKillAllGoBoardSize)")
            from minizero_tpu.envs import seki7x7

            table = seki7x7.ensure_table(seki_min_size, seki_max_size)
            hashes, words, max_run = seki7x7.sorted_device_table(table)
            self._seki_hash = jnp.asarray(hashes)
            self._seki_words = jnp.asarray(words)
            self._seki_window = max_run
            self._seki_mix = jnp.asarray(np.asarray(seki7x7._MIX, np.uint32).view(np.int32))

    # ------------------------------------------------------------------ seki
    def _seki_detected(self, state: GoState) -> jnp.ndarray:
        """True if any white-enclosed area matches a proven seki pattern
        (reference SekiSearch::isSeki + lookupSekiBitboard,
        killallgo_seki_7x7.cpp:377-474): the area's (black, empty) masks are
        the table key, and at most one of its surrounding white blocks may
        border other areas too."""
        nn = self.nn
        idx = jnp.arange(nn, dtype=jnp.int32)
        board = state.board
        white = board == 2
        black = board == 1
        empty = board == 0
        nonw = ~white

        connected = nonw[self._nbr] & self._nbr_valid & nonw[:, None]
        area_labels = self._cc_labels(nonw, connected)
        area_oh = (area_labels[None, :] == idx[:, None]) & nonw[None, :]  # [L, P]
        area_exists = jnp.any(area_oh, axis=1)

        block_oh = (state.labels[None, :] == idx[:, None]) & white[None, :]
        reach_b = self._adj_or(block_oh)  # [Lb, P] (shifts beat adjacency matmuls)
        a2b = (
            jnp.dot(area_oh.astype(jnp.float32), reach_b.T.astype(jnp.float32),
                    preferred_element_type=jnp.float32) > 0
        )  # [La, Lb] area borders block
        areas_per_block = jnp.sum(a2b.astype(jnp.float32), axis=0)  # [Lb]
        multi = (areas_per_block > 1).astype(jnp.float32)
        surround_multi = jnp.dot(a2b.astype(jnp.float32), multi)  # [La]
        filter_ok = area_exists & (surround_multi <= 1)

        # pack each area's (black, empty) masks into 4 int32 words
        # (25 low cells + 24 high cells per mask), same layout as
        # seki7x7.pack_words
        pow_lo = (jnp.int32(1) << idx[:25]).astype(jnp.int32)
        pow_hi = (jnp.int32(1) << (idx[25:] - 25)).astype(jnp.int32)

        def pack(mask_oh):  # bool [L, P] -> int32 [L, 2]
            m = mask_oh.astype(jnp.int32)
            return jnp.stack([m[:, :25] @ pow_lo, m[:, 25:] @ pow_hi], axis=1)

        words = jnp.concatenate(
            [pack(area_oh & black[None, :]), pack(area_oh & empty[None, :])], axis=1
        )  # [L, 4]
        h = (words[:, 0] * self._seki_mix[0]) ^ (words[:, 1] * self._seki_mix[1]) \
            ^ (words[:, 2] * self._seki_mix[2]) ^ (words[:, 3] * self._seki_mix[3])
        pos = jnp.searchsorted(self._seki_hash, h)
        m = self._seki_hash.shape[0]
        if m == 0:
            return jnp.bool_(False)
        found = jnp.zeros(h.shape, bool)
        for j in range(self._seki_window):
            at = jnp.clip(pos + j, 0, m - 1)
            found |= (self._seki_hash[at] == h) & jnp.all(self._seki_words[at] == words, axis=1)
        return jnp.any(found & filter_ok)

    # ----------------------------------------------------------------- benson
    def _benson_bitboard(self, board: jnp.ndarray, labels: jnp.ndarray, player) -> jnp.ndarray:
        """bool[NN] unconditionally-alive (pass-alive) points of ``player``:
        stones of alive blocks plus their vital enclosed regions
        (reference GoEnv::findBensonBitboard, go.cpp:614-678).

        Blocks = ``labels`` rows of the player's stones; regions = connected
        components of non-player points. ``vital[a, b]`` = every empty point
        of region a is a liberty of block b. Fixpoint: keep blocks with >= 2
        vital regions, keep regions whose every neighbouring player block is
        kept.
        """
        nn = self.nn
        idx = jnp.arange(nn, dtype=jnp.int32)
        p_stone = board == jnp.asarray(player, board.dtype)
        empty = board == 0
        nonp = ~p_stone

        connected = nonp[self._nbr] & self._nbr_valid & nonp[:, None]
        area_labels = self._cc_labels(nonp, connected)

        block_oh_b = (labels[None, :] == idx[:, None]) & p_stone[None, :]  # [L, P]
        area_oh_b = (area_labels[None, :] == idx[:, None]) & nonp[None, :]  # [L, P]
        block_oh = block_oh_b.astype(jnp.float32)
        area_oh = area_oh_b.astype(jnp.float32)
        block_exists = jnp.any(block_oh_b, axis=1)
        area_exists = jnp.any(area_oh_b, axis=1)

        reach = self._adj_or(block_oh_b)  # [L, P] (shifts beat adjacency matmuls)
        lib = (reach & empty[None, :]).astype(jnp.float32)  # liberties of each block
        area_empty = area_oh * empty[None, :].astype(jnp.float32)  # [L, P]
        empty_cnt = jnp.sum(area_empty, axis=1)  # [L]

        overlap = jnp.dot(area_empty, lib.T, preferred_element_type=jnp.float32)  # [L_a, L_b]
        vital = (
            (overlap >= empty_cnt[:, None])
            & (empty_cnt[:, None] > 0)
            & area_exists[:, None]
            & block_exists[None, :]
        )
        adj_ab = jnp.dot(area_oh, reach.astype(jnp.float32).T, preferred_element_type=jnp.float32) > 0

        alive_block = jnp.any(vital, axis=0)
        alive_area = jnp.any(vital, axis=1)

        # each round removes at least one block/area until fixpoint; the pool
        # has at most NN labels so NN rounds always converge
        def cond(carry):
            ab, aa, changed, i = carry
            return changed & (i < nn)

        def body(carry):
            ab, aa, _, i = carry
            ab2 = jnp.sum((vital & aa[:, None]).astype(jnp.int32), axis=0) >= 2
            aa2 = aa & ~jnp.any(adj_ab & ~ab2[None, :], axis=1)
            changed = jnp.any(ab2 != ab) | jnp.any(aa2 != aa)
            return ab2, aa2, changed, i + 1

        alive_block, alive_area, _, _ = jax.lax.while_loop(
            cond, body, (alive_block, alive_area, jnp.bool_(True), jnp.int32(0))
        )
        lab_c = jnp.clip(labels, 0, nn - 1)
        area_c = jnp.clip(area_labels, 0, nn - 1)
        return (p_stone & alive_block[lab_c]) | (nonp & alive_area[area_c])

    # ------------------------------------------------------------------ rules
    def _legal_mask_for(self, board, labels, lib_at, onehot, block_chunks, turn,
                        hash_a, hash_b, history_a, history_b, num_moves):
        """Move 1 (White's first) must be a pass; moves 0 and 2 must NOT be a
        pass; otherwise plain Go legality (reference killallgo.cpp:27-32)."""
        base = super()._legal_mask_for(
            board, labels, lib_at, onehot, block_chunks, turn,
            hash_a, hash_b, history_a, history_b, num_moves,
        )
        nn = self.nn
        pass_only = num_moves == 1
        board_part = jnp.where(pass_only, jnp.zeros((nn,), bool), base[:nn])
        pass_part = jnp.where(pass_only, True, jnp.where(num_moves < 3, False, base[nn]))
        return jnp.concatenate([board_part, pass_part[None]])

    def init(self) -> GoState:
        state = super().init()
        return state.replace(legal=state.legal.at[self.nn].set(False))  # move 0: no pass

    def is_terminal(self, state: GoState) -> jnp.ndarray:
        """Terminal when all points are Black-pass-alive, any point is
        White-pass-alive, or plain Go termination (killallgo.cpp:35-41)."""
        benson_b = self._benson_bitboard(state.board, state.labels, 1)
        benson_w = self._benson_bitboard(state.board, state.labels, 2)
        terminal = (
            (jnp.sum(benson_b.astype(jnp.int32)) == self.nn)
            | jnp.any(benson_w)
            | super().is_terminal(state)
        )
        if self.use_seki:
            # a proven local seki means White survives (killallgo.cpp:36)
            terminal |= self._seki_detected(state)
        return terminal

    def eval_score(self, state: GoState) -> jnp.ndarray:
        """Black wins iff White has no stones or Black is pass-alive
        everywhere (killallgo.cpp:43-49)."""
        return self.eval_score_from((state.board, state.labels))

    def terminal_score_inputs(self, state: GoState):
        # killall scoring reads board + block labels (NOT GoEnv's board-only
        # Tromp-Taylor form)
        return (state.board, state.labels)

    def eval_score_from(self, inputs) -> jnp.ndarray:
        board, labels = inputs
        benson_b = self._benson_bitboard(board, labels, 1)
        no_white = ~jnp.any(board == 2)
        black_all = jnp.sum(benson_b.astype(jnp.int32)) == self.nn
        return jnp.where(no_white | black_all, 1.0, -1.0).astype(jnp.float32)
