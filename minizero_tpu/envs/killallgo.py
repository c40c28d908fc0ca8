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

The optional precomputed 7x7 seki table (``killallgo_seki_7x7.cpp``,
``env_killallgo_use_seki``, default false) is not implemented; enabling the
flag raises.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from minizero_tpu.envs.go import GoEnv, GoState


class KillAllGoEnv(GoEnv):
    def __init__(self, board_size: int = 7, use_seki: bool = False):
        if use_seki:
            raise NotImplementedError("7x7 seki table is not implemented (env_killallgo_use_seki)")
        super().__init__(board_size=board_size, komi=0.0)
        self.spec = dataclasses.replace(self.spec, name=f"killallgo_{board_size}x{board_size}")

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

        block_oh = ((labels[None, :] == idx[:, None]) & p_stone[None, :]).astype(jnp.float32)  # [L, P]
        area_oh = ((area_labels[None, :] == idx[:, None]) & nonp[None, :]).astype(jnp.float32)  # [L, P]
        block_exists = jnp.sum(block_oh, axis=1) > 0
        area_exists = jnp.sum(area_oh, axis=1) > 0

        reach = jnp.dot(block_oh, self._adj_f, preferred_element_type=jnp.float32) > 0  # [L, P]
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
        return (
            (jnp.sum(benson_b.astype(jnp.int32)) == self.nn)
            | jnp.any(benson_w)
            | super().is_terminal(state)
        )

    def eval_score(self, state: GoState) -> jnp.ndarray:
        """Black wins iff White has no stones or Black is pass-alive
        everywhere (killallgo.cpp:43-49)."""
        benson_b = self._benson_bitboard(state.board, state.labels, 1)
        no_white = ~jnp.any(state.board == 2)
        black_all = jnp.sum(benson_b.astype(jnp.int32)) == self.nn
        return jnp.where(no_white | black_all, 1.0, -1.0).astype(jnp.float32)
