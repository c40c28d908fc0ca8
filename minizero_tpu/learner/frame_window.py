"""Device-resident Atari frame window.

Round-4's Atari optimize phase re-uploaded 340 MB of stacked u8 feature
planes per 9-step train chunk over the TPU tunnel; at the ~35 MB/s
effective host->device bandwidth measured by ``scripts/probe_atari_opt.py``
that upload was ~95% of the optimize wall (0.57 steps/s, VERDICT r4
missing #1) while the actual device compute was 0.2 s/chunk.  The root
cause is an 8x-redundant representation: the 32-channel MuZero-Atari
feature stack (8 history frames x [action plane + RGB], reference
``atari.cpp:112-122``) repeats every frame in 8 consecutive positions'
stacks.

TPU-native fix: store each position's single newest RGB frame once —
records carry ``frames`` u8[lead+L, H, W, 3] instead of stacked
``features`` u8[L, H, W, 32] (8x less host RAM too) — keep the whole
replay window's frames resident on device as one u8 ring, and assemble
the 32-channel stacks ON DEVICE from 8 gathered rows + broadcast action
planes.  The per-chunk host->device traffic drops from 340 MB to ~1 MB of
indices/masks/metadata; each game's frames upload once (right after
self-play emits it, ~6 MB/game) instead of ~8x per optimize phase.

The ``lead`` rows are up to 8 positions of pre-chunk history (frames +
actions) so continuation chunks of long episodes assemble bit-exact
stacks — the same bytes ``AtariVecEnv.features_u8`` produced at self-play
time (``tests/test_frame_window.py`` asserts equality).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

HISTORY = 8  # frames per stack (reference atari.h kHistorySize)


def assemble_features(window, idx: jnp.ndarray,
                      valid: jnp.ndarray, aplane: jnp.ndarray) -> jnp.ndarray:
    """u8 frame rows -> f32 stacked feature planes, on device.

    window  tuple of u8[Rs, H, W, 3] — the resident frame ring, sharded
            into sub-2^32-element banks: XLA:TPU's gather lowering
            overflows an i32 offset past 2^32 operand elements and the
            compile helper crashes (measured: 131072-row banks compile,
            262144 fail — scripts/probe_assemble_compile2.py). Rows are
            global; bank s covers [off_s, off_s + Rs).
    idx     i32[..., 8]    — global window row of history slot k (0 oldest)
    valid   bool[..., 8]   — False -> zero-pad (before episode start)
    aplane  u8[..., 8]     — quantised action plane byte per slot
    returns f32[..., H, W, 32] — channel 4k = action plane, 4k+1..3 = RGB
    (reference ``atari.cpp:112-122``; parity with
    ``AtariVecEnv.features_u8`` / ``rebuild_features_from_frames``).
    """
    if not isinstance(window, (tuple, list)):
        window = (window,)
    lead_shape = idx.shape
    h, w = window[0].shape[1], window[0].shape[2]
    flat_idx = idx.reshape(-1)
    f = jnp.zeros((flat_idx.shape[0], h, w, 3), jnp.uint8)
    off = 0
    for bank in window:  # banks' row masks are mutually exclusive
        local = jnp.clip(flat_idx - off, 0, bank.shape[0] - 1)
        hit = (flat_idx >= off) & (flat_idx < off + bank.shape[0])
        f = jnp.where(hit[:, None, None, None],
                      jnp.take(bank, local, axis=0), f)
        off += bank.shape[0]
    f = f.reshape(*lead_shape, h, w, 3)
    f = jnp.where(valid[..., None, None, None], f, jnp.uint8(0))
    ap = jnp.broadcast_to(aplane[..., None, None, None], (*lead_shape, h, w, 1))
    x = jnp.concatenate([ap, f], axis=-1)           # [..., 8, H, W, 4]
    x = jnp.moveaxis(x, -4, -2)                     # [..., H, W, 8, 4]
    x = x.reshape(*x.shape[:-2], HISTORY * 4)       # [..., H, W, 32]
    # cast kept OUT of any conv-grad graph (XLA:TPU space-to-batch crash,
    # CLAUDE.md): this function runs in its own jit, ahead of the train chunk
    return x.astype(jnp.float32)


def assemble_features_host(flat_frames: np.ndarray, idx: np.ndarray,
                           valid: np.ndarray, aplane: np.ndarray) -> np.ndarray:
    """Numpy mirror of :func:`assemble_features` (returns u8 planes).

    Fallback when the frame window exceeds the device budget, and the
    parity oracle for the device path."""
    lead_shape = idx.shape
    h, w = flat_frames.shape[1], flat_frames.shape[2]
    f = flat_frames[idx.reshape(-1)].reshape(*lead_shape, h, w, 3)
    f = np.where(valid[..., None, None, None], f, np.uint8(0))
    ap = np.broadcast_to(aplane[..., None, None, None],
                         (*lead_shape, h, w, 1)).astype(np.uint8)
    x = np.concatenate([ap, f], axis=-1)
    x = np.moveaxis(x, -4, -2)
    return np.ascontiguousarray(x).reshape(*x.shape[:-2], HISTORY * 4)


class DeviceFrameWindow:
    """One u8 frame ring on device + host-side row bookkeeping.

    Games claim contiguous row ranges in arrival order; the cursor wraps to
    0 when a game would straddle the end (the short tail is wasted — at
    most one game's rows), so a sample's 8 history rows never need modular
    indexing.  Entries overwritten by the advancing cursor are dropped; the
    owner must size ``rows`` to cover its replay window (``rows_needed``).

    ``device=False`` keeps the same bookkeeping but mirrors rows in a host
    array for :func:`assemble_features_host` (windows past the HBM budget).
    """

    #: rows per device bank, kept under XLA:TPU's ~2^32-element gather
    #: operand limit (114688 * 96*96*3 = 3.17e9; the lowering's i32 offsets
    #: overflow past 2^32 and the compile helper crashes — see
    #: assemble_features). Multiple of BUCKET so blocks never straddle banks.
    BANK_ROWS = 114688

    def __init__(self, rows: int, height: int, width: int, device: bool = True):
        self.rows = int(rows)
        self.device = device
        if device:
            sizes = []
            left = self.rows
            while left > 0:
                sizes.append(min(left, self.BANK_ROWS))
                left -= sizes[-1]
            self.frames = tuple(
                jnp.zeros((s, height, width, 3), jnp.uint8) for s in sizes)
            self._bank_offs = np.concatenate([[0], np.cumsum(sizes)])

            def _write(bank, block, start):
                return jax.lax.dynamic_update_slice(
                    bank, block, (start,) + (0,) * (bank.ndim - 1))

            self._write = jax.jit(_write, donate_argnums=0)
        else:
            self.frames = np.zeros((self.rows, height, width, 3), np.uint8)
            self._bank_offs = np.array([0, self.rows])
        self._cursor = 0
        # id(record) -> dict(base, lead, n, aplane_full u8[lead+L], record)
        # (the record ref keeps the id stable while the entry lives)
        self._games: "OrderedDict[int, dict]" = OrderedDict()

    @staticmethod
    def rows_needed(cfg) -> int:
        """Upper bound on live rows for a config's replay window."""
        seqlen = cfg.zero_actor_intermediate_sequence_length
        margin = cfg.learner_muzero_unrolling_step + cfg.learner_n_step_return
        per_game = (seqlen + 2 * margin + HISTORY + 2) if seqlen > 0 else 30000
        per_game += DeviceFrameWindow.BUCKET  # allocation rounding
        games = cfg.zero_replay_buffer * cfg.zero_num_games_per_iteration
        total = per_game * games
        # slack for the ring-wrap tail + per-bank boundary skips
        return total + per_game * (2 + total // DeviceFrameWindow.BANK_ROWS)

    #: rows are claimed in buckets so the jitted ring write sees a handful
    #: of block shapes (each fresh shape is a remote XLA compile over the
    #: tunnel); the padding rows belong to the claiming game, never a peer
    BUCKET = 64

    # ------------------------------------------------------------------ add
    def add(self, record) -> None:
        """Upload ``record.frames`` (u8[lead+L, H, W, 3]) into the ring."""
        frames = record.frames
        n = frames.shape[0]
        n_alloc = -(-n // self.BUCKET) * self.BUCKET
        if n_alloc > int(self._bank_offs[1]):  # must fit one (full) bank
            raise ValueError(f"frame window too small: game needs {n_alloc} "
                             f"rows, a bank has {int(self._bank_offs[1])}")
        base = self._claim(n_alloc)
        if self.device:
            block = np.zeros((n_alloc,) + frames.shape[1:], np.uint8)
            block[:n] = frames
            s = int(np.searchsorted(self._bank_offs, base, side="right") - 1)
            banks = list(self.frames)
            banks[s] = self._write(banks[s], jnp.asarray(block),
                                   jnp.int32(base - int(self._bank_offs[s])))
            self.frames = tuple(banks)
        else:
            self.frames[base:base + n] = frames
        lead = record.frame_lead
        lead_actions = (record.lead_actions if record.lead_actions is not None
                        else np.zeros(0, np.int32))
        actions_full = np.concatenate([np.asarray(lead_actions, np.int64),
                                       np.asarray(record.actions, np.int64)])
        # quantised action-plane byte per position (atari.cpp: action/|A|*255)
        from minizero_tpu.envs.atari import ACTION_SIZE

        aplane_full = np.clip(
            actions_full.astype(np.float32) / ACTION_SIZE * 255.0, 0, 255
        ).astype(np.uint8)
        self._games[id(record)] = {
            "base": base, "lead": int(lead), "n": n_alloc,
            "aplane_full": aplane_full, "record": record,
        }
        self._cursor = base + n_alloc

    def _claim(self, n_alloc: int) -> int:
        """Advance the cursor to a block that fits without straddling a
        bank boundary (a gather-side row range must live in ONE bank);
        skipped tails are evicted like the ring-wrap tail."""
        while True:
            if self._cursor + n_alloc > self.rows:
                self._evict_range(self._cursor, self.rows)  # wasted tail
                self._cursor = 0
                continue
            s = int(np.searchsorted(self._bank_offs, self._cursor, side="right") - 1)
            bank_end = int(self._bank_offs[s + 1])
            if self._cursor + n_alloc > bank_end:
                self._evict_range(self._cursor, bank_end)
                self._cursor = bank_end
                continue
            base = self._cursor
            self._evict_range(base, base + n_alloc)
            return base

    def _evict_range(self, lo: int, hi: int) -> None:
        for key in [k for k, e in self._games.items()
                    if e["base"] < hi and e["base"] + e["n"] > lo]:
            del self._games[key]

    def retain(self, live_records: List) -> None:
        """Drop bookkeeping for games evicted from the replay buffer."""
        live = {id(r) for r in live_records}
        for key in [k for k in self._games if k not in live]:
            del self._games[key]

    def __contains__(self, record) -> bool:
        return id(record) in self._games

    # --------------------------------------------------------------- lookup
    def lookup(self, records: List, pos_ids: np.ndarray) -> Dict[str, np.ndarray]:
        """Per-sample gather plan: window rows + masks + action-plane bytes.

        ``records[i]`` is the sampled game of batch lane i, ``pos_ids[i]``
        its position (0-based in the record's stored range)."""
        b = len(records)
        base = np.empty(b, np.int64)
        lead = np.empty(b, np.int64)
        entries = []
        for i, rec in enumerate(records):
            e = self._games.get(id(rec))
            if e is None:
                raise KeyError(
                    "sampled game's frames were overwritten in the device "
                    "ring — the window is undersized for the replay buffer "
                    "(raise learner_device_feature_window_gb or lower "
                    "zero_replay_buffer)")
            entries.append(e)
            base[i] = e["base"]
            lead[i] = e["lead"]
        pos = np.asarray(pos_ids, np.int64)
        k = np.arange(HISTORY)
        rel = lead[:, None] + pos[:, None] - (HISTORY - 1) + k  # [B, 8]
        valid = rel >= 0
        idx = base[:, None] + np.maximum(rel, 0)
        # slot k's action plane: the action that LED to slot k's frame
        arel = rel - 1
        aplane = np.zeros((b, HISTORY), np.uint8)
        for i, e in enumerate(entries):  # batch-size lanes, one numpy row each
            av = arel[i] >= 0
            aplane[i, av] = e["aplane_full"][arel[i][av]]
        return {"frame_idx": idx.astype(np.int32), "frame_valid": valid,
                "frame_aplane": aplane}
