"""Replay buffer.

TPU-native re-design of the reference's SGF-string replay buffer + data loader
(``minizero/learner/data_loader.{h,cpp}``): the reference stores raw SGF
strings and re-plays the whole game on 8 CPU threads for every sampled
position (``base_env.h:235-241`` — the trainer's CPU hot spot). Here finished
games arrive as dense numpy arrays (the self-play engine already computed the
feature planes per move, stored as uint8), so sampling is pure array gathers
and the device receives ready batches; rotation augmentation moves into the
jitted train step.

Semantics preserved: capacity of ``zero_replay_buffer x
zero_num_games_per_iteration`` games (``data_loader.cpp:43-50``), two-level
game->position sampling by priority (``data_loader.cpp:53-64``), PER
priority^alpha weighting and ``(N * p)^-beta`` importance scaling
(``data_loader.cpp:24-33, 66-74``), sampling restricted to each game's
trainable DLEN range, and the reference's absorbing-state targets (uniform
policy, zero reward, random absorbing action features).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class GameRecord:
    """One finished game (or intermediate sequence chunk, reference
    ``actor_group.cpp:52-64``)."""

    actions: np.ndarray  # i32[L]
    policy: np.ndarray  # f16[L, A] normalised search policy (P tags)
    values: np.ndarray  # f32[L] root mean value per move (V tags)
    rewards: np.ndarray  # f32[L] env reward per move (R tags)
    features: np.ndarray  # u8[L, H, W, C] pre-move feature planes
    result: float  # RE tag (eval score / return)
    data_range: Tuple[int, int] = (-1, -1)  # DLEN; (-1,-1) -> full game
    priorities: Optional[np.ndarray] = None  # f32[L]; None -> uniform
    lives_lost: Optional[np.ndarray] = None  # bool[L]; episodic-life cuts (L tags)

    def __post_init__(self):
        if self.data_range == (-1, -1):
            self.data_range = (0, max(0, len(self.actions) - 1))

    @property
    def length(self) -> int:
        return len(self.actions)


class ReplayBuffer:
    def __init__(self, cfg, env_spec):
        self.cfg = cfg
        self.spec = env_spec
        # annealed by the zero loop per iteration (reference
        # zero_server.cpp:304-306)
        self.per_beta = cfg.learner_per_init_beta
        self.capacity = cfg.zero_replay_buffer * cfg.zero_num_games_per_iteration
        self.games: List[GameRecord] = []
        self.game_priorities: List[float] = []
        self.position_priorities: List[np.ndarray] = []
        self.num_data = 0
        self._start = 0  # ring start

    def __len__(self) -> int:
        return len(self.games)

    def _n_step_value(self, rec: GameRecord, pos: int) -> float:
        """Episodic-life n-step return with root-value bootstrap (reference
        AtariEnvLoader::calculateNStepValue, atari.cpp)."""
        n = self.cfg.learner_n_step_return
        discount = self.cfg.actor_mcts_reward_discount
        length = rec.length
        bootstrap = pos + n
        cut = rec.lives_lost
        tail = (
            (discount ** n) * float(rec.values[bootstrap])
            if bootstrap < length and not (cut is not None and cut[bootstrap])
            else 0.0
        )
        value = 0.0
        for idx in range(pos, min(bootstrap, length)):
            if cut is not None and cut[idx]:
                return value
            value += (discount ** (idx - pos)) * float(rec.rewards[idx])
        return value + tail

    def value_target(self, rec: GameRecord, pos: int) -> float:
        """Board games: the game return; n-step games: the n-step value
        (0 past the end, reference atari.h:115)."""
        if self.cfg.learner_n_step_return <= 0:
            return rec.result
        return self._n_step_value(rec, pos) if pos < rec.length else 0.0

    def add_game(self, record: GameRecord) -> None:
        lo, hi = record.data_range
        if (
            self.cfg.learner_use_per
            and record.priorities is None
            and self.cfg.learner_n_step_return > 0
        ):
            # priority = |n-step value - root value| (reference atari.h:117)
            record.priorities = np.asarray(
                [
                    abs(self._n_step_value(record, p) - float(record.values[p])) + 1e-6
                    for p in range(record.length)
                ],
                np.float32,
            )
        pri = np.zeros(record.length, np.float32)
        if self.cfg.learner_use_per and record.priorities is not None:
            pri[lo : hi + 1] = np.power(record.priorities[lo : hi + 1], self.cfg.learner_per_alpha)
        else:
            pri[lo : hi + 1] = 1.0
        self.games.append(record)
        self.position_priorities.append(pri)
        self.game_priorities.append(float(pri.sum()))
        self.num_data += hi - lo + 1
        while len(self.games) > self.capacity:
            old = self.games.pop(0)
            self.position_priorities.pop(0)
            self.game_priorities.pop(0)
            lo2, hi2 = old.data_range
            self.num_data -= hi2 - lo2 + 1

    # ------------------------------------------------------------- sampling
    def sample_indices(self, batch_size: int, rng: np.random.RandomState):
        """Two-level (game, position) sampling (reference
        ``data_loader.cpp:53-64``) + PER loss scales
        (``data_loader.cpp:66-74``)."""
        if not self.cfg.learner_use_per:
            # fast uniform path: every in-range position equally likely, so
            # sample flat position indices and invert via cumulative lengths
            lengths = np.array([g.data_range[1] - g.data_range[0] + 1 for g in self.games], np.int64)
            starts = np.array([g.data_range[0] for g in self.games], np.int64)
            cum = np.cumsum(lengths)
            flat = rng.randint(cum[-1], size=batch_size)
            game_ids = np.searchsorted(cum, flat, side="right")
            pos_ids = flat - (cum[game_ids] - lengths[game_ids]) + starts[game_ids]
            return game_ids, pos_ids, np.ones(batch_size, np.float32)

        gp = np.asarray(self.game_priorities, np.float64)
        total = gp.sum()
        game_ids = rng.choice(len(self.games), size=batch_size, p=gp / total)
        pos_ids = np.empty(batch_size, np.int64)
        loss_scale = np.ones(batch_size, np.float32)
        for i, g in enumerate(game_ids):
            pp = self.position_priorities[g]
            s = pp.sum()
            pos_ids[i] = rng.choice(len(pp), p=pp / s)
            prob = pp[pos_ids[i]] / total
            loss_scale[i] = (self.num_data * prob) ** (-self.per_beta)
        # normalise by batch max (reference train.py:63)
        loss_scale = loss_scale / max(loss_scale.max(), 1e-12)
        return game_ids, pos_ids, loss_scale

    def sample_alphazero(self, batch_size: int, rng: np.random.RandomState) -> Dict[str, np.ndarray]:
        """(features u8, policy, value, loss_scale) — rotation augmentation is
        applied later on device."""
        game_ids, pos_ids, loss_scale = self.sample_indices(batch_size, rng)
        spec = self.spec
        # records may hold bit-packed planes — follow their channel count
        feat_c = self.games[game_ids[0]].features.shape[-1]
        feats = np.empty((batch_size, spec.input_height, spec.input_width, feat_c), np.uint8)
        # f16 end to end: records store f16 and the train step upcasts on
        # device, so the host->device batch stream stays half-width
        policy = np.empty((batch_size, spec.action_size), np.float16)
        value = np.empty((batch_size,), np.float32)
        for i, (g, p) in enumerate(zip(game_ids, pos_ids)):
            rec = self.games[g]
            feats[i] = rec.features[p]
            policy[i] = rec.policy[p]
            # board-game value target = game return from P1's perspective
            # (reference TicTacToeEnvLoader::getValue -> getReturn())
            value[i] = rec.result
        return {
            "features": feats,
            "policy": policy,
            "value": value,
            "loss_scale": loss_scale,
            "sampled_index": np.stack([game_ids, pos_ids], axis=1),
        }

    def sample_muzero(self, batch_size: int, rng: np.random.RandomState) -> Dict[str, np.ndarray]:
        """Features at pos + K unroll steps of (action, policy, value, reward)
        (reference ``data_loader.cpp:157-200``)."""
        game_ids, pos_ids, loss_scale = self.sample_indices(batch_size, rng)
        spec = self.spec
        k = self.cfg.learner_muzero_unrolling_step
        a = spec.action_size
        feat_c = self.games[game_ids[0]].features.shape[-1]
        feats = np.empty((batch_size, spec.input_height, spec.input_width, feat_c), np.uint8)
        actions = np.empty((batch_size, k), np.int32)
        policy = np.empty((batch_size, k + 1, a), np.float16)
        value = np.empty((batch_size, k + 1), np.float32)
        reward = np.zeros((batch_size, k), np.float32)
        uniform = np.full((a,), 1.0 / a, np.float16)
        hidden_positions = spec.hidden_height * spec.hidden_width
        for i, (g, p) in enumerate(zip(game_ids, pos_ids)):
            rec = self.games[g]
            feats[i] = rec.features[p]
            for step in range(k + 1):
                pos = p + step
                inside = pos < rec.length
                if step < k:
                    # absorbing action features use a random action
                    # (reference tictactoe.cpp:147-152)
                    actions[i, step] = rec.actions[pos] if inside else rng.randint(hidden_positions)
                    reward[i, step] = rec.rewards[pos] if inside else 0.0
                # absorbing policy is uniform (reference base_env.h:262-264)
                policy[i, step] = rec.policy[pos] if inside else uniform
                value[i, step] = self.value_target(rec, pos)
        return {
            "features": feats,
            "actions": actions,
            "policy": policy,
            "value": value,
            "reward": reward,
            "loss_scale": loss_scale,
            "sampled_index": np.stack([game_ids, pos_ids], axis=1),
        }

    # -------------------------------------------------------------- PER sync
    def update_priority(self, sampled_index: np.ndarray, new_priorities: np.ndarray) -> None:
        """Refresh position priorities from new network values (reference
        ``data_loader.cpp:233-253``)."""
        if not self.cfg.learner_use_per:
            return
        for (g, p), pri in zip(sampled_index, new_priorities):
            if g < len(self.games):
                self.position_priorities[g][p] = float(pri) ** self.cfg.learner_per_alpha
                self.game_priorities[g] = float(self.position_priorities[g].sum())
