"""Host-env self-play engine (Atari): host-side vectorised env + device-side
MuZero search.

The fused engine keeps envs on device; the ALE cannot go there, so this
engine mirrors the reference's MuZero actor structure (env consulted only at
the root, ``actor/zero_actor.cpp:58-68``): per move it uploads the feature
batch, runs the jitted batched search (``selfplay/muzero_search.py``), and
steps the host envs with the chosen actions.

The collector reproduces the reference's intermediate-sequence chunking for
long episodes (``actor/actor_group.cpp:52-64, 125-132``): when
``zero_actor_intermediate_sequence_length`` > 0, a record chunk is emitted
every seqlen trainable positions with a ``learner_muzero_unrolling_step +
learner_n_step_return`` margin, and per-move lives-lost flags feed the
episodic-life n-step cut (``atari.cpp calculateNStepValue``).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.config import Config
from minizero_tpu.learner.replay import GameRecord
from minizero_tpu.selfplay.collector import FinishedGame
from minizero_tpu.selfplay.engine import search_spec_from_config
from minizero_tpu.selfplay.muzero_search import make_muzero_search


class HostMoveOutput(NamedTuple):
    action: np.ndarray  # i32[B]
    policy_target: np.ndarray  # f32[B, A]
    root_value: np.ndarray  # f32[B]
    reward: np.ndarray  # f32[B]
    frames: np.ndarray  # u8[B, H, W, 3] pre-move NEWEST frame — records
    # store single frames (frames schema, learner/frame_window.py); the
    # 32-channel stack is assembled on device at train time
    done: np.ndarray  # bool[B]
    eval_score: np.ndarray  # f32[B]
    lives_lost: np.ndarray  # bool[B]


class HostSelfPlayEngine:
    """Batched self-play over a host vec env (MuZero only)."""

    def __init__(self, vec_env, cfg: Config, network, eval_mode: bool = False, use_bf16: bool = True):
        self.vec_env = vec_env
        self.cfg = cfg
        self.network = network
        spec = vec_env.spec
        self.env_spec = spec
        self.search_spec = search_spec_from_config(cfg, spec, eval_mode=eval_mode)
        self.compute_dtype = jnp.bfloat16 if use_bf16 else jnp.float32

        c = spec.num_action_feature_channels

        def action_features(action):
            onehot = (jnp.arange(c) == action).astype(jnp.float32)
            return jnp.broadcast_to(
                onehot[None, None, :], (spec.hidden_height, spec.hidden_width, c)
            )

        search = make_muzero_search(
            network,
            self.search_spec,
            action_features,
            spec.num_players,
            discrete_value=spec.discrete_value_size > 1,
            compute_dtype=self.compute_dtype,
            resign_threshold=cfg.actor_resign_threshold,
        )
        self._search = jax.jit(search)

        # Device-resident feature ring: the 8-frame history stack lives on
        # device as u8[B, 8, 96, 96, 3] + action ids i32[B, 8]; each move
        # uploads only the NEW frame (u8[B, 96, 96, 3], ~3.5 MB at b=128)
        # instead of the full stacked f32 features (~150 MB — which, over
        # the tunneled TPU, was the 7.3 s/move 'host-bound' cost the
        # round-3 Atari run measured). Ring update + feature build + search
        # are one fused jit, so there is a single dispatch per move.
        from minizero_tpu.envs.atari import ACTION_SIZE as _A

        def update_and_search(variables, ring, ahist, frame, action, fresh,
                              legal, rng, temperature):
            b = ring.shape[0]
            fresh5 = fresh[:, None, None, None, None]
            ring = jnp.where(fresh5, jnp.uint8(0), ring)
            ahist = jnp.where(fresh[:, None], 0, ahist)
            ring = jnp.concatenate([ring[:, 1:], frame[:, None]], axis=1)
            ahist = jnp.concatenate([ahist[:, 1:], action[:, None]], axis=1)
            feats = _features_from_ring(ring, ahist)
            turns = jnp.ones((b,), jnp.int32)
            res = search(variables, feats, legal, turns, rng, temperature)
            return ring, ahist, res

        def _features_from_ring(ring, ahist):
            b, h = ring.shape[0], ring.shape[1]
            r = ring.shape[2]
            obs = ring.astype(jnp.float32) / 255.0  # [B, 8, 96, 96, 3]
            aplane = (ahist.astype(jnp.float32) / _A)[:, :, None, None, None]
            aplane = jnp.broadcast_to(aplane, (b, h, r, r, 1))
            stacked = jnp.concatenate([aplane, obs], axis=-1)  # [B,8,96,96,4]
            # channel layout 4i..4i+3 = [action_i, R_i, G_i, B_i]
            return stacked.transpose(0, 2, 3, 1, 4).reshape(b, r, r, h * 4)

        self._features_from_ring = _features_from_ring  # test hook
        self._update_and_search = jax.jit(update_and_search)
        self._ring = None
        self._ahist = None

    def _cast_variables(self, variables):
        dt = self.compute_dtype
        return jax.tree_util.tree_map(
            lambda x: x.astype(dt) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            variables,
        )

    def move(self, variables, rng, temperature: float = 1.0) -> HostMoveOutput:
        envs = self.vec_env.envs
        batch = len(envs)
        # per-move device upload: ONLY the newest frame + last action + masks;
        # the search features are assembled from the device ring
        frames = self.vec_env.newest_frames()  # u8[B, 96, 96, 3]
        fresh = np.asarray([len(e.actions) == 0 for e in envs])
        last_actions = np.asarray(
            [e.actions[-1] if e.actions else 0 for e in envs], np.int32)
        legal = self.vec_env.legal_masks()
        if self._ring is None:
            from minizero_tpu.envs.atari import HISTORY, RESOLUTION

            self._ring = jnp.zeros(
                (batch, HISTORY, RESOLUTION, RESOLUTION, 3), jnp.uint8)
            self._ahist = jnp.zeros((batch, HISTORY), jnp.int32)
        lives_before = np.asarray([e.lives_history[-1] for e in envs])
        self._ring, self._ahist, res = self._update_and_search(
            self._cast_variables(variables),
            self._ring, self._ahist,
            jnp.asarray(frames), jnp.asarray(last_actions), jnp.asarray(fresh),
            jnp.asarray(legal), rng, jnp.float32(temperature),
        )
        actions = np.asarray(res.action)
        rewards = self.vec_env.step(actions)
        done = self.vec_env.terminals()
        lives_after = np.asarray([e.lives_history[-1] for e in envs])
        scores = np.asarray([e.eval_score() for e in envs], np.float32)
        return HostMoveOutput(
            action=actions,
            policy_target=np.asarray(res.policy_target),
            root_value=np.asarray(res.root_value),
            reward=rewards,
            frames=frames,  # the pre-move newest frames read above — the
            # per-move 37 MB features_u8() stack assembly is gone entirely
            done=done,
            eval_score=scores,
            lives_lost=lives_after < lives_before,
        )


class AtariTrajectoryCollector:
    """Accumulates host-engine moves into (possibly chunked) GameRecords."""

    def __init__(self, cfg: Config, env_spec, batch_size: int):
        self.cfg = cfg
        self.spec = env_spec
        self.batch = batch_size
        self._slots: List[dict] = [self._new_slot() for _ in range(batch_size)]

    def _new_slot(self) -> dict:
        # "offset" counts moves already trimmed from the front: the episode
        # position of list index i is offset + i (the reference instead
        # frees old observations in place, atari.cpp:86-91)
        return {
            "actions": [], "policy": [], "values": [], "rewards": [],
            "frames": [], "lives_lost": [], "offset": 0,
        }

    #: per-position history depth of the feature stack (atari.h)
    HISTORY = 8

    def _margin(self) -> int:
        return self.cfg.learner_muzero_unrolling_step + self.cfg.learner_n_step_return

    def add_moves(self, out: HostMoveOutput) -> Tuple[List[FinishedGame], List[int]]:
        """Returns (finished chunks/games, slots needing reset)."""
        finished: List[FinishedGame] = []
        reset_slots: List[int] = []
        seqlen = self.cfg.zero_actor_intermediate_sequence_length
        for i in range(self.batch):
            slot = self._slots[i]
            slot["actions"].append(int(out.action[i]))
            slot["policy"].append(out.policy_target[i].astype(np.float16))
            slot["values"].append(float(out.root_value[i]))
            slot["rewards"].append(float(out.reward[i]))
            slot["frames"].append(out.frames[i])
            slot["lives_lost"].append(bool(out.lives_lost[i]))
            length = slot["offset"] + len(slot["actions"])
            if out.done[i]:
                finished.append(self._emit(i, terminal=True, score=float(out.eval_score[i])))
                self._slots[i] = self._new_slot()
                reset_slots.append(i)
            elif seqlen > 0 and length >= seqlen and (length - self._margin()) % seqlen == 0:
                finished.append(self._emit(i, terminal=False, score=float(out.eval_score[i])))
        return finished, reset_slots

    def _emit(self, slot_idx: int, terminal: bool, score: float) -> FinishedGame:
        """Chunk emission (reference calculateTrainingDataRange,
        actor_group.cpp:52-64), sliced to dense per-chunk arrays; emitted
        prefixes are trimmed so memory stays bounded for 27k-move episodes."""
        cfg = self.cfg
        slot = self._slots[slot_idx]
        offset = slot["offset"]
        length = offset + len(slot["actions"])  # absolute episode positions
        seqlen = cfg.zero_actor_intermediate_sequence_length
        margin = self._margin()
        data_end = length - 1
        data_start = 0
        if seqlen > 0:
            data_end = max(0, data_end if terminal else data_end - margin)
            data_start = max(
                0,
                (data_end - data_end % seqlen) if terminal else data_end + 1 - seqlen,
            )
            if terminal and data_end % seqlen < margin:
                data_start = max(0, data_start - seqlen)
        # store [data_start .. min(len-1, data_end + margin)] so unroll/n-step
        # targets stay inside the chunk
        store_end = min(length - 1, data_end + margin)
        # frames schema: prepend up to HISTORY-1 frames + HISTORY actions of
        # pre-chunk history so every position's 8-deep stack (+ its action
        # planes) assembles bit-exact, matching what features_u8 showed the
        # search at self-play time (learner/frame_window.py)
        lead = min(self.HISTORY, data_start)
        assert data_start - lead >= offset, "chunk start trimmed too aggressively"
        sl = slice(data_start - offset, store_end + 1 - offset)
        fsl = slice(data_start - lead - offset, store_end + 1 - offset)
        lsl = slice(data_start - lead - offset, data_start - offset)
        record = GameRecord(
            actions=np.asarray(slot["actions"][sl], np.int32),
            policy=np.stack(slot["policy"][sl]),
            values=np.asarray(slot["values"][sl], np.float32),
            rewards=np.asarray(slot["rewards"][sl], np.float32),
            features=None,
            frames=np.stack(slot["frames"][fsl]),
            frame_lead=lead,
            lead_actions=np.asarray(slot["actions"][lsl], np.int32),
            result=score,
            data_range=(0, data_end - data_start),
            lives_lost=np.asarray(slot["lives_lost"][sl], bool),
        )
        if not terminal and seqlen > 0:
            # positions before the NEXT chunk's earliest possible start are
            # never needed again: next data_start >= data_end + 1 - seqlen...
            # keep one extra seqlen + margin of slack for the terminal
            # back-extension, plus HISTORY positions of frame-lead history
            keep_from = max(offset, data_end + 1 - seqlen - margin - self.HISTORY)
            drop = keep_from - offset
            if drop > 0:
                for key in ("actions", "policy", "values", "rewards", "frames", "lives_lost"):
                    del slot[key][:drop]
                slot["offset"] = keep_from
        return FinishedGame(record=record, players=tuple([1] * record.length),
                            slot=slot_idx, abs_start=data_start)
