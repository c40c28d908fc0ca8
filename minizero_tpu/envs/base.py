"""Environment core.

TPU-native re-design of the reference's env layer
(``minizero/environment/base/base_env.h:73-114``): instead of a stateful C++
``BaseEnv`` object mutated by ``act()``, an environment here is a *pure
functional* bundle — an immutable state pytree of fixed-shape arrays plus
jittable transition functions — so thousands of games step in lock-step under
``vmap`` on device (SURVEY.md §2.5 item 1).

Conventions (matching the reference):
  * players are 1 (Black / first player) and 2 (White); 0 = empty
    (``base_env.h:22-27``)
  * ``eval_score`` is from Player-1's perspective: +1 black win, -1 white win,
    0 draw (e.g. ``tictactoe.cpp:61-69``)
  * features are NHWC (``[H, W, C]`` per game) — the TPU-friendly layout —
    whereas the reference emits flat NCHW floats (``tictactoe.cpp:71-97``)
  * feature planes are binary/bounded so replay buffers may store them as uint8
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from minizero_tpu.utils import rotation as rot


@dataclass(frozen=True)
class EnvSpec:
    """Static env metadata (the reference exposes these as virtual getters,
    ``base_env.h:89-96``)."""

    name: str
    num_players: int
    board_size: int
    action_size: int
    num_input_channels: int
    input_height: int
    input_width: int
    hidden_height: int
    hidden_width: int
    num_action_feature_channels: int = 1
    discrete_value_size: int = 1
    max_game_length: int = 0  # hard cap on moves per game (for fixed shapes)
    has_pass: bool = False
    binary_features: bool = True  # 0/1 planes -> bit-packable for transfer


class Env:
    """Functional environment interface.

    Concrete envs implement single-instance pure functions; batching is the
    caller's job via ``jax.vmap``. All functions must be jittable with static
    shapes.
    """

    spec: EnvSpec

    # -- transition ---------------------------------------------------------
    def init(self) -> Any:
        """Initial state pytree for one game."""
        raise NotImplementedError

    def init_random(self, rng: Any) -> Any:
        """Initial state with per-episode randomness (scrambles, seeds).
        Deterministic envs ignore ``rng`` (reference: RubiksEnv::reset draws
        a random scramble, rubiks.cpp:14-37; AtariEnv seeds ALE)."""
        return self.init()

    def step(self, state: Any, action: jnp.ndarray) -> Any:
        """Apply ``action`` (int32 action id) for the player to move.

        Must be safe to call with an illegal action or on a terminal state
        (the result is unspecified but well-shaped) — the search masks
        illegality itself, like the reference's expansion does
        (``zero_actor.cpp:219-224``).
        """
        raise NotImplementedError

    # -- observation --------------------------------------------------------
    def legal_mask(self, state: Any) -> jnp.ndarray:
        """bool[action_size]; reference ``BaseEnv::isLegalAction``."""
        raise NotImplementedError

    def is_terminal(self, state: Any) -> jnp.ndarray:
        raise NotImplementedError

    def eval_score(self, state: Any) -> jnp.ndarray:
        """Game outcome from Player 1's perspective (reference
        ``getEvalScore``)."""
        raise NotImplementedError

    def terminal_score_inputs(self, state: Any) -> Any:
        """Minimal sub-pytree of ``state`` that ``eval_score_from`` needs.

        The self-play engines score terminal leaves inside a ``lax.cond``
        that skips the work on simulations where no game's leaf is terminal
        (almost all of them); big cond operands force buffer copies at the
        region boundary, so envs with an expensive score (Go's flood-fill)
        override this to pass only what the score reads (the board)."""
        return state

    def eval_score_from(self, inputs: Any) -> jnp.ndarray:
        """``eval_score`` evaluated from ``terminal_score_inputs(state)``."""
        return self.eval_score(inputs)

    def resign_eval_score(self, state: Any) -> jnp.ndarray:
        """Eval score when the player to move resigns: next player wins
        (reference ``tictactoe.cpp:61-63``)."""
        turn = self.turn(state)
        return jnp.where(turn == 1, -1.0, 1.0).astype(jnp.float32)

    def reward(self, state: Any) -> jnp.ndarray:
        """Reward of the last transition (0 for board games,
        ``base_env.h:85`` / ``tictactoe.h:26``)."""
        return jnp.float32(0.0)

    def turn(self, state: Any) -> jnp.ndarray:
        raise NotImplementedError

    def features(self, state: Any) -> jnp.ndarray:
        """f32[H, W, C] network input planes."""
        raise NotImplementedError

    def action_features(self, action: jnp.ndarray) -> jnp.ndarray:
        """f32[hidden_H, hidden_W, num_action_feature_channels] — the action
        plane fed to the MuZero dynamics net (reference
        ``BaseEnv::getActionFeatures``; one-hot plane for board games,
        ``tictactoe.cpp:99-104``)."""
        a = self.spec
        plane = jnp.zeros((a.hidden_height * a.hidden_width,), jnp.float32)
        idx = jnp.clip(action, 0, a.hidden_height * a.hidden_width - 1)
        plane = plane.at[idx].set(jnp.where(action < a.hidden_height * a.hidden_width, 1.0, 0.0))
        return plane.reshape(a.hidden_height, a.hidden_width, 1)

    # -- symmetry -----------------------------------------------------------
    def rotate_features(self, feats: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
        """Rotate NHWC feature planes (identity for non-square-symmetric
        games, which override with a no-op)."""
        return rot.rotate_planes(feats, rotation, self.spec.board_size)

    def rotate_policy_back(self, policy: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
        """Given a policy produced from rotated features, read it back in
        original coordinates: ``out[a] = policy[rotate(a)]``
        (reference ``zero_actor.cpp:222-223``)."""
        return rot.rotate_action_array(policy, rotation, self.spec.board_size)

    def rotate_features_batch(self, feats: jnp.ndarray, rotations: jnp.ndarray) -> jnp.ndarray:
        """Batched per-lane feature rotation ([B, H, W, C], i32[B]) — the
        engine's hot path (static permutation takes, no per-lane gathers)."""
        return rot.rotate_planes_batch(feats, rotations, self.spec.board_size)

    def rotate_policy_back_batch(self, policy: jnp.ndarray, rotations: jnp.ndarray) -> jnp.ndarray:
        """Batched per-lane ``rotate_policy_back`` ([B, A], i32[B])."""
        return rot.rotate_action_array_batch(policy, rotations, self.spec.board_size)

    def num_rotations(self) -> int:
        """Number of valid symmetry rotations (1 disables augmentation)."""
        return rot.NUM_ROTATIONS
