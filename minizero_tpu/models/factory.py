"""Network factory (reference ``minizero/network/py/create_network.py:6-63``).

``create_network(cfg, env_spec)`` builds the right Flax module from the config
and env metadata — "alphazero", "muzero", or the Atari MuZero variant when the
env is Atari (the reference keys on ``"atari" in game_name``).

``init_network`` initialises *all* parameter collections (for MuZero this must
touch representation, dynamics, and prediction — the reference gets this for
free from eager torch module construction).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from minizero_tpu.envs.base import EnvSpec
from minizero_tpu.models.alphazero import AlphaZeroNetwork
from minizero_tpu.models.muzero import MuZeroNetwork


def create_network(cfg, spec: EnvSpec):
    nn_type = cfg.nn_type_name.lower()
    if nn_type == "alphazero":
        return AlphaZeroNetwork(
            num_input_channels=spec.num_input_channels,
            input_height=spec.input_height,
            input_width=spec.input_width,
            num_hidden_channels=cfg.nn_num_hidden_channels,
            hidden_height=spec.hidden_height,
            hidden_width=spec.hidden_width,
            num_blocks=cfg.nn_num_blocks,
            action_size=spec.action_size,
            num_value_hidden_channels=cfg.nn_num_value_hidden_channels,
            discrete_value_size=spec.discrete_value_size,
        )
    if nn_type == "muzero":
        return MuZeroNetwork(
            num_input_channels=spec.num_input_channels,
            input_height=spec.input_height,
            input_width=spec.input_width,
            num_hidden_channels=cfg.nn_num_hidden_channels,
            hidden_height=spec.hidden_height,
            hidden_width=spec.hidden_width,
            num_action_feature_channels=spec.num_action_feature_channels,
            num_blocks=cfg.nn_num_blocks,
            action_size=spec.action_size,
            num_value_hidden_channels=cfg.nn_num_value_hidden_channels,
            discrete_value_size=spec.discrete_value_size,
            atari_mode="atari" in spec.name,
        )
    raise ValueError(f"unknown nn_type_name {cfg.nn_type_name!r}")


def init_network(network, spec: EnvSpec, rng: jax.Array) -> Dict[str, Any]:
    """Initialise all variable collections (params + batch_stats)."""
    dummy_state = jnp.zeros((1, spec.input_height, spec.input_width, spec.num_input_channels), jnp.float32)
    if isinstance(network, AlphaZeroNetwork):
        return network.init(rng, dummy_state, train=False)

    # MuZero: run initial + recurrent inference so every sub-network is
    # materialised.
    def init_all(module, state):
        out = module.initial_inference(state, train=False)
        action_plane = jnp.zeros(
            (1, spec.hidden_height, spec.hidden_width, spec.num_action_feature_channels), jnp.float32
        )
        return module.recurrent_inference(out["hidden_state"], action_plane, train=False)

    return network.init(rng, dummy_state, method=init_all)
