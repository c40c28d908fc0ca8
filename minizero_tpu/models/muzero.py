"""MuZero networks (reference ``minizero/network/py/muzero_network.py`` and
``muzero_atari_network.py``).

Representation / dynamics / prediction with ``initial_inference`` and
``recurrent_inference`` entry points, hidden-state min-max scaling, and — for
the Atari variant — a stride-2 downsampling representation (96 -> 6) plus
distributional value & reward heads.

Flax modules expose the sub-networks via ``method=`` dispatch so the self-play
engine jits ``initial_inference`` / ``recurrent_inference`` separately (the
reference exports them as TorchScript methods, ``muzero_network.py:136-152``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from minizero_tpu.models.blocks import (
    DiscreteValueHead,
    PolicyHead,
    ResidualBlock,
    ValueHead,
    scale_hidden_state,
    torch_conv,
)


class _Representation(nn.Module):
    """reference muzero_network.py:7-20"""

    channels: int
    num_blocks: int

    @nn.compact
    def __call__(self, state, train: bool):
        x = torch_conv(state, self.channels, (3, 3), padding="SAME", use_bias=True)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.relu(x)
        for _ in range(self.num_blocks):
            x = ResidualBlock(self.channels)(x, train)
        return x


class _AtariRepresentation(nn.Module):
    """Downsampling representation: stride-2 convs + avg pools, 96 -> 6
    (reference muzero_atari_network.py:10-39)."""

    channels: int
    num_blocks: int

    @nn.compact
    def __call__(self, state, train: bool):
        x = torch_conv(state, self.channels // 2, (3, 3), strides=(2, 2), padding="SAME", use_bias=True)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.relu(x)
        x = ResidualBlock(self.channels // 2)(x, train)
        x = torch_conv(x, self.channels, (3, 3), strides=(2, 2), padding="SAME", use_bias=True)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.relu(x)
        x = ResidualBlock(self.channels)(x, train)
        x = nn.avg_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = ResidualBlock(self.channels)(x, train)
        x = nn.avg_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for _ in range(self.num_blocks):
            x = ResidualBlock(self.channels)(x, train)
        return x


class _Dynamics(nn.Module):
    """reference muzero_network.py:23-37; with optional reward head for the
    Atari variant (muzero_atari_network.py:43-59)."""

    channels: int
    num_blocks: int
    height: int
    width: int
    reward_size: int = 0  # 0 = no reward head (board games)

    @nn.compact
    def __call__(self, hidden_state, action_plane, train: bool):
        x = jnp.concatenate([hidden_state, action_plane], axis=-1)
        x = torch_conv(x, self.channels, (3, 3), padding="SAME", use_bias=True)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.relu(x)
        for _ in range(self.num_blocks):
            x = ResidualBlock(self.channels)(x, train)
        if self.reward_size > 0:
            reward_logit = DiscreteValueHead(self.height, self.width, self.channels, self.reward_size)(x, train)
            return x, reward_logit
        return x, None


class _Prediction(nn.Module):
    """reference muzero_network.py:40-50 / muzero_atari_network.py:62-72"""

    channels: int
    height: int
    width: int
    action_size: int
    num_value_hidden_channels: int
    discrete_value_size: int

    @nn.compact
    def __call__(self, hidden_state, train: bool):
        policy_logit = PolicyHead(self.height, self.width, self.action_size)(hidden_state, train)
        if self.discrete_value_size == 1:
            value = ValueHead(self.height, self.width, self.num_value_hidden_channels)(hidden_state, train)
            return policy_logit, value, None
        value_logit = DiscreteValueHead(
            self.height, self.width, self.num_value_hidden_channels, self.discrete_value_size
        )(hidden_state, train)
        return policy_logit, nn.softmax(value_logit, axis=-1), value_logit


class MuZeroNetwork(nn.Module):
    """Board-game MuZero (``atari_mode=False``) and MuZero-Atari
    (``atari_mode=True``) in one module; the factory picks the mode like the
    reference's ``create_network.py:6-63``."""

    num_input_channels: int
    input_height: int
    input_width: int
    num_hidden_channels: int
    hidden_height: int
    hidden_width: int
    num_action_feature_channels: int
    num_blocks: int
    action_size: int
    num_value_hidden_channels: int
    discrete_value_size: int = 1
    atari_mode: bool = False

    def setup(self):
        if self.atari_mode:
            self.representation = _AtariRepresentation(self.num_hidden_channels, self.num_blocks)
        else:
            self.representation = _Representation(self.num_hidden_channels, self.num_blocks)
        self.dynamics = _Dynamics(
            self.num_hidden_channels,
            self.num_blocks,
            self.hidden_height,
            self.hidden_width,
            reward_size=self.discrete_value_size if self.atari_mode else 0,
        )
        self.prediction = _Prediction(
            self.num_hidden_channels,
            self.hidden_height,
            self.hidden_width,
            self.action_size,
            self.num_value_hidden_channels,
            self.discrete_value_size,
        )

    def initial_inference(self, state, train: bool = False):
        """representation + prediction (reference muzero_network.py:136-143)."""
        hidden = self.representation(state, train)
        hidden = scale_hidden_state(hidden)
        policy_logit, value, value_logit = self.prediction(hidden, train)
        out = {
            "policy_logit": policy_logit,
            "policy": nn.softmax(policy_logit, axis=-1),
            "value": value,
            "hidden_state": hidden,
        }
        if value_logit is not None:
            out["value_logit"] = value_logit
        return out

    def recurrent_inference(self, hidden_state, action_plane, train: bool = False):
        """dynamics + prediction (reference muzero_network.py:145-152)."""
        next_hidden, reward_logit = self.dynamics(hidden_state, action_plane, train)
        next_hidden = scale_hidden_state(next_hidden)
        policy_logit, value, value_logit = self.prediction(next_hidden, train)
        out = {
            "policy_logit": policy_logit,
            "policy": nn.softmax(policy_logit, axis=-1),
            "value": value,
            "hidden_state": next_hidden,
        }
        if value_logit is not None:
            out["value_logit"] = value_logit
        if reward_logit is not None:
            out["reward_logit"] = reward_logit
            out["reward"] = nn.softmax(reward_logit, axis=-1)
        return out

    def __call__(self, state, train: bool = False):
        """Default call = initial inference (used for param init)."""
        return self.initial_inference(state, train)
