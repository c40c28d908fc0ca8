"""AlphaZero network (reference ``minizero/network/py/alphazero_network.py``).

Conv stem + N residual blocks + policy/value heads; returns
``{policy_logit, policy, value[, value_logit]}`` exactly like the reference's
forward (``alphazero_network.py:90-113``), in NHWC on TPU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from minizero_tpu.models.blocks import (
    DiscreteValueHead, PolicyHead, ResidualBlock, ValueHead, torch_conv)


class AlphaZeroNetwork(nn.Module):
    num_input_channels: int
    input_height: int
    input_width: int
    num_hidden_channels: int
    hidden_height: int
    hidden_width: int
    num_blocks: int
    action_size: int
    num_value_hidden_channels: int
    discrete_value_size: int = 1

    @nn.compact
    def __call__(self, state, train: bool = False):
        """state: f32[B, H, W, C_in] -> dict of outputs."""
        x = torch_conv(state, self.num_hidden_channels, (3, 3), padding="SAME", use_bias=True)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.relu(x)
        for _ in range(self.num_blocks):
            x = ResidualBlock(self.num_hidden_channels)(x, train)

        policy_logit = PolicyHead(self.hidden_height, self.hidden_width, self.action_size)(x, train)
        policy = nn.softmax(policy_logit, axis=-1)

        if self.discrete_value_size == 1:
            value = ValueHead(self.hidden_height, self.hidden_width, self.num_value_hidden_channels)(x, train)
            return {"policy_logit": policy_logit, "policy": policy, "value": value}
        value_logit = DiscreteValueHead(
            self.hidden_height, self.hidden_width, self.num_value_hidden_channels, self.discrete_value_size
        )(x, train)
        return {
            "policy_logit": policy_logit,
            "policy": policy,
            "value_logit": value_logit,
            "value": nn.softmax(value_logit, axis=-1),
        }
