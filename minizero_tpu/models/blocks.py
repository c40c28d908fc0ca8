"""Network building blocks.

Flax/NHWC re-design of the reference's PyTorch units
(``minizero/network/py/network_unit.py``): ResidualBlock (2x conv3x3 + BN),
PolicyNetwork (1x1 conv -> FC logits), ValueNetwork (1x1 conv -> FC -> tanh),
DiscreteValueNetwork (softmax bin logits).

NHWC is used throughout (TPU-native layout; XLA maps the 3x3 convs onto the
MXU), versus the reference's NCHW torch layout. BatchNorm uses torch-equivalent
hyperparameters (momentum 0.9 in flax convention == torch 0.1, eps 1e-5).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

# --- torch-default initialization -----------------------------------------
# The reference's trainability at its published learning rates depends on
# torch's default layer init: kaiming_uniform(a=sqrt(5)) == U(+/-1/sqrt(fan_in))
# for kernels AND biases. With flax defaults (lecun_normal, zero bias) the
# k-step MuZero unroll at lr 0.05 falls into a dead-head attractor (policy/
# value head BN gamma collapses, ReLU dies, outputs go constant) that the
# SAME torch model with torch init escapes — verified empirically round 3 by
# training the reference's own muzero_network.py on identical batches with
# both inits (torch init: learns; flax-style init: collapses identically to
# ours). variance_scaling(1/3, fan_in, uniform) == U(+/-1/sqrt(fan_in)).
_TORCH_KERNEL_INIT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _torch_bias_init(fan_in: int):
    lim = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -lim, lim)

    return init


def torch_conv(x, features: int, kernel_size, **kw):
    """nn.Conv with torch-default init (fan_in from the call-site input)."""
    fan_in = int(x.shape[-1]) * kernel_size[0] * kernel_size[1]
    return nn.Conv(features, kernel_size, kernel_init=_TORCH_KERNEL_INIT,
                   bias_init=_torch_bias_init(fan_in), **kw)(x)


def torch_dense(x, features: int):
    """nn.Dense with torch-default init."""
    return nn.Dense(features, kernel_init=_TORCH_KERNEL_INIT,
                    bias_init=_torch_bias_init(int(x.shape[-1])))(x)


class ResidualBlock(nn.Module):
    """reference network_unit.py:6-22"""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool):
        inp = x
        x = torch_conv(x, self.channels, (3, 3), padding="SAME", use_bias=True)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.relu(x)
        x = torch_conv(x, self.channels, (3, 3), padding="SAME", use_bias=True)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return nn.relu(inp + x)


class PolicyHead(nn.Module):
    """reference network_unit.py:25-42: 1x1 conv to ceil(A/(H*W)) channels,
    BN, relu, FC to action logits."""

    height: int
    width: int
    action_size: int

    @nn.compact
    def __call__(self, x, train: bool):
        out_channels = math.ceil(self.action_size / (self.height * self.width))
        x = torch_conv(x, out_channels, (1, 1), use_bias=True)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return torch_dense(x, self.action_size)


class ValueHead(nn.Module):
    """Scalar tanh value head (reference network_unit.py:45-66)."""

    height: int
    width: int
    hidden_channels: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = torch_conv(x, 1, (1, 1), use_bias=True)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = torch_dense(x, self.hidden_channels)
        x = nn.relu(x)
        x = torch_dense(x, 1)
        return jnp.tanh(x)


class DiscreteValueHead(nn.Module):
    """Distributional value/reward head returning bin logits
    (reference network_unit.py:69-87)."""

    height: int
    width: int
    hidden_channels: int
    value_size: int

    @nn.compact
    def __call__(self, x, train: bool):
        out_channels = math.ceil(self.value_size / (self.height * self.width))
        x = torch_conv(x, out_channels, (1, 1), use_bias=True)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = torch_dense(x, self.hidden_channels)
        x = nn.relu(x)
        return torch_dense(x, self.value_size)


@jax.custom_vjp
def _minmax_normalize(flat: jnp.ndarray) -> jnp.ndarray:
    """Per-row (x - min) / guarded(max - min).

    Custom VJP for two reasons. (1) Correctness: jax's native min/max VJP
    (tie-distributed via eq-masks) emits NaN gradients when fused into the
    representation conv/BN backward under jit (observed on CPU XLA: grads
    finite eagerly, NaN jitted). (2) Reference parity: torch's min/max
    backward scatters into the SINGLE arg index (muzero_network.py:154-164
    backprops through tensor.min/max), which is what this VJP implements —
    as one-hot iota selects, not per-lane gathers (TPU-hostile, CLAUDE.md).
    """
    mn = jnp.min(flat, axis=-1, keepdims=True)
    mx = jnp.max(flat, axis=-1, keepdims=True)
    s = mx - mn
    s = jnp.where(s < 1e-5, s + 1e-5, s)
    return (flat - mn) / s


def _minmax_normalize_fwd(flat):
    mn = jnp.min(flat, axis=-1, keepdims=True)
    mx = jnp.max(flat, axis=-1, keepdims=True)
    s = mx - mn
    s = jnp.where(s < 1e-5, s + 1e-5, s)
    y = (flat - mn) / s
    amin = jnp.argmin(flat, axis=-1, keepdims=True)
    amax = jnp.argmax(flat, axis=-1, keepdims=True)
    return y, (y, s, amin, amax)


def _minmax_normalize_bwd(res, gy):
    y, s, amin, amax = res
    k = y.shape[-1]
    iota = jnp.arange(k)
    e_min = (iota == amin).astype(gy.dtype)  # one-hot [B, K]
    e_max = (iota == amax).astype(gy.dtype)
    # y = (x - mn)/s with mn = x[amin], s = x[amax] - x[amin]:
    #   x̄ = ȳ/s − e_min·Σȳ/s − (e_max − e_min)·Σ(ȳ·y)/s
    gsum = jnp.sum(gy, axis=-1, keepdims=True)
    gysum = jnp.sum(gy * y, axis=-1, keepdims=True)
    gx = (gy - e_min * gsum - (e_max - e_min) * gysum) / s
    return (gx,)


_minmax_normalize.defvjp(_minmax_normalize_fwd, _minmax_normalize_bwd)


def scale_hidden_state(hidden_state: jnp.ndarray) -> jnp.ndarray:
    """Min-max scale each sample's hidden state to [0, 1]
    (reference muzero_network.py:154-164)."""
    b = hidden_state.shape[0]
    flat = hidden_state.reshape(b, -1)
    return _minmax_normalize(flat).reshape(hidden_state.shape)
