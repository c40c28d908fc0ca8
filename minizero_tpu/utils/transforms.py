"""Value transforms and distributional (two-hot) value coding.

Reference semantics: ``minizero/utils/utils.h:93-108`` (the MuZero value
transform, from "Observe and Look Further", used for Atari) and
``minizero/environment/atari/atari.cpp:279-294`` (601-bin two-hot encoding).
All vectorised jittable jnp ops here (the reference computes them per scalar
on the CPU).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 0.001


def transform_value(value: jnp.ndarray) -> jnp.ndarray:
    """h(x) = sign(x)(sqrt(|x|+1)-1) + eps*x (reference utils.h:93-100)."""
    return jnp.sign(value) * (jnp.sqrt(jnp.abs(value) + 1.0) - 1.0) + _EPS * value


def invert_value(value: jnp.ndarray) -> jnp.ndarray:
    """h^-1(x) (reference utils.h:102-108)."""
    inner = (jnp.sqrt(1.0 + 4.0 * _EPS * (jnp.abs(value) + 1.0 + _EPS)) - 1.0) / (2.0 * _EPS)
    return jnp.sign(value) * (inner * inner - 1.0)


def to_discrete_value(value: jnp.ndarray, value_size: int) -> jnp.ndarray:
    """Two-hot encode ``value`` (already h-transformed) into ``value_size``
    bins centred on 0 (reference atari.cpp:279-294). value: [...] ->
    [..., value_size]."""
    shift = value_size // 2
    floor = jnp.floor(value)
    ceil = jnp.ceil(value)
    floor_idx = jnp.clip(floor.astype(jnp.int32) + shift, 0, value_size - 1)
    ceil_idx = jnp.clip(ceil.astype(jnp.int32) + shift, 0, value_size - 1)
    same = floor == ceil
    w_floor = jnp.where(same, 1.0, ceil - value)
    w_ceil = jnp.where(same, 0.0, value - floor)
    oh_f = jnp.equal(jnp.arange(value_size), floor_idx[..., None]).astype(jnp.float32)
    oh_c = jnp.equal(jnp.arange(value_size), ceil_idx[..., None]).astype(jnp.float32)
    return oh_f * w_floor[..., None] + oh_c * w_ceil[..., None]


def from_discrete_value(probs: jnp.ndarray) -> jnp.ndarray:
    """Expectation over bins then h^-1 (reference
    ``alphazero_network.h:85-95`` / ``muzero_network.h:124-178``).
    probs: [..., value_size] -> [...]."""
    value_size = probs.shape[-1]
    support = jnp.arange(value_size, dtype=jnp.float32) - value_size // 2
    expectation = jnp.sum(probs * support, axis=-1)
    return invert_value(expectation)
