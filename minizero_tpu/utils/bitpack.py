"""Bit-packing for binary feature planes.

Board-game feature planes are 0/1 masks (stone/turn/history planes), so a
[.., H, W, C] u8 tensor carries 8x redundancy — material on the device ->
host path, where the self-play record stream moves ~1.5 KB/move of Go9
features over a ~6 MB/s tunnel. Packing 8 planes per byte on device cuts
the transfer (and replay-buffer RAM) 8x; training unpacks on device,
outside the conv-grad graph (see ZeroLoop._feat_cast).

Atari frames are true 8-bit pixels and are never packed
(``EnvSpec.binary_features = False``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def packed_channels(channels: int) -> int:
    return -(-channels // 8)


def pack_planes(x: jnp.ndarray) -> jnp.ndarray:
    """[.., C] binary (0/1) values -> u8 [.., ceil(C/8)], bit k of byte j =
    plane 8*j + k. Device-side (jittable)."""
    c = x.shape[-1]
    pc = packed_channels(c)
    pad = pc * 8 - c
    bits = (x > 0).astype(jnp.uint8)
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), jnp.uint8)], axis=-1)
    bits = bits.reshape(bits.shape[:-1] + (pc, 8))
    shifts = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return jnp.sum(bits * shifts, axis=-1).astype(jnp.uint8)


def unpack_planes(packed: jnp.ndarray, channels: int) -> jnp.ndarray:
    """u8 [.., ceil(C/8)] -> f32 [.., C] of 0/1 planes. Device-side."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    bits = bits.reshape(bits.shape[:-2] + (bits.shape[-2] * 8,))
    return bits[..., :channels].astype(jnp.float32)


def pack_planes_np(x: np.ndarray) -> np.ndarray:
    """Host mirror of ``pack_planes`` (resume-path feature rebuilds)."""
    c = x.shape[-1]
    pc = packed_channels(c)
    pad = pc * 8 - c
    bits = (np.asarray(x) > 0).astype(np.uint8)
    if pad:
        bits = np.concatenate(
            [bits, np.zeros(bits.shape[:-1] + (pad,), np.uint8)], axis=-1)
    bits = bits.reshape(bits.shape[:-1] + (pc, 8))
    return np.packbits(bits, axis=-1, bitorder="little")[..., 0]
