"""8-fold dihedral board symmetry.

TPU-native counterpart of the reference's ``minizero/utils/rotation.h``: the
same 8 rotations (identity, 90/180/270, and their horizontal mirrors), but
materialised as static int32 permutation tables so rotations become pure
gathers — vmappable / jittable and fused by XLA into the surrounding feature
assembly, instead of the reference's per-scalar ``getPositionByRotating`` calls
(``rotation.h:51-93``).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

NUM_ROTATIONS = 8

# Index of the inverse rotation (reference ``rotation.h:21-29``).
REVERSED_ROTATION = np.array([0, 3, 2, 1, 4, 5, 6, 7], dtype=np.int32)


def _rotate_xy(rotation: int, x: np.ndarray, y: np.ndarray):
    if rotation == 0:
        return x, y
    if rotation == 1:
        return y, -x
    if rotation == 2:
        return -x, -y
    if rotation == 3:
        return -y, x
    if rotation == 4:
        return x, -y
    if rotation == 5:
        return -y, -x
    if rotation == 6:
        return -x, y
    if rotation == 7:
        return y, x
    raise ValueError(f"bad rotation {rotation}")


@functools.lru_cache(maxsize=None)
def position_rotation_table(board_size: int) -> np.ndarray:
    """``table[r, pos] = rotated position`` for all 8 rotations.

    Matches ``getPositionByRotating`` (reference ``rotation.h:51-93``); the
    out-of-board "pass" position ``board_size**2`` maps to itself.
    """
    n = board_size
    pos = np.arange(n * n)
    center = (n - 1) / 2.0
    x = pos % n - center
    y = pos // n - center
    table = np.zeros((NUM_ROTATIONS, n * n + 1), dtype=np.int32)
    for r in range(NUM_ROTATIONS):
        rx, ry = _rotate_xy(r, x, y)
        table[r, : n * n] = np.round((ry + center) * n + (rx + center)).astype(np.int32)
        table[r, n * n] = n * n  # pass action is rotation-invariant
    return table


@functools.lru_cache(maxsize=None)
def action_rotation_table(board_size: int, action_size: int) -> np.ndarray:
    """``table[r, action] = rotated action`` for board games whose action ids
    are board positions (+ optional trailing pass)."""
    n = board_size
    table = np.tile(np.arange(action_size, dtype=np.int32), (NUM_ROTATIONS, 1))
    pos_table = position_rotation_table(n)
    m = min(action_size, n * n + 1)
    table[:, :m] = pos_table[:, :m]
    return table


def rotate_planes(planes: jnp.ndarray, rotation: jnp.ndarray, board_size: int) -> jnp.ndarray:
    """Rotate feature planes of shape ``[..., H, W, C]`` by ``rotation``
    (traced int32 scalar).

    Uses the *inverse* permutation gather: output position ``p`` reads input
    position ``table[rev(r), p]`` — matching the reference feature rotation
    convention (``tictactoe.cpp:75``: read board at reversed-rotation of pos).
    """
    table = jnp.asarray(position_rotation_table(board_size)[:, : board_size * board_size])
    rev = jnp.asarray(REVERSED_ROTATION)
    perm = table[rev[rotation]]  # [H*W]
    h, w, c = planes.shape[-3:]
    flat = planes.reshape(planes.shape[:-3] + (h * w, c))
    rotated = jnp.take(flat, perm, axis=-2)
    return rotated.reshape(planes.shape)


def rotate_planes_batch(planes: jnp.ndarray, rotations: jnp.ndarray, board_size: int) -> jnp.ndarray:
    """Per-lane rotation of ``[B, H, W, C]`` planes by ``rotations`` i32[B].

    TPU-friendly form of ``vmap(rotate_planes)``: a per-lane dynamic gather
    costs ~0.5ms per b=1024 call on TPU, so instead take all 8 STATIC
    permutations at once (constant indices — a layout copy) and contract
    with the rotation one-hot (24 MFLOP)."""
    nn = board_size * board_size
    table = position_rotation_table(board_size)[:, :nn]
    rev_table = table[REVERSED_ROTATION]  # feature rotation reads the inverse
    b, h, w, c = planes.shape
    flat = planes.reshape(b, nn, c)
    allp = jnp.take(flat, jnp.asarray(rev_table.reshape(-1)), axis=1)
    allp = allp.reshape(b, NUM_ROTATIONS, nn, c)
    oh = (rotations[:, None] == jnp.arange(NUM_ROTATIONS, dtype=rotations.dtype)).astype(planes.dtype)
    return jnp.einsum("br,brpc->bpc", oh, allp).reshape(planes.shape)


def rotate_action_array_batch(values: jnp.ndarray, rotations: jnp.ndarray, board_size: int) -> jnp.ndarray:
    """Per-lane ``rotate_action_array`` over ``[B, A]`` (same static-takes +
    one-hot contraction trick as ``rotate_planes_batch``)."""
    a = values.shape[-1]
    table = action_rotation_table(board_size, a)
    allv = jnp.take(values, jnp.asarray(table.reshape(-1)), axis=-1)
    allv = allv.reshape(values.shape[:-1] + (NUM_ROTATIONS, a))
    oh = (rotations[:, None] == jnp.arange(NUM_ROTATIONS, dtype=rotations.dtype)).astype(values.dtype)
    return jnp.einsum("br,bra->ba", oh, allv)


def rotate_action_array(values: jnp.ndarray, rotation: jnp.ndarray, board_size: int) -> jnp.ndarray:
    """Map a per-action vector ``[..., A]`` through the rotation so that
    ``out[a] = values[rotate(a)]`` (used to un-rotate a policy produced from
    rotated features, reference ``zero_actor.cpp:222-223``)."""
    a = values.shape[-1]
    table = jnp.asarray(action_rotation_table(board_size, a))
    perm = table[rotation]
    return jnp.take(values, perm, axis=-1)
