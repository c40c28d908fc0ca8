"""Batched rotation helpers == vmapped per-lane rotations (utils/rotation.py).

The engine's hot path uses the static-takes + one-hot-contraction forms;
these must match the table-gather forms (which in turn match the reference's
``getPositionByRotating``, rotation.h:51-93) for every rotation index.
"""

import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.utils import rotation as rot


def test_rotate_planes_batch_matches_vmap():
    n, c, b = 9, 5, 16
    key = jax.random.PRNGKey(0)
    planes = jax.random.uniform(key, (b, n, n, c))
    rotations = jnp.arange(b, dtype=jnp.int32) % rot.NUM_ROTATIONS
    want = jax.vmap(lambda p, r: rot.rotate_planes(p, r, n))(planes, rotations)
    got = rot.rotate_planes_batch(planes, rotations, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_rotate_action_array_batch_matches_vmap():
    n, b = 5, 16
    a = n * n + 1  # board positions + pass
    key = jax.random.PRNGKey(1)
    values = jax.random.uniform(key, (b, a))
    rotations = (jnp.arange(b, dtype=jnp.int32) * 3) % rot.NUM_ROTATIONS
    want = jax.vmap(lambda v, r: rot.rotate_action_array(v, r, n))(values, rotations)
    got = rot.rotate_action_array_batch(values, rotations, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_rotate_roundtrip():
    # rotating features forward and reading the policy back must invert
    n = 3
    board = jnp.arange(n * n, dtype=jnp.float32).reshape(1, n, n, 1)
    for r in range(rot.NUM_ROTATIONS):
        rr = jnp.full((1,), r, jnp.int32)
        rotated = rot.rotate_planes_batch(board, rr, n)
        flat = rotated.reshape(1, n * n)
        back = rot.rotate_action_array_batch(flat, rr, n)
        np.testing.assert_allclose(np.asarray(back[0]), np.arange(n * n, dtype=np.float32))
