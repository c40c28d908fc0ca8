"""Bit-packed feature planes: exact roundtrip on synthetic masks and on a
real env's feature planes (device pack -> train-side unpack)."""

import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.utils.bitpack import (
    pack_planes,
    pack_planes_np,
    packed_channels,
    unpack_planes,
)


def test_roundtrip_random_masks():
    rng = np.random.default_rng(0)
    for shape in [(4, 9, 9, 18), (2, 5, 5, 8), (3, 3, 3, 1), (2, 4, 4, 24)]:
        x = rng.integers(0, 2, shape).astype(np.float32)
        packed = np.asarray(pack_planes(jnp.asarray(x)))
        assert packed.shape == shape[:-1] + (packed_channels(shape[-1]),)
        assert packed.dtype == np.uint8
        back = np.asarray(unpack_planes(jnp.asarray(packed), shape[-1]))
        np.testing.assert_array_equal(back, x)
        np.testing.assert_array_equal(pack_planes_np(x), packed)


def test_roundtrip_go_features():
    from minizero_tpu.config import default_config
    from minizero_tpu.envs import make_env

    cfg = default_config("go", env_board_size=5)
    env = make_env(cfg)
    assert env.spec.binary_features
    state = env.init()
    rng = jax.random.PRNGKey(0)
    for _ in range(6):
        feats = env.features(state)
        assert set(np.unique(np.asarray(feats))) <= {0.0, 1.0}
        packed = pack_planes(feats)
        back = np.asarray(unpack_planes(packed, feats.shape[-1]))
        np.testing.assert_array_equal(back, np.asarray(feats))
        rng, k = jax.random.split(rng)
        legal = np.flatnonzero(np.asarray(env.legal_mask(state)))
        a = int(legal[int(jax.random.randint(k, (), 0, len(legal)))])
        state = env.step(state, jnp.int32(a))
