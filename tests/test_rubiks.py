"""Rubik's cube tests: group-theory invariants on the extracted permutations
plus protocol checks (reference rubiks.cpp semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.rubiks import RubiksEnv

_ENV3 = RubiksEnv(board_size=3, scramble=5)


def test_rotation_then_prime_is_identity():
    env = _ENV3
    s = env.init()
    for face in range(6):
        s1 = env.step(s, jnp.int32(face))
        s2 = env.step(s1, jnp.int32(face + 6))  # prime undoes
        np.testing.assert_array_equal(np.asarray(s2.stickers), np.asarray(s.stickers))


def test_four_quarter_turns_identity():
    env = _ENV3
    s = env.init()
    for face in range(6):
        t = s
        for _ in range(4):
            t = env.step(t, jnp.int32(face))
        np.testing.assert_array_equal(np.asarray(t.stickers), np.asarray(s.stickers))


def test_rotation_preserves_colour_counts_and_centers():
    env = _ENV3
    s = env.init()
    rng = np.random.RandomState(0)
    for _ in range(20):
        s = env.step(s, jnp.int32(rng.randint(12)))
    stickers = np.asarray(s.stickers)
    # 9 stickers of each colour always
    for c in range(6):
        assert (stickers == c).sum() == 9
    # face centers never move on a 3x3 (outer-layer rotations only)
    centers = stickers.reshape(6, 3, 3)[:, 1, 1]
    np.testing.assert_array_equal(centers, np.arange(6))


def test_scramble_and_terminal():
    env = _ENV3
    s = env.init()
    assert bool(env.is_terminal(s))  # solved at init -> terminal
    assert float(env.eval_score(s)) == 1.0
    sr = env.init_random(jax.random.PRNGKey(3))
    assert not np.array_equal(np.asarray(sr.stickers), np.asarray(s.stickers))
    assert not bool(env.is_terminal(sr))
    assert float(env.eval_score(sr)) == -1.0
    # move cap
    t = sr
    for i in range(30):
        t = env.step(t, jnp.int32(0))
    assert bool(env.is_terminal(t))


def test_scramble_is_solvable_by_inverse():
    env = _ENV3
    rng = jax.random.PRNGKey(7)
    actions = np.asarray(jax.random.randint(rng, (env.scramble,), 0, env.num_actions))
    s = env.init_random(rng)
    # undo in reverse with primes
    for a in actions[::-1]:
        inv = (int(a) + 6) % 12 + (int(a) // 12) * 12
        s = env.step(s, jnp.int32(inv))
    assert bool(env._solved_now(s))


def test_features_shape():
    env = _ENV3
    f = np.asarray(env.features(env.init()))
    assert f.shape == (18, 3, 6)
    assert f.sum() == 54  # one-hot per sticker
    # solved cube: face f is colour f
    assert (f.reshape(6, 3, 3, 6)[np.arange(6), :, :, np.arange(6)] == 1).all()


def test_two_by_two():
    env = RubiksEnv(board_size=2, scramble=3)
    assert env.spec.action_size == 12
    s = env.init_random(jax.random.PRNGKey(0))
    s2 = env.step(s, jnp.int32(5))
    assert np.asarray(s2.stickers).shape == (24,)
