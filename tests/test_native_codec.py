"""Native record codec tests: C++ vs Python parity and fallback."""

import numpy as np
import pytest

from minizero_tpu import native
from minizero_tpu.learner.replay import GameRecord
from minizero_tpu.selfplay.record import game_record_from_string, serialize_game


def _random_record(seed=0, length=40, action_size=82):
    rng = np.random.RandomState(seed)
    pol = np.zeros((length, action_size), np.float32)
    for i in range(length):
        idx = rng.choice(action_size, 4, replace=False)
        w = rng.rand(4)
        pol[i, idx] = (w / w.sum()).astype(np.float32)
    return GameRecord(
        actions=rng.randint(0, action_size, length).astype(np.int32),
        policy=pol.astype(np.float16),
        values=rng.randn(length).astype(np.float32),
        rewards=rng.rand(length).astype(np.float32),
        features=np.zeros((length, 1, 1, 1), np.uint8),
        result=-1.0,
    )


def test_native_library_builds():
    assert native.load() is not None, "g++ toolchain should build the codec"


def test_serialize_parse_round_trip():
    rec = _random_record()
    players = tuple((i % 2) + 1 for i in range(rec.length))
    line = serialize_game("go_9x9", rec, 9, players)
    assert line.startswith("(;GM[go_9x9]")
    tags, rec2 = game_record_from_string(line, 82)
    np.testing.assert_array_equal(rec.actions, rec2.actions)
    np.testing.assert_allclose(rec.values, rec2.values, rtol=2e-4)
    np.testing.assert_allclose(rec.rewards, rec2.rewards, rtol=2e-4)
    assert tags["RE"] == "-1"


def test_native_parse_matches_serialize():
    rec = _random_record(seed=3)
    players = tuple((i % 2) + 1 for i in range(rec.length))
    moves = native.serialize_moves(
        rec.actions, np.asarray(players, np.int8),
        rec.policy.astype(np.float32), rec.values, rec.rewards,
    )
    assert moves is not None
    out = native.parse_moves(moves, rec.length + 8, 82)
    assert out is not None
    acts, plys, pol, vals, rews = out
    np.testing.assert_array_equal(acts, rec.actions)
    np.testing.assert_array_equal(plys, np.asarray(players, np.int8))
    # sparse policy survives with float32 text precision
    np.testing.assert_allclose(pol, rec.policy.astype(np.float32), atol=2e-4)


def test_python_fallback_matches_native(monkeypatch):
    rec = _random_record(seed=5, length=10)
    players = tuple((i % 2) + 1 for i in range(rec.length))
    line_native = serialize_game("othello", rec, 8, players)
    monkeypatch.setattr(native, "serialize_moves", lambda *a, **k: None)
    line_python = serialize_game("othello", rec, 8, players)
    # parse both; targets must agree
    _, ra = game_record_from_string(line_native, 82)
    _, rb = game_record_from_string(line_python, 82)
    np.testing.assert_array_equal(ra.actions, rb.actions)
    np.testing.assert_allclose(ra.values, rb.values, rtol=1e-5)
