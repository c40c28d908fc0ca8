"""End-to-end training smoke tests — the reference's integration check is
``quick-run.sh train tictactoe az`` (docs/Training.md:22-23); here a miniature
iteration must run and reduce the loss."""

import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.config import default_config
from minizero_tpu.envs import make_env
from minizero_tpu.learner.replay import GameRecord, ReplayBuffer
from minizero_tpu.learner.train import init_train_state, make_train_step
from minizero_tpu.models.factory import create_network, init_network
from minizero_tpu.selfplay.record import game_record_from_string, serialize_game
from minizero_tpu.zero.loop import ZeroLoop, temperature_for_iteration


def tiny_cfg(**overrides):
    base = dict(
        nn_num_blocks=1,
        nn_num_hidden_channels=8,
        nn_num_value_hidden_channels=8,
        actor_num_simulation=8,
        learner_batch_size=16,
        learner_training_step=10,
        learner_training_display_step=5,
        zero_num_games_per_iteration=8,
        zero_num_parallel_games=8,
        zero_end_iteration=1,
    )
    base.update(overrides)
    return default_config("tictactoe", **base)


def random_game_record(rng, env, length=5):
    spec = env.spec
    actions = rng.randint(0, spec.action_size, size=length).astype(np.int32)
    policy = rng.rand(length, spec.action_size).astype(np.float32)
    policy /= policy.sum(-1, keepdims=True)
    feats = (rng.rand(length, spec.input_height, spec.input_width, spec.num_input_channels) > 0.5).astype(np.uint8)
    return GameRecord(
        actions=actions,
        policy=policy.astype(np.float16),
        values=rng.randn(length).astype(np.float32),
        rewards=np.zeros(length, np.float32),
        features=feats,
        result=float(rng.choice([-1.0, 0.0, 1.0])),
    )


def test_replay_buffer_sampling():
    cfg = tiny_cfg()
    env = make_env(cfg)
    buf = ReplayBuffer(cfg, env.spec)
    rng = np.random.RandomState(0)
    for _ in range(5):
        buf.add_game(random_game_record(rng, env))
    batch = buf.sample_alphazero(16, rng)
    assert batch["features"].shape == (16, 3, 3, 4)
    assert batch["policy"].shape == (16, 9)
    assert batch["value"].shape == (16,)
    np.testing.assert_allclose(batch["policy"].sum(-1), 1.0, rtol=1e-3)


def test_replay_buffer_capacity():
    cfg = tiny_cfg(zero_replay_buffer=1, zero_num_games_per_iteration=3)
    env = make_env(cfg)
    buf = ReplayBuffer(cfg, env.spec)
    rng = np.random.RandomState(0)
    for _ in range(10):
        buf.add_game(random_game_record(rng, env))
    assert len(buf) == 3


def test_train_step_reduces_loss():
    cfg = tiny_cfg()
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))
    state = init_train_state(cfg, variables)
    step = jax.jit(make_train_step(cfg, env, net))
    rng = np.random.RandomState(0)
    buf = ReplayBuffer(cfg, env.spec)
    for _ in range(4):
        buf.add_game(random_game_record(rng, env, length=7))
    batch = buf.sample_alphazero(cfg.learner_batch_size, rng)
    batch.pop("sampled_index")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    first = None
    for i in range(30):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))  # same rotation seed -> same effective batch
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    assert int(state.step) == 30


def test_muzero_train_step_runs():
    cfg = tiny_cfg(nn_type_name="muzero", learner_muzero_unrolling_step=2)
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))
    state = init_train_state(cfg, variables)
    step = jax.jit(make_train_step(cfg, env, net))
    rng = np.random.RandomState(0)
    buf = ReplayBuffer(cfg, env.spec)
    for _ in range(4):
        buf.add_game(random_game_record(rng, env, length=6))
    batch = buf.sample_muzero(cfg.learner_batch_size, rng)
    batch.pop("sampled_index")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert "loss_policy" in metrics and "loss_value" in metrics


def test_record_roundtrip():
    cfg = tiny_cfg()
    env = make_env(cfg)
    rng = np.random.RandomState(3)
    rec = random_game_record(rng, env, length=4)
    players = (1, 2, 1, 2)
    text = serialize_game("tictactoe", rec, 3, players, model_file="weight_iter_0")
    assert text.startswith("(;GM[tictactoe]")
    tags, parsed = game_record_from_string(text, env.spec.action_size)
    assert tags["GM"] == "tictactoe"
    np.testing.assert_array_equal(parsed.actions, rec.actions)
    assert parsed.result == rec.result
    np.testing.assert_allclose(
        parsed.policy.astype(np.float32), rec.policy.astype(np.float32), atol=2e-3
    )


def test_temperature_decay():
    cfg = tiny_cfg(actor_select_action_softmax_temperature_decay=True, zero_end_iteration=100)
    assert temperature_for_iteration(cfg, 10) == 1.0
    assert temperature_for_iteration(cfg, 60) == 0.5
    assert temperature_for_iteration(cfg, 90) == 0.25


def test_zero_loop_iteration(tmp_path):
    """One miniature full iteration: self-play -> train -> checkpoint."""
    cfg = tiny_cfg()
    loop = ZeroLoop(cfg, str(tmp_path))
    loop.run()
    assert (tmp_path / "sgf" / "1.sgf").exists()
    lines = (tmp_path / "sgf" / "1.sgf").read_text().strip().splitlines()
    assert len(lines) >= cfg.zero_num_games_per_iteration
    assert (tmp_path / "model" / f"weight_iter_{int(loop.state.step)}.ckpt").exists()
    assert int(loop.state.step) == cfg.learner_training_step
    # resume: load the checkpoint back
    loop2 = ZeroLoop(cfg, str(tmp_path))
    loop2.load_checkpoint(str(tmp_path / "model" / f"weight_iter_{int(loop.state.step)}.ckpt"))
    assert int(loop2.state.step) == cfg.learner_training_step


def test_per_flat_sampling_distribution_and_updates():
    """Vectorized PER: flat searchsorted sampling must follow the two-level
    priority distribution (reference data_loader.cpp:53-74), update_priority
    must rescale future draws, and refresh_priorities must match the
    |target − value| + eps rule."""
    cfg = tiny_cfg(learner_use_per=True, learner_per_alpha=1.0,
                   learner_per_init_beta=1.0)
    env = make_env(cfg)
    buf = ReplayBuffer(cfg, env.spec)
    rng = np.random.RandomState(3)
    for _ in range(4):
        rec = random_game_record(rng, env, length=6)
        rec.priorities = rng.rand(6).astype(np.float32) + 0.05
        buf.add_game(rec)

    # empirical frequency tracks p = pri / total
    draws = 40000
    g, p, scale = buf.sample_indices(draws, rng)
    flat = g * 6 + p
    counts = np.bincount(flat, minlength=24).astype(np.float64) / draws
    pri = np.concatenate([buf.position_priorities[i] for i in range(4)])
    expect = pri / pri.sum()
    np.testing.assert_allclose(counts, expect, atol=0.01)
    # importance weights: (N p)^-beta normalized by batch max
    probs = pri[flat] / pri.sum()
    want = (buf.num_data * probs) ** -1.0
    np.testing.assert_allclose(scale, want / want.max(), rtol=1e-5)

    # update_priority: zero out one game -> it stops being sampled
    idx = np.stack([np.full(6, 1), np.arange(6)], axis=1)
    buf.update_priority(idx, np.full(6, 1e-12))
    g2, _, _ = buf.sample_indices(4000, rng)
    assert (g2 == 1).sum() == 0

    # refresh_priorities: board-game target is the game result
    idx3 = np.stack([np.full(3, 2), np.arange(3)], axis=1)
    buf.refresh_priorities(idx3, np.array([0.0, 0.5, -0.5], np.float32))
    res = buf.games[2].result
    want3 = np.abs(np.array([res, res - 0.5, res + 0.5])) + 1e-6
    np.testing.assert_allclose(buf.position_priorities[2][:3], want3, rtol=1e-5)
    # game priority stays the sum of position priorities
    np.testing.assert_allclose(buf.game_priorities[2],
                               buf.position_priorities[2].sum(), rtol=1e-6)

    # the window can slide after updates without corrupting the flat cache
    for _ in range(2):
        rec = random_game_record(rng, env, length=6)
        rec.priorities = rng.rand(6).astype(np.float32) + 0.05
        buf.add_game(rec)
    g4, p4, _ = buf.sample_indices(64, rng)
    assert (p4 < 6).all() and (g4 < len(buf.games)).all()
