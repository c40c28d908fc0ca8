"""Atari host pipeline tests against the FakeALE stub: env semantics,
episode chunking, n-step replay targets, and a device-search drive."""

import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.config import default_config
from minizero_tpu.envs.atari import FRAME_SKIP, AtariEnv, AtariVecEnv, FakeALE
from minizero_tpu.learner.replay import GameRecord, ReplayBuffer
from minizero_tpu.models.factory import create_network, init_network
from minizero_tpu.selfplay.host_engine import (
    AtariTrajectoryCollector,
    HostMoveOutput,
    HostSelfPlayEngine,
)


def _fake_env(seed=0, length=64):
    return AtariEnv(seed=seed, ale_factory=lambda s: FakeALE(seed=s, length=length))


def test_atari_env_protocol():
    env = _fake_env()
    assert env.spec.num_input_channels == 32
    mask = env.legal_mask()
    assert mask.sum() == 4 and mask[:4].all()  # FakeALE minimal set
    f0 = env.features()
    assert f0.shape == (96, 96, 32)
    # only the newest history slot is filled at reset
    assert f0[:, :, : 7 * 4].sum() == 0 and f0[:, :, 29:].sum() > 0
    r = env.step(1)
    assert r == FRAME_SKIP * 1.0  # FakeALE reward = action parity per frame
    f1 = env.features()
    # action plane of the newest slot = 1/18
    assert np.allclose(f1[:, :, 28], 1 / 18)
    assert len(env.actions) == 1 and env.total_reward == r


def test_atari_env_terminates():
    env = _fake_env(length=16)
    steps = 0
    while not env.is_terminal():
        env.step(0)
        steps += 1
    assert steps == 16 // FRAME_SKIP


def test_host_engine_drive():
    cfg = default_config(
        "atari",
        actor_num_simulation=3,
        nn_num_blocks=1,
        nn_num_hidden_channels=8,
        nn_num_value_hidden_channels=8,
        zero_actor_intermediate_sequence_length=4,
        learner_n_step_return=2,
        learner_muzero_unrolling_step=2,
    )
    vec = AtariVecEnv(2, ale_factory=lambda s: FakeALE(seed=s, length=24))
    net = create_network(cfg, vec.spec)
    variables = init_network(net, vec.spec, jax.random.PRNGKey(0))
    engine = HostSelfPlayEngine(vec, cfg, net, use_bf16=False)
    collector = AtariTrajectoryCollector(cfg, vec.spec, 2)
    buffer = ReplayBuffer(cfg, vec.spec)
    rng = jax.random.PRNGKey(1)
    games = 0
    for _ in range(10):
        rng, k = jax.random.split(rng)
        out = engine.move(variables, rng=k)
        finished, reset_slots = collector.add_moves(out)
        for fg in finished:
            buffer.add_game(fg.record)
            games += 1
        vec.reset_done()
        if games >= 3:
            break
    assert games >= 1
    assert len(buffer) >= 1
    # frames schema: records carry single frames (+lead history); the stack
    # is assembled at train time from the frame window, so sample_muzero
    # returns no "features" key (tests/test_frame_window.py checks parity)
    assert buffer.frames_mode
    rec = buffer.games[0]
    assert rec.features is None
    assert rec.frames.shape == (rec.frame_lead + rec.length, 96, 96, 3)
    batch = buffer.sample_muzero(4, np.random.RandomState(0))
    assert "features" not in batch
    assert batch["actions"].shape == (4, cfg.learner_muzero_unrolling_step)


def test_vec_env_ring_matches_per_env_features():
    """The vec env's batched circular ring must reproduce the per-env
    stacked features exactly, across steps and mid-batch resets."""
    rs = np.random.RandomState(5)
    vec = AtariVecEnv(3, ale_factory=lambda s: FakeALE(seed=s, length=12))
    for t in range(9):  # episodes last 3 moves: several reset boundaries
        np.testing.assert_array_equal(
            vec.features_u8(), np.stack([e.features_u8() for e in vec.envs]))
        np.testing.assert_array_equal(
            vec.newest_frames(), np.stack([e.newest_frame() for e in vec.envs]))
        vec.step(rs.randint(0, 4, (3,)))
        vec.reset_done()


def test_host_engine_device_ring_matches_host_features():
    """The search consumes features assembled from the DEVICE frame ring
    (only the newest u8 frame is uploaded per move); they must equal the
    host-side stacked features bit-for-bit across moves AND episode resets."""
    cfg = default_config(
        "atari",
        actor_num_simulation=2,
        nn_num_blocks=1,
        nn_num_hidden_channels=8,
        nn_num_value_hidden_channels=8,
    )
    vec = AtariVecEnv(2, ale_factory=lambda s: FakeALE(seed=s, length=12))
    net = create_network(cfg, vec.spec)
    variables = init_network(net, vec.spec, jax.random.PRNGKey(0))
    engine = HostSelfPlayEngine(vec, cfg, net, use_bf16=False)
    rng = jax.random.PRNGKey(7)
    saw_reset = False
    for _ in range(8):  # episodes last 12/4 = 3 moves -> several resets
        host_feats = vec.features()  # pre-move, f32
        rng, k = jax.random.split(rng)
        engine.move(variables, rng=k)
        dev_feats = np.asarray(
            engine._features_from_ring(engine._ring, engine._ahist))
        np.testing.assert_allclose(dev_feats, host_feats, atol=1e-6)
        if vec.reset_done():
            saw_reset = True
    assert saw_reset


def test_chunking_ranges():
    cfg = default_config(
        "atari",
        zero_actor_intermediate_sequence_length=8,
        learner_n_step_return=2,
        learner_muzero_unrolling_step=2,
    )
    from minizero_tpu.envs.atari import atari_spec

    spec = atari_spec()
    col = AtariTrajectoryCollector(cfg, spec, 1)
    frames = np.zeros((1, 4, 4, 3), np.uint8)  # shapes don't matter to the collector
    chunks = []
    for t in range(30):
        out = HostMoveOutput(
            action=np.array([t % 4]),
            policy_target=np.zeros((1, spec.action_size), np.float32),
            root_value=np.array([0.5]),
            reward=np.array([1.0]),
            frames=frames,
            done=np.array([t == 29]),
            eval_score=np.array([30.0]),
            lives_lost=np.array([False]),
        )
        finished, _ = col.add_moves(out)
        chunks.extend(finished)
    assert len(chunks) >= 2  # intermediate chunk(s) + terminal chunk
    # every chunk's trainable range lies inside its stored arrays
    for fg in chunks:
        lo, hi = fg.record.data_range
        assert 0 <= lo <= hi < fg.record.length


def test_n_step_value_with_life_cut():
    cfg = default_config("atari", learner_n_step_return=3, actor_mcts_reward_discount=0.5)
    from minizero_tpu.envs.atari import atari_spec

    buf = ReplayBuffer(cfg, atari_spec())
    rec = GameRecord(
        actions=np.arange(6, dtype=np.int32),
        policy=np.zeros((6, 18), np.float16),
        values=np.array([10, 20, 30, 40, 50, 60], np.float32),
        rewards=np.array([1, 2, 4, 8, 16, 32], np.float32),
        features=np.zeros((6, 1, 1, 1), np.uint8),
        result=63.0,
        lives_lost=np.array([False, False, False, True, False, False]),
    )
    # pos 0: r0 + 0.5 r1 + 0.25 r2 + 0.125 * V[3]? no: bootstrap at 3 has life
    # lost -> no bootstrap: 1 + 1 + 1 = 3
    assert buf.value_target(rec, 0) == 1 + 0.5 * 2 + 0.25 * 4
    # pos 2: r2, then idx3 has life lost -> stop, no bootstrap contribution
    assert buf.value_target(rec, 2) == 4.0
    # pos 4: r4 + 0.5 r5, bootstrap at 7 out of range
    assert buf.value_target(rec, 4) == 16 + 0.5 * 32


def test_rebuild_features_from_frames_roundtrip():
    from minizero_tpu.envs.atari import rebuild_features_from_frames

    env = _fake_env(seed=3, length=60)
    feats = []
    for a in [1, 3, 0, 2, 1, 1, 0, 3, 2, 1]:
        feats.append(env.features_u8())
        env.step(a)
    feats = np.stack(feats)
    actions = np.array([1, 3, 0, 2, 1, 1, 0, 3, 2, 1], np.int32)
    rebuilt = rebuild_features_from_frames(feats[:, :, :, -3:], actions)
    np.testing.assert_array_equal(rebuilt, feats)


def test_zero_loop_atari_smoke(tmp_path):
    """End-to-end atari iteration driver over FakeALE: self-play with SD/OBS
    tags -> train -> checkpoint -> resume rebuilds the buffer from OBS."""
    from minizero_tpu.tools.obs import unpack_observations
    from minizero_tpu.zero.loop import ZeroLoop

    cfg = default_config(
        "atari",
        actor_num_simulation=2,
        nn_num_blocks=1,
        nn_num_hidden_channels=8,
        nn_num_value_hidden_channels=8,
        zero_num_parallel_games=2,
        zero_num_games_per_iteration=2,
        zero_end_iteration=1,
        learner_training_step=2,
        learner_training_display_step=2,
        learner_batch_size=4,
        learner_muzero_unrolling_step=2,
        learner_n_step_return=2,
        zero_actor_intermediate_sequence_length=0,
        program_auto_seed=False,
    )
    run_dir = str(tmp_path / "run")
    factory = lambda s: FakeALE(seed=s, length=24)  # noqa: E731
    loop = ZeroLoop(cfg, run_dir, ale_factory=factory)
    loop.run()
    sgf = open(f"{run_dir}/sgf/1.sgf").read().strip().splitlines()
    assert len(sgf) >= 2
    assert "SD[" in sgf[0] and "OBS[" in sgf[0] and "LL[" in sgf[0]
    # resume: fresh loop rebuilds the replay window from OBS frames
    loop2 = ZeroLoop(cfg, run_dir, ale_factory=factory)
    start = loop2.resume()
    assert start == 1
    assert len(loop2.buffer) == len(loop.buffer)
    a = loop.buffer.games[0]
    b = loop2.buffer.games[0]
    np.testing.assert_array_equal(a.actions, b.actions)
    # full-episode records (seqlen 0): lead is 0 both live and resumed,
    # so the frames arrays must match byte for byte
    assert a.frame_lead == b.frame_lead == 0
    np.testing.assert_array_equal(a.frames, b.frames)
    np.testing.assert_array_equal(a.lives_lost, b.lives_lost)


def test_obs_recover_roundtrip_chunked():
    """remove_obs + AtariObsReplayer recover across chunked records of one
    episode (reference obs_recover prefix alignment)."""
    from minizero_tpu.selfplay.record import serialize_game
    from minizero_tpu.tools.obs import (
        AtariObsReplayer,
        pack_observations,
        recover_obs,
        remove_obs,
        unpack_observations,
    )
    from minizero_tpu.envs.atari import atari_spec

    cfg = default_config(
        "atari",
        zero_actor_intermediate_sequence_length=6,
        learner_n_step_return=1,
        learner_muzero_unrolling_step=1,
    )
    spec = atari_spec()
    factory = lambda s: FakeALE(seed=s, length=80)  # noqa: E731
    env = AtariEnv(seed=11, ale_factory=factory)
    col = AtariTrajectoryCollector(cfg, spec, 1)
    chunks = []
    t = 0
    while not env.is_terminal():
        feats = env.features_u8()[None]
        a = (t * 7) % 4
        env.step(a)
        out = HostMoveOutput(
            action=np.array([a]),
            policy_target=np.zeros((1, spec.action_size), np.float32),
            root_value=np.array([0.0]),
            reward=np.array([env.reward]),
            frames=feats[:, :, :, -3:],  # newest frame of the pre-move stack
            done=np.array([env.is_terminal()]),
            eval_score=np.array([env.eval_score()]),
            lives_lost=np.array([False]),
        )
        finished, _ = col.add_moves(out)
        chunks.extend(finished)
        t += 1
    assert len(chunks) >= 2
    lines = []
    for fg in chunks:
        extra = {"SD": "11"}
        if fg.abs_start:
            extra["OFF"] = str(fg.abs_start)
        line = serialize_game(spec.name, fg.record, spec.board_size, fg.players,
                              extra_tags=extra)
        obs = fg.record.frames[fg.record.frame_lead:]
        lines.append(line[:-1] + f"OBS[{pack_observations(obs)}]" + line[-1:])
    stripped = [remove_obs(ln) for ln in lines]
    assert all("OBS[" not in s for s in stripped)
    replayer = AtariObsReplayer(ale_factory=factory)
    for orig, bare in zip(lines, stripped):
        rec = recover_obs(bare, replayer)
        want = unpack_observations(orig.split("OBS[")[1].split("]")[0])
        got = unpack_observations(rec.split("OBS[")[1].split("]")[0])
        np.testing.assert_array_equal(got, want)


def test_to_video_fake(tmp_path):
    from minizero_tpu.selfplay.record import serialize_game
    from minizero_tpu.tools.to_video import record_to_video
    from minizero_tpu.envs.atari import atari_spec

    spec = atari_spec()
    factory = lambda s: FakeALE(seed=s, length=12)  # noqa: E731
    env = AtariEnv(seed=5, ale_factory=factory)
    actions, rewards = [], []
    while not env.is_terminal():
        actions.append(1)
        rewards.append(env.step(1))
    n = len(actions)
    rec = GameRecord(
        actions=np.asarray(actions, np.int32),
        policy=np.zeros((n, 18), np.float16),
        values=np.zeros(n, np.float32),
        rewards=np.asarray(rewards, np.float32),
        features=np.zeros((n, 1, 1, 1), np.uint8),
        result=env.eval_score(),
    )
    line = serialize_game(spec.name, rec, spec.board_size, tuple([1] * n), extra_tags={"SD": "5"})
    out = record_to_video(line, str(tmp_path), ale_factory=factory)
    assert out is not None and out.endswith(".gif")
    assert (tmp_path / "ms_pacman-0.gif").exists()


def test_run_selfplay_host_mode(tmp_path):
    """-mode sp for atari (host engine + SD/LL/OBS record tags)."""
    from minizero_tpu.__main__ import run_selfplay_host

    cfg = default_config(
        "atari",
        actor_num_simulation=2,
        nn_num_blocks=1,
        nn_num_hidden_channels=8,
        nn_num_value_hidden_channels=8,
        zero_num_parallel_games=2,
        zero_actor_intermediate_sequence_length=0,
        learner_n_step_return=2,
        learner_muzero_unrolling_step=2,
    )
    out = tmp_path / "games.sgf"
    run_selfplay_host(cfg, 2, str(out), ale_factory=lambda s: FakeALE(seed=s, length=16))
    lines = open(out).read().strip().splitlines()
    assert len(lines) >= 2
    assert "SD[" in lines[0] and "OBS[" in lines[0] and "LL[" in lines[0]


def test_zero_loop_atari_collector_persists_across_iterations(tmp_path):
    """Episodes that span an iteration boundary must keep their accumulated
    prefix: the round-4 bug recreated the AtariTrajectoryCollector each
    iteration, so iteration N+1 emitted the episode TAIL as a bogus fresh
    game (10-move records with no OFF tag, runs/atari_gmz_r4_b128.log)."""
    import re as _re

    from minizero_tpu.zero.loop import ZeroLoop

    # 12-move episodes (48 frames / frameskip 4), seqlen 4, margin 2+2=4:
    # chunks emit at moves 4 and 8, so iteration 1 (4 chunks) stops at move
    # 8 mid-episode; iteration 2 must then emit the TERMINAL chunks of the
    # same episodes with OFF[4] (abs positions 4..11), not fresh 4-movers.
    cfg = default_config(
        "atari",
        actor_num_simulation=2,
        nn_num_blocks=1,
        nn_num_hidden_channels=8,
        nn_num_value_hidden_channels=8,
        zero_num_parallel_games=2,
        zero_num_games_per_iteration=4,
        zero_end_iteration=2,
        learner_training_step=2,
        learner_training_display_step=2,
        learner_batch_size=4,
        learner_muzero_unrolling_step=2,
        learner_n_step_return=2,
        zero_actor_intermediate_sequence_length=4,
        program_auto_seed=False,
    )
    run_dir = str(tmp_path / "run")
    loop = ZeroLoop(cfg, run_dir, ale_factory=lambda s: FakeALE(seed=s, length=48))
    loop.run()
    it1 = open(f"{run_dir}/sgf/1.sgf").read().strip().splitlines()
    it2 = open(f"{run_dir}/sgf/2.sgf").read().strip().splitlines()
    assert len(it1) == 4 and len(it2) == 4
    for line in it1:  # intermediate chunks from moves 4 and 8 only
        assert "OFF[" not in line
    # iteration 2 starts with the carried episodes' TERMINAL chunks: the
    # round-4 bug instead produced OFF-less 4-move tails here
    terminal_chunks = [ln for ln in it2 if "OFF[4]" in ln]
    assert len(terminal_chunks) == 2
    for line in terminal_chunks:
        assert len(_re.findall(r";B\[", line)) == 8
