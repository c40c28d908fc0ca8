"""Batched MCTS tests: structural invariants plus a tactical sanity check
(the reference has no MCTS unit tests; its check is end-to-end training)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minizero_tpu.config import default_config
from minizero_tpu.envs import make_env
from minizero_tpu.models.factory import create_network, init_network
from minizero_tpu.selfplay.engine import SelfPlayEngine


def make_engine(**cfg_overrides):
    cfg = default_config(
        "tictactoe",
        nn_num_blocks=1,
        nn_num_hidden_channels=8,
        nn_num_value_hidden_channels=8,
        actor_num_simulation=cfg_overrides.pop("sims", 24),
        **cfg_overrides,
    )
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))
    return env, cfg, net, variables, SelfPlayEngine(env, cfg, net)


def test_move_invariants():
    env, cfg, net, variables, engine = make_engine(sims=24)
    states = engine.init_batch(4)
    out = engine.move(variables, states, jax.random.PRNGKey(1))
    actions = np.asarray(out.action)
    assert ((actions >= 0) & (actions < 9)).all()
    pt = np.asarray(out.policy_target)
    np.testing.assert_allclose(pt.sum(-1), 1.0, rtol=1e-5)
    assert (pt >= 0).all()
    # step happened: each board has exactly one stone
    boards = np.asarray(out.states.board)
    assert (np.count_nonzero(boards, axis=1) == 1).all()
    assert not np.asarray(out.done).any()
    feats = np.asarray(out.features)
    # feature planes travel bit-packed (utils/bitpack.py): 4 planes -> 1 byte
    assert feats.shape == (4, 3, 3, 1)
    from minizero_tpu.utils.bitpack import unpack_planes
    unpacked = np.asarray(unpack_planes(feats, 4))
    assert unpacked.shape == (4, 3, 3, 4) and unpacked.max() <= 1


def test_finds_immediate_win():
    """From a position where the mover wins immediately, search must select
    the winning move (terminal leaves back up true outcomes)."""
    env, cfg, net, variables, engine = make_engine(
        sims=100, actor_select_action_by_count=True, actor_select_action_by_softmax_count=False,
        actor_use_dirichlet_noise=False,
    )
    # P1 to move with two in a row at 0,1; win at 2. P2 at 3,4 (blockable but
    # winning now is strictly better).
    s = env.init()
    for a in [0, 3, 1, 4]:
        s = env.step(s, jnp.int32(a))
    states = jax.tree_util.tree_map(lambda x: jnp.stack([x] * 2), s)
    out = engine.move(variables, states, jax.random.PRNGKey(3))
    assert (np.asarray(out.action) == 2).all()
    assert np.asarray(out.done).all()
    assert (np.asarray(out.eval_score) == 1.0).all()


def test_blocks_immediate_loss():
    """P2 to move, P1 threatens 0,1->2: P2 must block at 2 (or win itself —
    here P2 has no win)."""
    env, cfg, net, variables, engine = make_engine(
        sims=200, actor_select_action_by_count=True, actor_select_action_by_softmax_count=False,
        actor_use_dirichlet_noise=False,
    )
    s = env.init()
    for a in [0, 8, 1]:  # P1: 0,1; P2: 8; P2 to move
        s = env.step(s, jnp.int32(a))
    states = jax.tree_util.tree_map(lambda x: jnp.stack([x] * 1), s)
    out = engine.move(variables, states, jax.random.PRNGKey(4))
    assert int(np.asarray(out.action)[0]) == 2


def test_gumbel_move_invariants():
    env, cfg, net, variables, engine = make_engine(
        sims=16,
        actor_use_gumbel=True,
        actor_use_gumbel_noise=True,
        actor_use_dirichlet_noise=False,
        actor_select_action_by_count=True,
        actor_select_action_by_softmax_count=False,
        actor_gumbel_sample_size=4,
    )
    states = engine.init_batch(3)
    out = engine.move(variables, states, jax.random.PRNGKey(2))
    actions = np.asarray(out.action)
    assert ((actions >= 0) & (actions < 9)).all()
    pt = np.asarray(out.policy_target)
    np.testing.assert_allclose(pt.sum(-1), 1.0, rtol=1e-4)
    assert (pt >= 0).all()


def test_full_selfplay_game():
    """Play games to completion with resets; outcomes must be valid."""
    env, cfg, net, variables, engine = make_engine(sims=16)
    B = 8
    states = engine.init_batch(B)
    rng = jax.random.PRNGKey(7)
    finished = 0
    for _ in range(12):
        rng, k = jax.random.split(rng)
        out = engine.move(variables, states, k)
        done = np.asarray(out.done)
        finished += int(done.sum())
        states = engine.reset_slots(out.states, out.done)
    assert finished >= B  # every slot should have finished at least one game


def test_think_batch_move_invariants():
    """Intra-tree leaf batching (reference ZeroActor::step virtual-loss
    batching, zero_actor.cpp:129-157): K selections per forward must still
    produce a valid move + normalized policy target."""
    env, cfg, net, variables, _ = make_engine(sims=24)
    cfg = cfg.replace(actor_mcts_think_batch_size=4)
    engine = SelfPlayEngine(env, cfg, net, use_think_batch=True)
    assert engine.spec.think_batch == 4
    states = engine.init_batch(3)
    out = engine.move(variables, states, jax.random.PRNGKey(11))
    actions = np.asarray(out.action)
    assert ((actions >= 0) & (actions < 9)).all()
    pt = np.asarray(out.policy_target)
    np.testing.assert_allclose(pt.sum(-1), 1.0, rtol=1e-5)
    assert (pt >= 0).all()


def test_think_batch_finds_immediate_win():
    """Tactical correctness must survive virtual-loss batching."""
    env, cfg, net, variables, _ = make_engine(
        sims=100, actor_select_action_by_count=True,
        actor_select_action_by_softmax_count=False, actor_use_dirichlet_noise=False,
    )
    cfg = cfg.replace(actor_mcts_think_batch_size=8)
    engine = SelfPlayEngine(env, cfg, net, use_think_batch=True, eval_mode=True)
    s = env.init()
    for a in [0, 3, 1, 4]:
        s = env.step(s, jnp.int32(a))
    states = jax.tree_util.tree_map(lambda x: jnp.stack([x] * 2), s)
    out = engine.move(variables, states, jax.random.PRNGKey(13))
    assert (np.asarray(out.action) == 2).all()
    assert (np.asarray(out.eval_score) == 1.0).all()


def test_think_batch_gumbel():
    """Gumbel sequential halving under think-batch rounds."""
    env, cfg, net, variables, _ = make_engine(
        sims=16, actor_use_gumbel=True, actor_use_gumbel_noise=True,
        actor_use_dirichlet_noise=False, actor_select_action_by_count=True,
        actor_select_action_by_softmax_count=False, actor_gumbel_sample_size=4,
    )
    cfg = cfg.replace(actor_mcts_think_batch_size=4)
    engine = SelfPlayEngine(env, cfg, net, use_think_batch=True)
    states = engine.init_batch(2)
    out = engine.move(variables, states, jax.random.PRNGKey(17))
    actions = np.asarray(out.action)
    assert ((actions >= 0) & (actions < 9)).all()
    pt = np.asarray(out.policy_target)
    np.testing.assert_allclose(pt.sum(-1), 1.0, rtol=1e-4)


def test_muzero_move_invariants():
    cfg = default_config(
        "tictactoe", nn_type_name="muzero", nn_num_blocks=1, nn_num_hidden_channels=8,
        nn_num_value_hidden_channels=8, actor_num_simulation=12,
    )
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))
    engine = SelfPlayEngine(env, cfg, net)
    states = engine.init_batch(2)
    out = engine.move(variables, states, jax.random.PRNGKey(5))
    actions = np.asarray(out.action)
    assert ((actions >= 0) & (actions < 9)).all()
    # policy target covers only root-legal actions
    pt = np.asarray(out.policy_target)
    np.testing.assert_allclose(pt.sum(-1), 1.0, rtol=1e-5)


def make_muzero_engine(think_batch=1, **cfg_overrides):
    cfg = default_config(
        "tictactoe", nn_type_name="muzero", nn_num_blocks=1, nn_num_hidden_channels=8,
        nn_num_value_hidden_channels=8, actor_num_simulation=cfg_overrides.pop("sims", 12),
        **cfg_overrides,
    )
    if think_batch > 1:
        cfg = cfg.replace(actor_mcts_think_batch_size=think_batch)
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))
    engine = SelfPlayEngine(env, cfg, net, use_think_batch=think_batch > 1)
    return env, cfg, net, variables, engine


def test_muzero_think_batch_move_invariants():
    """MuZero intra-tree leaf batching (reference ZeroActor::step applies to
    BOTH algorithms, zero_actor.cpp:129-157): K selections per recurrent
    forward must still produce a valid move + normalized policy target."""
    env, cfg, net, variables, engine = make_muzero_engine(think_batch=4, sims=12)
    assert engine.spec.think_batch == 4
    states = engine.init_batch(3)
    out = engine.move(variables, states, jax.random.PRNGKey(21))
    actions = np.asarray(out.action)
    assert ((actions >= 0) & (actions < 9)).all()
    pt = np.asarray(out.policy_target)
    np.testing.assert_allclose(pt.sum(-1), 1.0, rtol=1e-4)
    assert (pt >= 0).all()


def test_muzero_think_batch_gumbel():
    """Gumbel MuZero under think-batch rounds."""
    env, cfg, net, variables, engine = make_muzero_engine(
        think_batch=4, sims=16, actor_use_gumbel=True, actor_use_gumbel_noise=True,
        actor_use_dirichlet_noise=False, actor_select_action_by_count=True,
        actor_select_action_by_softmax_count=False, actor_gumbel_sample_size=4,
    )
    states = engine.init_batch(2)
    out = engine.move(variables, states, jax.random.PRNGKey(23))
    actions = np.asarray(out.action)
    assert ((actions >= 0) & (actions < 9)).all()


def test_muzero_search_trees_and_tree_string():
    """MuZero tree dump surface (console tree_string; reference dumps its
    node pool for both algorithms, tree.h:79-110)."""
    from minizero_tpu.search.mcts import root_children_visits, tree_string

    env, cfg, net, variables, engine = make_muzero_engine(sims=12)
    states = engine.init_batch(1)
    trees = engine.search_trees(variables, states, jax.random.PRNGKey(3))
    visits = np.asarray(jax.vmap(root_children_visits)(trees))[0]
    assert visits.sum() == 12  # every simulation reached a root child
    tree0 = jax.tree_util.tree_map(lambda x: x[0], trees)
    s = tree_string(engine.spec, tree0)
    assert s.count("C[") >= 2  # root + at least one visited child rendered


def test_timed_search_partial_and_full():
    """Chunked wall-clock think (reference zero_actor.cpp:36-49): a partial
    advance decides from the partial tree; a full advance matches the
    untimed search's visit budget."""
    env, cfg, net, variables, engine = make_engine(
        sims=16, actor_use_dirichlet_noise=False,
        actor_select_action_by_count=True, actor_select_action_by_softmax_count=False,
    )
    assert engine.supports_timed_search()
    states = engine.init_batch(2)
    carry = engine.az_init_timed(variables, states, jax.random.PRNGKey(31))
    carry = engine.az_advance_timed(variables, carry, 1, 7)  # 6 of 16 sims
    action, pt, root_value, resign, trees = engine.az_finish_timed(carry)
    assert (np.asarray(trees.visits)[:, 0] == 7).all()  # root evals: 1 + 6
    assert ((np.asarray(action) >= 0) & (np.asarray(action) < 9)).all()
    np.testing.assert_allclose(np.asarray(pt).sum(-1), 1.0, rtol=1e-5)
    # resume the same carry to the full budget
    carry = engine.az_advance_timed(variables, carry, 7, 17)
    _, _, _, _, trees = engine.az_finish_timed(carry)
    assert (np.asarray(trees.visits)[:, 0] == 17).all()


def test_console_think_time_limit():
    """actor_mcts_think_time_limit caps the console think by wall clock."""
    from minizero_tpu.console.gtp import ConsoleActor

    cfg = default_config(
        "tictactoe", nn_num_blocks=1, nn_num_hidden_channels=8,
        nn_num_value_hidden_channels=8, actor_num_simulation=16,
        actor_mcts_think_time_limit=1e-6,
    )
    actor = ConsoleActor(cfg)
    action, _ = actor.think(play=True)
    assert 0 <= action < 9
    assert len(actor.actions) == 1
