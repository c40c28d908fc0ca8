"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from minizero_tpu.config import default_config
from minizero_tpu.envs import make_env
from minizero_tpu.models.factory import create_network, init_network
from minizero_tpu.parallel.distributed import ShardedSelfPlay, init_distributed
from minizero_tpu.parallel.mesh import make_mesh
from minizero_tpu.selfplay.engine import SelfPlayEngine

_TINY = dict(
    actor_num_simulation=4,
    nn_num_blocks=1,
    nn_num_hidden_channels=8,
    nn_num_value_hidden_channels=8,
)


def test_init_distributed_single_host():
    pid, count = init_distributed()
    assert pid == 0 and count == 1


def test_sharded_selfplay_matches_unsharded():
    cfg = default_config("tictactoe", **_TINY)
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))
    engine = SelfPlayEngine(env, cfg, net, use_bf16=False)
    mesh = make_mesh(8)
    sharded = ShardedSelfPlay(engine, mesh)

    rng = jax.random.PRNGKey(5)
    states_plain = engine.init_batch(16, rng)
    states_shard = sharded.init_batch(16, rng)
    # states actually sharded over dp
    leaf = jax.tree_util.tree_leaves(states_shard)[0]
    assert not leaf.sharding.is_fully_replicated

    k = jax.random.PRNGKey(7)
    out_plain = engine.move(variables, states_plain, k)
    out_shard = sharded.move(sharded.place_variables(variables), states_shard, k)
    np.testing.assert_array_equal(np.asarray(out_plain.action), np.asarray(out_shard.action))
    np.testing.assert_allclose(
        np.asarray(out_plain.root_value), np.asarray(out_shard.root_value), atol=1e-5
    )


@pytest.mark.slow
def test_zero_loop_with_mesh(tmp_path):
    from minizero_tpu.zero.loop import ZeroLoop

    cfg = default_config(
        "tictactoe",
        **_TINY,
        zero_num_parallel_games=8,
        zero_num_games_per_iteration=4,
        zero_end_iteration=1,
        learner_training_step=2,
        learner_training_display_step=1,
        learner_batch_size=16,
    )
    mesh = make_mesh(8)
    loop = ZeroLoop(cfg, str(tmp_path / "run"), mesh=mesh)
    loop.run()
    assert int(loop.state.step) == 2
