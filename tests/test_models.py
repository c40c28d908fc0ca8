import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.config import default_config
from minizero_tpu.envs import make_env
from minizero_tpu.models.factory import create_network, init_network
from minizero_tpu.utils.transforms import (
    from_discrete_value,
    invert_value,
    to_discrete_value,
    transform_value,
)


def test_alphazero_forward_shapes():
    cfg = default_config("tictactoe", nn_num_blocks=1, nn_num_hidden_channels=16, nn_num_value_hidden_channels=16)
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))
    x = jnp.zeros((4, 3, 3, 4))
    out = net.apply(variables, x, train=False)
    assert out["policy_logit"].shape == (4, 9)
    assert out["policy"].shape == (4, 9)
    assert out["value"].shape == (4, 1)
    np.testing.assert_allclose(np.asarray(out["policy"]).sum(-1), 1.0, rtol=1e-5)
    assert (np.abs(np.asarray(out["value"])) <= 1.0).all()


def test_muzero_forward_shapes():
    cfg = default_config("tictactoe", nn_type_name="muzero", nn_num_blocks=1, nn_num_hidden_channels=16,
                         nn_num_value_hidden_channels=16)
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))
    x = jnp.zeros((2, 3, 3, 4))
    out = net.apply(variables, x, train=False, method=net.initial_inference)
    assert out["hidden_state"].shape == (2, 3, 3, 16)
    # hidden state scaled to [0, 1] (reference muzero_network.py:154-164)
    h = np.asarray(out["hidden_state"])
    assert h.min() >= 0.0 and h.max() <= 1.0 + 1e-6
    action_plane = jnp.zeros((2, 3, 3, 1))
    out2 = net.apply(variables, out["hidden_state"], action_plane, train=False, method=net.recurrent_inference)
    assert out2["policy_logit"].shape == (2, 9)
    assert out2["hidden_state"].shape == (2, 3, 3, 16)
    assert "reward_logit" not in out2  # board-game muzero has no reward head


def test_value_transform_roundtrip():
    x = jnp.array([-300.0, -5.5, -1.0, 0.0, 0.25, 1.0, 17.0, 299.0])
    np.testing.assert_allclose(np.asarray(invert_value(transform_value(x))), np.asarray(x), rtol=1e-3, atol=1e-3)


def test_two_hot_roundtrip():
    vals = jnp.array([-3.25, -1.0, 0.0, 0.5, 7.75])
    enc = to_discrete_value(vals, 601)
    assert enc.shape == (5, 601)
    np.testing.assert_allclose(np.asarray(enc.sum(-1)), 1.0, rtol=1e-6)
    # expectation over bins inverts back through h^-1
    support = jnp.arange(601.0) - 300.0
    expect = (enc * support).sum(-1)
    np.testing.assert_allclose(np.asarray(expect), np.asarray(vals), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(from_discrete_value(enc)), np.asarray(invert_value(vals)), rtol=1e-4, atol=1e-4
    )
