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


def test_scale_hidden_state_grad_finite_under_jit():
    """Regression: jax's tie-distributing min/max VJP emitted NaN gradients
    when scale_hidden_state was fused into the representation conv/BN
    backward under jit (grads were finite eagerly) — this silently turned
    every MuZero training run into a constant-predictor (round-3 find).
    The custom VJP (blocks._minmax_normalize) must stay finite jitted and
    match torch's arg-index min/max backward semantics."""
    import jax

    from minizero_tpu.models.blocks import scale_hidden_state
    from minizero_tpu.models.muzero import _Representation

    rep = _Representation(32, 1)
    x = jnp.asarray(
        np.random.RandomState(0).randint(0, 2, (16, 3, 3, 4)).astype(np.float32))
    v = rep.init(jax.random.PRNGKey(1), x, True)

    def f(params):
        out, _ = rep.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, True,
            mutable=["batch_stats"])
        return jnp.sum(scale_hidden_state(out) ** 2)

    g = jax.jit(jax.grad(f))(v["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()

    # VJP matches the native (eager) gradient on tie-free input
    def pure(x2):
        return jnp.sum(jnp.sin(scale_hidden_state(x2)) ** 2)

    def native(x2):
        mn = jnp.min(x2.reshape(8, -1), -1, keepdims=True)
        mx = jnp.max(x2.reshape(8, -1), -1, keepdims=True)
        s = jnp.where(mx - mn < 1e-5, mx - mn + 1e-5, mx - mn)
        return jnp.sum(jnp.sin(((x2.reshape(8, -1) - mn) / s).reshape(x2.shape)) ** 2)

    x2 = jnp.asarray(np.random.RandomState(3).randn(8, 5, 5, 2).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(jax.grad(pure)(x2)), np.asarray(jax.grad(native)(x2)), atol=1e-5)
