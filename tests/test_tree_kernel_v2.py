"""Large-N fused tree-step kernel (v2) vs the pure-JAX reference.

Same harness as test_tree_kernel.py: interpret-mode kernel side by side with
``tree_step_reference`` for a full non-Gumbel search with random network
outputs, checking tree statistics and selections after every simulation.
Also exercises capacity staging (``grow``) and the blob/gather helpers the
v2 engine path uses.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minizero_tpu.ops.tree_kernel import NextSelection, tree_step_reference
from minizero_tpu.ops.tree_kernel_v2 import (
    empty_selection_v2,
    fused_tree_step_v2,
    grow,
    pack_trees,
    supports_fused_tree_step_v2,
    unpack_trees,
)
from minizero_tpu.search import mcts
from minizero_tpu.search.mcts import SearchSpec

B, A = 8, 8


def make_spec(num_simulations=12) -> SearchSpec:
    return SearchSpec(
        action_size=A,
        num_simulations=num_simulations,
        use_gumbel=False,
        use_dirichlet_noise=True,
        flip_player2_value=True,
    )


def init_trees(spec, rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    turns = jnp.ones((B,), jnp.int32)
    proto = jnp.zeros((3,), jnp.int8)
    trees = jax.vmap(lambda t: mcts.init_tree(spec, proto, t))(turns)
    policy = jax.nn.softmax(jax.random.normal(k1, (B, A)))
    legal = jax.random.bernoulli(k2, 0.9, (B, A))
    legal = legal.at[:, 0].set(True)
    zeros_i = jnp.zeros((B,), jnp.int32)
    trees = jax.vmap(functools.partial(mcts.expand_node, spec, store_embedding=False))(
        trees, zeros_i, jnp.full((B,), -1, jnp.int32), zeros_i, turns,
        policy, jnp.log(policy + 1e-9), legal, jnp.zeros((B,), bool))
    trees = jax.vmap(functools.partial(mcts.backup, spec))(
        trees, zeros_i, jax.random.normal(k3, (B,)), jnp.zeros((B,), jnp.float32))
    return trees


def dummy_sel(cap):
    return NextSelection(
        parent=jnp.zeros((B,), jnp.int32),
        action=jnp.zeros((B,), jnp.int32),
        leaf=jnp.full((B,), -1, jnp.int32),
        is_new=jnp.zeros((B,), bool),
        path=jnp.zeros((B, cap), bool),
    )


def dummy_sel_v2(spec, cap):
    return empty_selection_v2(spec, B, cap)


def rand_leaf_inputs(rng):
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    policy = jax.nn.softmax(jax.random.normal(k1, (B, A)))
    legal = jax.random.bernoulli(k2, 0.9, (B, A))
    legal = legal.at[:, 0].set(True)
    terminal = jax.random.bernoulli(k3, 0.1, (B,))
    value = jax.random.uniform(k4, (B,), minval=-1.0, maxval=1.0)
    turn = 1 + jax.random.bernoulli(k5, 0.5, (B,)).astype(jnp.int32)
    return policy, jnp.log(policy + 1e-9), legal, terminal, value, turn


FIELDS = ["visits", "mean", "value", "expanded", "terminal", "parent",
          "action_from_parent", "to_play", "children_index", "prior", "legal"]


def _check(trees_k, trees_r, sel_k, sel_r, step, n_cmp):
    for key in FIELDS:
        a = np.asarray(getattr(trees_k, key))[:, :n_cmp].astype(np.float64)
        b = np.asarray(getattr(trees_r, key))[:, :n_cmp].astype(np.float64)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5,
                                   err_msg=f"sim {step}: tree field {key}")
    np.testing.assert_array_equal(np.asarray(sel_k.is_new), np.asarray(sel_r.is_new),
                                  err_msg=f"sim {step}: is_new")
    np.testing.assert_array_equal(np.asarray(sel_k.leaf), np.asarray(sel_r.leaf),
                                  err_msg=f"sim {step}: leaf")
    np.testing.assert_array_equal(np.asarray(sel_k.parent), np.asarray(sel_r.parent),
                                  err_msg=f"sim {step}: parent")
    np.testing.assert_array_equal(np.asarray(sel_k.action), np.asarray(sel_r.action),
                                  err_msg=f"sim {step}: action")
    np.testing.assert_array_equal(
        np.asarray(sel_k.path)[:, :n_cmp], np.asarray(sel_r.path)[:, :n_cmp],
        err_msg=f"sim {step}: path")


@pytest.mark.parametrize("staged", [False, True])
def test_fused_tree_step_v2_matches_reference(staged):
    spec = make_spec()
    assert supports_fused_tree_step_v2(spec)
    n = spec.max_nodes
    caps = [5, 9, n] if staged else [n]
    rng = jax.random.PRNGKey(0)
    rng, k = jax.random.split(rng)
    trees_r = init_trees(spec, k)
    packed = pack_trees(spec, trees_r, caps[0])

    sel_k = dummy_sel_v2(spec, caps[0])
    sel_r = dummy_sel(n)
    li = rand_leaf_inputs(jax.random.PRNGKey(99))
    pol, logit, legal, term, val, turn = li
    packed, sel_k = fused_tree_step_v2(
        spec, packed, sel_k, pol, legal, term, val, turn, 0, 0, interpret=True)
    trees_r, sel_r = tree_step_reference(spec, trees_r, sel_r, *li, 0, 0)
    trees_k = unpack_trees(spec, packed, trees_r)
    _check(trees_k, trees_r, sel_k, sel_r, step=0, n_cmp=caps[0])

    cap_i = 0
    for sim in range(1, spec.num_simulations + 1):
        if sim >= caps[cap_i]:  # row sim must exist: grow before overflow
            cap_i += 1
            packed = grow(packed, caps[cap_i])
            sel_k = sel_k._replace(path=jnp.pad(
                sel_k.path, ((0, 0), (0, caps[cap_i] - sel_k.path.shape[1]))))
        rng, k = jax.random.split(rng)
        li = rand_leaf_inputs(k)
        pol, logit, legal, term, val, turn = li
        packed, sel_k = fused_tree_step_v2(
            spec, packed, sel_k, pol, legal, term, val, turn, sim, 1,
            interpret=True)
        trees_r, sel_r = tree_step_reference(spec, trees_r, sel_r, *li, sim, 1)
        trees_k = unpack_trees(spec, packed, trees_r)
        _check(trees_k, trees_r, sel_k, sel_r, step=sim,
               n_cmp=min(caps[cap_i], n))


def test_engine_v2_matches_xla_path():
    """The v2-kernel engine and the XLA sim-loop engine must produce the same
    search results on real Go games (AlphaZero, large-N path forced)."""
    from minizero_tpu.config import algorithm_preset, default_config
    from minizero_tpu.envs import make_env
    from minizero_tpu.models.factory import create_network, init_network
    from minizero_tpu.selfplay.engine import SelfPlayEngine

    over = dict(algorithm_preset("az"))
    over.update(actor_num_simulation=10, nn_num_blocks=1,
                nn_num_hidden_channels=8, nn_num_value_hidden_channels=8,
                env_board_size=5, actor_select_action_by_count=True)
    cfg = default_config("go", **over)
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))

    eng_k = SelfPlayEngine(env, cfg, net, use_bf16=False, _force_kernel_v2=True)
    assert eng_k.use_tree_kernel_v2
    eng_x = SelfPlayEngine(env, cfg, net, use_bf16=False, _ablate=("off",))
    assert not eng_x.use_tree_kernel and not eng_x.use_tree_kernel_v2

    states = eng_k.init_batch(4)
    rng = jax.random.PRNGKey(7)
    for mv in range(3):
        rng, k = jax.random.split(rng)
        out_k = eng_k.move(variables, states, k)
        out_x = eng_x.move(variables, states, k)
        np.testing.assert_allclose(np.asarray(out_k.policy_target),
                                   np.asarray(out_x.policy_target),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"move {mv} policy target")
        np.testing.assert_allclose(np.asarray(out_k.root_value),
                                   np.asarray(out_x.root_value),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"move {mv} root value")
        np.testing.assert_array_equal(np.asarray(out_k.action),
                                      np.asarray(out_x.action),
                                      err_msg=f"move {mv} action")
        states = out_k.states
