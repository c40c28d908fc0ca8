"""Fused Pallas tree-step kernel vs the pure-JAX reference implementation.

Runs the kernel in interpret mode (CPU) side by side with
``tree_step_reference`` (built on the existing mcts/gumbel functions) for a
full search's worth of simulations with random network outputs, asserting
the tree statistics and selections match at every simulation.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minizero_tpu.ops.tree_kernel import (
    NextSelection,
    fused_tree_step,
    supports_fused_tree_step,
    tree_step_reference,
)
from minizero_tpu.search import gumbel as gz
from minizero_tpu.search import mcts
from minizero_tpu.search.mcts import SearchSpec

B, A = 8, 8


def make_spec(use_gumbel: bool) -> SearchSpec:
    return SearchSpec(
        action_size=A,
        num_simulations=12,
        use_gumbel=use_gumbel,
        use_gumbel_noise=use_gumbel,
        use_dirichlet_noise=not use_gumbel,
        gumbel_sample_size=4,
        flip_player2_value=True,
    )


def init_trees(spec, rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    turns = jnp.ones((B,), jnp.int32)
    proto = jnp.zeros((3,), jnp.int8)  # tiny dummy embedding
    trees = jax.vmap(lambda t: mcts.init_tree(spec, proto, t))(turns)
    policy = jax.nn.softmax(jax.random.normal(k1, (B, A)))
    legal = jax.random.bernoulli(k2, 0.9, (B, A))
    legal = legal.at[:, 0].set(True)  # at least one legal action
    zeros_i = jnp.zeros((B,), jnp.int32)
    trees = jax.vmap(functools.partial(mcts.expand_node, spec, store_embedding=False))(
        trees, zeros_i, jnp.full((B,), -1, jnp.int32), zeros_i, turns,
        policy, jnp.log(policy + 1e-9), legal, jnp.zeros((B,), bool))
    trees = jax.vmap(functools.partial(mcts.backup, spec))(
        trees, zeros_i, jax.random.normal(k3, (B,)), jnp.zeros((B,), jnp.float32))
    if spec.use_gumbel:
        trees = jax.vmap(functools.partial(gz.init_candidates, spec))(trees)
    return trees


def dummy_sel(spec):
    return NextSelection(
        parent=jnp.zeros((B,), jnp.int32),
        action=jnp.zeros((B,), jnp.int32),
        leaf=jnp.full((B,), -1, jnp.int32),
        is_new=jnp.zeros((B,), bool),
        path=jnp.zeros((B, spec.max_nodes), bool),
    )


def rand_leaf_inputs(spec, rng, sim):
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    policy = jax.nn.softmax(jax.random.normal(k1, (B, A)))
    legal = jax.random.bernoulli(k2, 0.9, (B, A))
    legal = legal.at[:, 0].set(True)
    terminal = jax.random.bernoulli(k3, 0.1, (B,))
    value = jax.random.uniform(k4, (B,), minval=-1.0, maxval=1.0)
    turn = 1 + jax.random.bernoulli(k5, 0.5, (B,)).astype(jnp.int32)
    return policy, jnp.log(policy + 1e-9), legal, terminal, value, turn


def tree_stats(trees):
    return {
        "visits": np.asarray(trees.visits),
        "mean": np.asarray(trees.mean),
        "value": np.asarray(trees.value),
        "expanded": np.asarray(trees.expanded),
        "terminal": np.asarray(trees.terminal),
        "parent": np.asarray(trees.parent),
        "afp": np.asarray(trees.action_from_parent),
        "to_play": np.asarray(trees.to_play),
        "ci": np.asarray(trees.children_index),
        "prior": np.asarray(trees.prior),
        "legal": np.asarray(trees.legal),
        "gactive": np.asarray(trees.gumbel_active),
        "gm": np.asarray(trees.gumbel_sample_size),
        "gbudget": np.asarray(trees.gumbel_budget),
        "reward": np.asarray(trees.reward),
    }


@pytest.mark.parametrize("use_gumbel", [True, False])
def test_fused_tree_step_matches_reference(use_gumbel):
    spec = make_spec(use_gumbel)
    assert supports_fused_tree_step(spec)
    rng = jax.random.PRNGKey(0)
    rng, k = jax.random.split(rng)
    trees_k = init_trees(spec, k)
    trees_r = trees_k

    sel_k = dummy_sel(spec)
    sel_r = dummy_sel(spec)
    li = rand_leaf_inputs(spec, jax.random.PRNGKey(99), 0)
    # phase 0: selection only
    trees_k, sel_k = fused_tree_step(spec, trees_k, sel_k, *li, 0, 0, interpret=True)
    trees_r, sel_r = tree_step_reference(spec, trees_r, sel_r, *li, 0, 0)
    _check(spec, trees_k, trees_r, sel_k, sel_r, step=0)

    for sim in range(1, spec.num_simulations + 1):
        rng, k = jax.random.split(rng)
        li = rand_leaf_inputs(spec, k, sim)
        trees_k, sel_k = fused_tree_step(spec, trees_k, sel_k, *li, sim, 1,
                                         interpret=True)
        trees_r, sel_r = tree_step_reference(spec, trees_r, sel_r, *li, sim, 1)
        _check(spec, trees_k, trees_r, sel_k, sel_r, step=sim)


def _check(spec, trees_k, trees_r, sel_k, sel_r, step):
    sk, sr = tree_stats(trees_k), tree_stats(trees_r)
    for key in sk:
        np.testing.assert_allclose(
            sk[key].astype(np.float64), sr[key].astype(np.float64),
            rtol=1e-5, atol=1e-5, err_msg=f"sim {step}: tree field {key}")
    np.testing.assert_array_equal(np.asarray(sel_k.is_new), np.asarray(sel_r.is_new),
                                  err_msg=f"sim {step}: is_new")
    np.testing.assert_array_equal(np.asarray(sel_k.leaf), np.asarray(sel_r.leaf),
                                  err_msg=f"sim {step}: leaf")
    new = np.asarray(sel_r.is_new)
    np.testing.assert_array_equal(np.asarray(sel_k.parent)[new],
                                  np.asarray(sel_r.parent)[new],
                                  err_msg=f"sim {step}: parent (new edges)")
    np.testing.assert_array_equal(np.asarray(sel_k.action)[new],
                                  np.asarray(sel_r.action)[new],
                                  err_msg=f"sim {step}: action (new edges)")
    np.testing.assert_array_equal(np.asarray(sel_k.path), np.asarray(sel_r.path),
                                  err_msg=f"sim {step}: path")


def test_engine_kernel_path_matches_xla_path():
    """The fused-kernel engine and the XLA sim-loop engine must produce the
    same search results (policy target, root value, visits-derived action) on
    real Go games."""
    from minizero_tpu.config import algorithm_preset, default_config
    from minizero_tpu.envs import make_env
    from minizero_tpu.models.factory import create_network, init_network
    from minizero_tpu.selfplay.engine import SelfPlayEngine

    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parity_common import jax_parity_network

    over = dict(algorithm_preset("gaz"))
    over.update(actor_num_simulation=6, actor_gumbel_sample_size=4,
                env_board_size=9, actor_select_action_by_count=True)
    cfg = default_config("go", **over)
    env = make_env(cfg)
    # the integer-exact parity net (tests/parity_common.py): every score
    # margin is macroscopic by construction. A random-init conv net's
    # near-uniform priors put completed-Q/PUCT scores within float-fusion
    # noise of each other and the two (equally correct) paths then break
    # those ties differently — a property of the NET, not of the paths.
    net, variables = jax_parity_network("go")

    eng_k = SelfPlayEngine(env, cfg, net, use_bf16=False)
    assert eng_k.use_tree_kernel
    # unknown ablate tag: disables the kernel path but is a no-op in the
    # XLA sim loop
    eng_x = SelfPlayEngine(env, cfg, net, use_bf16=False, _ablate=("off",))
    assert not eng_x.use_tree_kernel

    states = eng_k.init_batch(4)
    rng = jax.random.PRNGKey(7)
    for mv in range(3):
        rng, k = jax.random.split(rng)
        out_k = eng_k.move(variables, states, k)
        out_x = eng_x.move(variables, states, k)
        # continuous outputs: the two paths accumulate q in different
        # fusion orders, so completed-Q-derived targets drift ~1e-2 abs
        # (a STRUCTURAL divergence — a flipped visit — shows as >=0.1);
        # discrete outputs (actions) must still match exactly
        np.testing.assert_allclose(np.asarray(out_k.policy_target),
                                   np.asarray(out_x.policy_target),
                                   rtol=0.05, atol=0.02,
                                   err_msg=f"move {mv} policy target")
        np.testing.assert_allclose(np.asarray(out_k.root_value),
                                   np.asarray(out_x.root_value),
                                   rtol=1e-2, atol=5e-3,
                                   err_msg=f"move {mv} root value")
        np.testing.assert_array_equal(np.asarray(out_k.action),
                                      np.asarray(out_x.action),
                                      err_msg=f"move {mv} action")
        states = out_k.states


@pytest.mark.parametrize("use_gumbel", [True, False])
def test_fused_tree_step_atari_regime(use_gumbel):
    """MuZero Atari semantics: reward head + discounted backup + min-max
    value rescale + plain-average init-Q, single player (no value flip)."""
    spec = SearchSpec(
        action_size=A,
        num_simulations=12,
        use_gumbel=use_gumbel,
        use_gumbel_noise=use_gumbel,
        use_dirichlet_noise=not use_gumbel,
        gumbel_sample_size=4,
        flip_player2_value=False,
        discount=0.997,
        value_rescale=True,
        init_q_average=True,
    )
    assert supports_fused_tree_step(spec)
    rng = jax.random.PRNGKey(3)
    rng, k = jax.random.split(rng)
    trees_k = init_trees(spec, k)
    trees_r = trees_k

    sel_k = dummy_sel(spec)
    sel_r = dummy_sel(spec)
    li = rand_leaf_inputs(spec, jax.random.PRNGKey(99), 0)
    zero_r = jnp.zeros((B,), jnp.float32)
    trees_k, sel_k = fused_tree_step(spec, trees_k, sel_k, *li, 0, 0,
                                     interpret=True, leaf_reward=zero_r)
    trees_r, sel_r = tree_step_reference(spec, trees_r, sel_r, *li, 0, 0,
                                         leaf_reward=zero_r)
    _check(spec, trees_k, trees_r, sel_k, sel_r, step=0)

    for sim in range(1, spec.num_simulations + 1):
        rng, k, kr = jax.random.split(rng, 3)
        li = rand_leaf_inputs(spec, k, sim)
        # MuZero interior nodes: never terminal, all actions legal
        pol, logit, _, _, val, _ = li
        legal = jnp.ones((B, A), bool)
        term = jnp.zeros((B,), bool)
        turn = jnp.ones((B,), jnp.int32)
        reward = jax.random.uniform(kr, (B,), minval=-1.0, maxval=1.0)
        args = (pol, logit, legal, term, val, turn)
        trees_k, sel_k = fused_tree_step(spec, trees_k, sel_k, *args, sim, 1,
                                         interpret=True, leaf_reward=reward)
        trees_r, sel_r = tree_step_reference(spec, trees_r, sel_r, *args,
                                             sim, 1, leaf_reward=reward)
        _check(spec, trees_k, trees_r, sel_k, sel_r, step=sim)
