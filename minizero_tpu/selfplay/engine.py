"""Self-play engine: fused env + MCTS + network loop on device.

TPU-native replacement for the reference's ActorGroup worker
(``minizero/actor/actor_group.cpp``): instead of 64 actor threads alternating
CPU (tree ops) and GPU (batched forward) phases (``actor_group.cpp:136-148``),
a single jitted function advances B independent games in lock-step — one MCTS
simulation for all games per network forward, ``num_simulations + 1`` forwards
per move, everything (env transitions, tree ops, inference) staying on device.

The per-move jitted step returns exactly the data the reference records per
move (``actor/base_actor.cpp:59-66``): the search policy distribution P, the
root mean value V, the env reward R — plus the action, resign signal, and the
pre-move feature planes (stored for replay instead of the reference's
replay-the-whole-game-per-sample ``base_env.h:235-241``).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.config import Config
from minizero_tpu.envs.base import Env
from minizero_tpu.models.alphazero import AlphaZeroNetwork
from minizero_tpu.ops.tree_kernel import (
    NextSelection,
    fused_tree_step,
    supports_fused_tree_step,
)
from minizero_tpu.ops.tree_kernel_v2 import (
    empty_selection_v2,
    fused_tree_step_v2,
    grow,
    pack_trees,
    supports_fused_tree_step_v2,
    unpack_trees,
)
from minizero_tpu.search import gumbel as gz
from minizero_tpu.utils.bitpack import pack_planes
from minizero_tpu.search import mcts
from minizero_tpu.search.mcts import SearchSpec, Tree
from minizero_tpu.utils.transforms import from_discrete_value


def search_spec_from_config(cfg: Config, env_spec, eval_mode: bool = False,
                            think_batch: int = 1) -> SearchSpec:
    """Build the static search spec (eval mode disables exploration noise,
    reference ``README.md:203`` eval recipe)."""
    return SearchSpec(
        think_batch=max(1, think_batch),
        action_size=env_spec.action_size,
        num_simulations=cfg.actor_num_simulation,
        puct_base=cfg.actor_mcts_puct_base,
        puct_init=cfg.actor_mcts_puct_init,
        discount=cfg.actor_mcts_reward_discount,
        value_rescale=cfg.actor_mcts_value_rescale,
        init_q_average=cfg.actor_mcts_init_q_average,
        flip_player2_value=(cfg.actor_mcts_value_flipping_player == "W" and env_spec.num_players == 2),
        use_dirichlet_noise=cfg.actor_use_dirichlet_noise and not eval_mode,
        dirichlet_alpha=cfg.actor_dirichlet_noise_alpha,
        dirichlet_epsilon=cfg.actor_dirichlet_noise_epsilon,
        use_gumbel_noise=cfg.actor_use_gumbel_noise and not eval_mode,
        use_gumbel=cfg.actor_use_gumbel,
        gumbel_sample_size=cfg.actor_gumbel_sample_size,
        gumbel_sigma_visit_c=cfg.actor_gumbel_sigma_visit_c,
        gumbel_sigma_scale_c=cfg.actor_gumbel_sigma_scale_c,
        select_by_count=cfg.actor_select_action_by_count or eval_mode,
    )


class MoveOutput(NamedTuple):
    """Per-move results for a batch of games (all device arrays)."""

    action: jnp.ndarray  # i32[B]
    turn: jnp.ndarray  # i32[B] — player who makes this move
    policy_target: jnp.ndarray  # f32[B, A] — P tag
    root_value: jnp.ndarray  # f32[B] — V tag (root mean)
    reward: jnp.ndarray  # f32[B] — R tag (env reward after the move)
    resign: jnp.ndarray  # bool[B] — search proposes resignation
    features: jnp.ndarray  # u8[B, H, W, C'] — pre-move planes (bit-packed
    # 8-per-byte for binary_features envs, utils/bitpack.py)
    states: Any  # stepped env states
    done: jnp.ndarray  # bool[B] — stepped state is terminal
    eval_score: jnp.ndarray  # f32[B] — eval score of stepped state
    resign_score: jnp.ndarray  # f32[B] — eval score if current player resigns


class ScanMoves(NamedTuple):
    """Stacked per-move outputs of ``move_scan`` ([M, B, ...] device arrays).

    ``resigned``/``ended`` record the device-side finish decisions so the
    host collector can replay them exactly: a ``resigned`` move is NOT
    recorded (reference actor_group.cpp:121-122); an ``ended`` move is
    recorded and then the game finalises with ``eval_score``."""

    action: jnp.ndarray  # i32[M, B]
    turn: jnp.ndarray  # i32[M, B]
    policy_target: jnp.ndarray  # f16[M, B, A] (record storage precision)
    root_value: jnp.ndarray  # f32[M, B]
    reward: jnp.ndarray  # f32[M, B]
    resign: jnp.ndarray  # bool[M, B] — raw search proposal
    features: jnp.ndarray  # u8[M, B, H, W, C]
    done: jnp.ndarray  # bool[M, B]
    eval_score: jnp.ndarray  # f32[M, B]
    resign_score: jnp.ndarray  # f32[M, B]
    resigned: jnp.ndarray  # bool[M, B] — finished by resignation this move
    ended: jnp.ndarray  # bool[M, B] — finished by termination this move


class SelfPlayEngine:
    """Batched self-play over one device (multi-host sharding layered on top,
    SURVEY.md §7 stage 8)."""

    def __init__(self, env: Env, cfg: Config, network, eval_mode: bool = False, use_bf16: bool = True,
                 use_think_batch: bool = False, _ablate: tuple = (),
                 _force_kernel_v2: bool = False, score_cond: bool = True):
        self.env = env
        self.cfg = cfg
        self.network = network
        # terminal-leaf scoring via lax.cond (see _leaf_scores). The cond
        # predicate is any(leaf_terminal) over the WHOLE batch, which under a
        # multi-process mesh is a cross-process all-reduce PER SIMULATION —
        # measured 50x move_scan slowdown on the 2-process CPU mesh. Sharded
        # self-play passes score_cond=False to keep the masked form instead.
        self.score_cond = score_cond
        # profiling hook (scripts/perf_ablate.py): skip named pieces of the
        # sim loop to attribute in-jit move time; never set in real runs
        self._ablate = frozenset(_ablate)
        self.is_muzero = not isinstance(network, AlphaZeroNetwork)
        # intra-tree leaf batching with virtual loss — console/eval only,
        # like the reference ("only works when running console",
        # configuration.cpp actor_mcts_think_batch_size). Both algorithms
        # (reference ZeroActor::step applies to az AND mz,
        # zero_actor.cpp:129-157): AlphaZero via think_batch_round below,
        # MuZero via muzero_search._think_batch_rounds.
        think_batch = cfg.actor_mcts_think_batch_size if use_think_batch else 1
        self.spec = search_spec_from_config(cfg, env.spec, eval_mode=eval_mode,
                                            think_batch=think_batch)
        self.use_rotation = (
            cfg.actor_use_random_rotation_features and not self.is_muzero and env.num_rotations() > 1
        )
        # bfloat16 inference: self-play forwards run the convs on the MXU in
        # bf16 (weights + activations); tree statistics stay float32
        self.compute_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
        # fused Pallas tree kernel (ops/tree_kernel.py): one op per
        # simulation for expand+backup+halving+select instead of ~95 XLA
        # fusions. Board-game fast path only; falls back to the XLA sim
        # loop otherwise. Interpreted off-TPU so CPU tests exercise it.
        kernel_ok = (
            not self.is_muzero
            and not self._ablate
            and type(env).reward is Env.reward  # zero in-tree rewards
        )
        # large-N AlphaZero uses the edge-indexed v2 kernel
        # (ops/tree_kernel_v2.py): O(A) per walk step instead of O(N*A), plus
        # packed-blob node embeddings fetched by a Pallas row gather. Small
        # trees (Gumbel n=16) stay on v1, whose fully vectorised one-hot form
        # wins when N is tiny.
        self.use_tree_kernel_v2 = (
            kernel_ok
            and supports_fused_tree_step_v2(self.spec)
            and (self.spec.max_nodes >= 48 or _force_kernel_v2)
        )
        self.use_tree_kernel = (
            kernel_ok
            and supports_fused_tree_step(self.spec)
            and not self.use_tree_kernel_v2
        )
        self._kernel_interpret = jax.default_backend() != "tpu"
        self._move = jax.jit(self._move_impl)
        self._move_scan = jax.jit(self._move_scan_impl, static_argnums=6)
        self._reset_slots = jax.jit(self._reset_slots_impl)
        self._init_batch = jax.jit(self._init_batch_impl, static_argnums=0)

    # ------------------------------------------------------------- env batch
    def _init_batch_impl(self, batch_size: int, rng):
        return jax.vmap(self.env.init_random)(jax.random.split(rng, batch_size))

    def init_batch(self, batch_size: int, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._init_batch(batch_size, rng)

    def _reset_slots_impl(self, states, mask, rng):
        batch = mask.shape[0]
        fresh = jax.vmap(self.env.init_random)(jax.random.split(rng, batch))
        return jax.tree_util.tree_map(
            lambda s, f: jnp.where(mask.reshape((-1,) + (1,) * (s.ndim - 1)), f, s), states, fresh
        )

    def reset_slots(self, states, mask, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(1)
        return self._reset_slots(states, jnp.asarray(mask), rng)

    # ------------------------------------------------------------- inference
    def _cast_variables(self, variables):
        dt = self.compute_dtype
        return jax.tree_util.tree_map(
            lambda x: x.astype(dt) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables
        )

    def _forward_features(self, variables, feats, rngs_rot):
        """AlphaZero net forward with optional random feature rotation
        (reference zero_actor.cpp:54-57, 222-223)."""
        if self.use_rotation:
            rots = jax.vmap(lambda k: jax.random.randint(k, (), 0, self.env.num_rotations()))(rngs_rot)
            feats = self.env.rotate_features_batch(feats, rots)
        out = self.network.apply(variables, feats.astype(self.compute_dtype), train=False)
        policy = out["policy"].astype(jnp.float32)
        logits = out["policy_logit"].astype(jnp.float32)
        if self.use_rotation:
            policy = self.env.rotate_policy_back_batch(policy, rots)
            logits = self.env.rotate_policy_back_batch(logits, rots)
        value = self._scalar_value(out)
        return policy, logits, value

    def _scalar_value(self, out) -> jnp.ndarray:
        if self.env.spec.discrete_value_size > 1:
            return from_discrete_value(out["value"].astype(jnp.float32))
        return out["value"][:, 0].astype(jnp.float32)

    def _scalar_reward(self, out) -> jnp.ndarray:
        if "reward" in out:
            return from_discrete_value(out["reward"].astype(jnp.float32))
        return jnp.zeros(out["policy"].shape[0], jnp.float32)

    # ---------------------------------------------------------------- search
    def _leaf_scores(self, leaf_states, leaf_terminal):
        """Terminal-leaf outcomes, f32[B]; zeros on non-terminal lanes.

        The true outcome only matters on the rare simulations where some
        game's leaf IS terminal, but the masked form pays the score every
        sim — for Go that is two flood-fill while-loops to the Tromp-Taylor
        fixpoint, 12.8% of gaz device time in the round-3 trace. A lax.cond
        over the whole state was measured slower than always scoring
        (~1.75 vs ~0.64 ms/sim — the conditional forces buffer copies at
        the region boundary), so the cond receives only the env's minimal
        score operand (``terminal_score_inputs``: the 83KB board for Go)."""
        env = self.env
        batch = leaf_terminal.shape[0]
        ops = jax.vmap(env.terminal_score_inputs)(leaf_states)
        if not self.score_cond:
            # sharded self-play: any() over the global batch would insert a
            # cross-process all-reduce per simulation (see __init__)
            return jnp.where(
                leaf_terminal, jax.vmap(env.eval_score_from)(ops), 0.0)
        return jax.lax.cond(
            jnp.any(leaf_terminal),
            lambda m, op: jnp.where(m, jax.vmap(env.eval_score_from)(op), 0.0),
            lambda m, op: jnp.zeros((batch,), jnp.float32),
            leaf_terminal, ops)

    def _move_impl(self, variables, states, rng, temperature):
        env, spec = self.env, self.spec
        batch = jax.tree_util.tree_leaves(states)[0].shape[0]
        turns = jax.vmap(env.turn)(states)
        feats = jax.vmap(env.features)(states)
        if env.spec.name.startswith("atari"):
            features_u8 = jnp.clip(feats * 255.0, 0, 255).astype(jnp.uint8)
        elif env.spec.binary_features:
            # 8 planes per byte: the record stream's feature planes dominate
            # device->host transfer (utils/bitpack.py); training unpacks
            features_u8 = pack_planes(feats)
        else:
            features_u8 = feats.astype(jnp.uint8)
        legal = jax.vmap(env.legal_mask)(states)

        rng, k_rot, k_noise = jax.random.split(rng, 3)
        variables = self._cast_variables(variables)

        if self.is_muzero:
            # the whole search (root inference + simulations + action) is the
            # shared device-side MuZero search (selfplay/muzero_search.py)
            from minizero_tpu.selfplay.muzero_search import make_muzero_search

            search = make_muzero_search(
                self.network, spec, env.action_features, env.spec.num_players,
                discrete_value=env.spec.discrete_value_size > 1,
                compute_dtype=self.compute_dtype,
                resign_threshold=self.cfg.actor_resign_threshold,
            )
            res = search(variables, feats, legal, turns.astype(jnp.int32), rng, temperature)
            action, policy_target, root_value, resign = (
                res.action, res.policy_target, res.root_value, res.resign,
            )
        else:
            action, policy_target, root_value, resign = self._alphazero_search(
                variables, states, feats, legal, turns, rng, k_rot, k_noise, temperature
            )

        stepped = jax.vmap(env.step)(states, action)
        done = jax.vmap(env.is_terminal)(stepped)
        eval_score = jax.vmap(env.eval_score)(stepped)
        reward_after = jax.vmap(env.reward)(stepped)
        resign_score = jax.vmap(env.resign_eval_score)(states)

        return MoveOutput(
            action=action,
            turn=turns.astype(jnp.int32),
            policy_target=policy_target,
            root_value=root_value,
            reward=reward_after,
            resign=resign,
            features=features_u8,
            states=stepped,
            done=done,
            eval_score=eval_score,
            resign_score=resign_score,
        )

    def _alphazero_search(self, variables, states, feats, legal, turns, rng, k_rot, k_noise, temperature):
        rng, k_sel = jax.random.split(rng)
        trees = self._alphazero_trees(variables, states, feats, legal, turns, rng, k_rot, k_noise)
        # ---- action decision (reference ZeroActor::decideActionNode,
        # zero_actor.cpp:178-192)
        return self._decide(trees, k_sel, temperature)

    def _az_root_trees(self, variables, states, feats, legal, turns, k_rot, k_noise, v2):
        """Root eval + tree init + root expansion/backup/noise (the pre-loop
        segment of every AlphaZero search; reference root handling in
        ZeroActor::afterNNEvaluation + addNoiseToNodeChildren)."""
        spec = self.spec
        batch = feats.shape[0]
        policy, logits, value = self._forward_features(
            variables, feats, jax.random.split(k_rot, batch)
        )
        root_embedding = states

        if v2:
            # v2 keeps env states in a packed blob outside the tree; skip the
            # [B, N, state] embedding allocation entirely
            proto = jnp.zeros((1,), jnp.int8)
        else:
            proto = jax.tree_util.tree_map(lambda x: x[0], root_embedding)
        trees = jax.vmap(lambda t: mcts.init_tree(spec, proto, t))(turns)
        no_parent = jnp.full((batch,), -1, jnp.int32)
        zeros_i = jnp.zeros((batch,), jnp.int32)
        falses = jnp.zeros((batch,), bool)
        trees = jax.vmap(
            functools.partial(mcts.expand_node, spec, store_embedding=False)
        )(trees, zeros_i, no_parent, zeros_i, turns, policy, logits, legal, falses)
        if not v2:
            # root embedding lives at slot 0 for every game: static-index store
            trees = trees.replace(embedding=jax.tree_util.tree_map(
                lambda full, st: full.at[:, 0].set(st.astype(full.dtype)),
                trees.embedding, root_embedding,
            ))
        trees = jax.vmap(functools.partial(mcts.backup, spec))(
            trees, zeros_i, value, jnp.zeros((batch,), jnp.float32)
        )
        trees = jax.vmap(functools.partial(mcts.add_root_noise, spec))(
            trees, jax.random.split(k_noise, batch)
        )
        if spec.use_gumbel:
            trees = jax.vmap(functools.partial(gz.init_candidates, spec))(trees)
        return trees, policy, logits

    def _alphazero_trees(self, variables, states, feats, legal, turns, rng, k_rot, k_noise):
        """AlphaZero search returning the finished trees: env states ride
        inside the tree as node embeddings, leaves are stepped envs evaluated
        on their true features (the TPU replacement for the reference's
        env-replay-to-leaf, zero_actor.cpp:247-252)."""
        env, spec = self.env, self.spec
        batch = feats.shape[0]

        trees, policy, logits = self._az_root_trees(
            variables, states, feats, legal, turns, k_rot, k_noise,
            v2=self.use_tree_kernel_v2)

        if self.use_tree_kernel_v2:
            return self._kernel_sim_loop_v2(variables, trees, states, rng)
        if self.use_tree_kernel:
            return self._kernel_sim_loop(variables, trees, rng)

        ablate = self._ablate

        def sim_body(s, carry):
            trees, rng = carry
            rng, k_rot = jax.random.split(rng)
            if "select" in ablate:
                sel = mcts.Selection(
                    parent=jnp.zeros((batch,), jnp.int32),
                    action=jnp.full((batch,), 0, jnp.int32),
                    leaf=jnp.full((batch,), -1, jnp.int32),
                    is_new=jnp.ones((batch,), bool),
                    dup=jnp.zeros((batch,), bool),
                )
            elif spec.use_gumbel:
                sel = jax.vmap(functools.partial(gz.gumbel_select_leaf, spec))(trees)
            else:
                sel = jax.vmap(lambda t: mcts.select_leaf(spec, t, jnp.int32(0)))(trees)

            parent_embedding = jax.tree_util.tree_map(
                lambda x: jax.vmap(lambda e, p: e[jnp.maximum(p, 0)])(x, sel.parent),
                trees.embedding,
            )

            if "step" in ablate:
                leaf_states = parent_embedding
                leaf_terminal = jnp.zeros((batch,), bool)
            else:
                leaf_states = jax.vmap(env.step)(parent_embedding, sel.action)
                leaf_terminal = jax.vmap(env.is_terminal)(leaf_states)
            if "feats" in ablate:
                leaf_feats = feats
            else:
                leaf_feats = jax.vmap(env.features)(leaf_states)
            if "net" in ablate:
                leaf_policy, leaf_logits = policy, logits  # reuse root outputs
                net_value = jnp.zeros((batch,), jnp.float32)
            else:
                leaf_policy, leaf_logits, net_value = self._forward_features(
                    variables, leaf_feats, jax.random.split(k_rot, batch)
                )
            # terminal leaves back up the true outcome instead of the net
            # value (reference zero_actor.cpp:79-86); _leaf_scores skips the
            # flood-fill on sims with no terminal leaf via a small-operand
            # lax.cond (a whole-state cond was measured slower than always
            # scoring: ~1.75 vs ~0.64 ms/sim, region-boundary copies)
            if "score" in ablate:
                scores = jnp.zeros((batch,), jnp.float32)
            else:
                scores = self._leaf_scores(leaf_states, leaf_terminal)
            value = jnp.where(leaf_terminal, scores, net_value)
            reward = jax.vmap(env.reward)(leaf_states)
            leaf_embedding = leaf_states
            leaf_legal = jax.vmap(env.legal_mask)(leaf_states)
            leaf_turn = jax.vmap(env.turn)(leaf_states)

            node_idx = jnp.full((batch,), s, jnp.int32)

            def per_game(tree, sel, policy, logits, legal, terminal, value, reward, turn, nidx):
                # no lax.cond: a vmapped cond executes both branches anyway,
                # so expand is predicated and backup runs for both cases
                tree = mcts.expand_node(
                    spec, tree, nidx, sel.parent, sel.action, turn,
                    policy, logits, legal, terminal, enabled=sel.is_new,
                    store_embedding=False,
                )
                start = jnp.where(sel.is_new, nidx, jnp.maximum(sel.leaf, 0))
                val = jnp.where(sel.is_new, value, tree.value[start])
                rew = jnp.where(sel.is_new, reward, tree.reward[start])
                return mcts.backup(spec, tree, start, val, rew, store_leaf=sel.is_new)

            if "expand" not in ablate:
                trees = jax.vmap(functools.partial(per_game))(
                    trees, sel, leaf_policy, leaf_logits, leaf_legal, leaf_terminal, value, reward,
                    leaf_turn, node_idx,
                )
            # node s is created at sim s: batch-uniform slot -> in-place DUS
            trees = mcts.store_embedding_batch(trees, s, leaf_embedding, sel.is_new)
            if spec.use_gumbel and "halving" not in ablate:
                trees = jax.vmap(functools.partial(gz.sequential_halving_tick, spec))(trees)
            return trees, rng

        def think_batch_round(r, carry):
            """One console think-batch round: K virtual-loss selections, ONE
            network forward over all K leaves, K (deduplicated) expansions +
            backups (reference ZeroActor::step, zero_actor.cpp:129-157)."""
            K = spec.think_batch
            trees, rng = carry
            rng, k_rot = jax.random.split(rng)
            sels = []
            for j in range(K):
                sim_idx = r * K + j + 1
                en = sim_idx <= spec.num_simulations  # last round may be short
                en_b = jnp.broadcast_to(en, (batch,))
                if spec.use_gumbel:
                    sel = jax.vmap(functools.partial(gz.gumbel_select_leaf, spec))(trees)
                else:
                    sel = jax.vmap(lambda t: mcts.select_leaf(spec, t, jnp.int32(0)))(trees)
                trees = jax.vmap(functools.partial(mcts.add_path_vloss, spec))(trees, sel, en_b)
                sels.append((sel, en))

            parents = jnp.stack([s.parent for s, _ in sels])  # [K, B]
            actions = jnp.stack([s.action for s, _ in sels])  # [K, B]
            parent_embedding = jax.tree_util.tree_map(
                lambda x: jax.vmap(
                    lambda pk: jax.vmap(lambda e, p: e[jnp.maximum(p, 0)])(x, pk)
                )(parents),
                trees.embedding,
            )  # [K, B, ...]

            def flat(x):
                return x.reshape((K * batch,) + x.shape[2:])

            def unflat(x):
                return x.reshape((K, batch) + x.shape[1:])

            parent_flat = jax.tree_util.tree_map(flat, parent_embedding)
            leaf_states = jax.vmap(env.step)(parent_flat, flat(actions))
            leaf_terminal = jax.vmap(env.is_terminal)(leaf_states)
            leaf_feats = jax.vmap(env.features)(leaf_states)
            leaf_policy, leaf_logits, net_value = self._forward_features(
                variables, leaf_feats, jax.random.split(k_rot, K * batch)
            )
            scores = self._leaf_scores(leaf_states, leaf_terminal)
            value = jnp.where(leaf_terminal, scores, net_value)
            reward = jax.vmap(env.reward)(leaf_states)
            leaf_legal = jax.vmap(env.legal_mask)(leaf_states)
            leaf_turn = jax.vmap(env.turn)(leaf_states)

            def per_game(tree, sel, policy, logits, legal, terminal, value, reward, turn, nidx, en):
                # fresh: first in-round selection of a new edge -> expand at
                # slot nidx and back up the network/terminal value. dup'd new
                # edges re-use the node the earlier in-round selection created
                # (children_index was just written); revisits and dups back up
                # the stored leaf value. Unlike the reference (which drops
                # dup'd queries and re-selects, zero_actor.cpp:141-144), every
                # selection here completes a simulation — fixed-shape loops
                # can't re-run selections, and the leaf value is known anyway.
                fresh = sel.is_new & ~sel.dup
                tree = mcts.expand_node(
                    spec, tree, nidx, sel.parent, sel.action, turn,
                    policy, logits, legal, terminal, enabled=fresh & en,
                    store_embedding=False,
                )
                known_node = jnp.where(
                    sel.is_new, tree.children_index[sel.parent, sel.action], sel.leaf
                )
                start = jnp.where(fresh, nidx, jnp.maximum(known_node, 0))
                val = jnp.where(fresh, value, tree.value[start])
                rew = jnp.where(fresh, reward, tree.reward[start])
                return mcts.backup(spec, tree, start, val, rew,
                                   store_leaf=fresh, enabled=en)

            for j, (sel, en) in enumerate(sels):
                slot = r * K + j + 1
                en_b = jnp.broadcast_to(en, (batch,))

                def jv(x):
                    return unflat(x)[j]

                trees = jax.vmap(per_game)(
                    trees, sel, jv(leaf_policy), jv(leaf_logits), jv(leaf_legal),
                    jv(leaf_terminal), jv(value), jv(reward), jv(leaf_turn),
                    jnp.full((batch,), 0, jnp.int32) + slot, en_b,
                )
                leaf_emb_j = jax.tree_util.tree_map(jv, leaf_states)
                trees = mcts.store_embedding_batch(
                    trees, slot, leaf_emb_j, sel.is_new & ~sel.dup & en_b
                )
                if spec.use_gumbel:
                    trees = jax.vmap(functools.partial(gz.sequential_halving_tick, spec))(trees)
            # end of round: every selection's virtual loss is removed
            # (reference zero_actor.cpp:152-156 nets out to zero)
            trees = trees.replace(evloss=jnp.zeros_like(trees.evloss),
                                  nvloss=jnp.zeros_like(trees.nvloss))
            return trees, rng

        if spec.think_batch > 1:
            trees, rng = jax.lax.fori_loop(
                0, -(-spec.num_simulations // spec.think_batch), think_batch_round, (trees, rng)
            )
        else:
            trees, rng = jax.lax.fori_loop(1, spec.num_simulations + 1, sim_body, (trees, rng))
        return trees

    def search_trees(self, variables, states, rng):
        """Run the full search and return the finished Tree batch — the
        analysis surface behind the console's ``tree_string`` (the reference
        dumps its node pool via Tree::getTreeInfo_r, tree.h:79-110).
        Compiled on first use."""
        if self.is_muzero:
            if not hasattr(self, "_mz_search_trees_jit"):
                from minizero_tpu.selfplay.muzero_search import make_muzero_search

                search = make_muzero_search(
                    self.network, self.spec, self.env.action_features,
                    self.env.spec.num_players,
                    discrete_value=self.env.spec.discrete_value_size > 1,
                    compute_dtype=self.compute_dtype,
                    resign_threshold=self.cfg.actor_resign_threshold,
                )

                def impl(variables, states, rng):
                    env = self.env
                    turns = jax.vmap(env.turn)(states).astype(jnp.int32)
                    feats = jax.vmap(env.features)(states)
                    legal = jax.vmap(env.legal_mask)(states)
                    variables = self._cast_variables(variables)
                    return search.search_trees(variables, feats, legal, turns, rng)
                self._mz_search_trees_jit = jax.jit(impl)
            return self._mz_search_trees_jit(variables, states, rng)
        if not hasattr(self, "_search_trees_jit"):
            def impl(variables, states, rng):
                env = self.env
                turns = jax.vmap(env.turn)(states)
                feats = jax.vmap(env.features)(states)
                legal = jax.vmap(env.legal_mask)(states)
                rng, k_rot, k_noise = jax.random.split(rng, 3)
                variables = self._cast_variables(variables)
                return self._alphazero_trees(
                    variables, states, feats, legal, turns, rng, k_rot, k_noise)
            self._search_trees_jit = jax.jit(impl)
        return self._search_trees_jit(variables, states, rng)

    def _kernel_phase0(self, trees):
        """Mask conversion + phase-0 selection (tree already has the expanded
        root); returns the chunkable v1-kernel sim carry (trees_i32, sel)."""
        spec = self.spec
        batch = trees.visits.shape[0]
        # masks ride as int32 through the whole loop (Mosaic cannot address
        # 1-bit memory; converting once per move beats converting per sim)
        i32 = jnp.int32
        trees = trees.replace(
            expanded=trees.expanded.astype(i32),
            terminal=trees.terminal.astype(i32),
            legal=trees.legal.astype(i32),
            gumbel_active=trees.gumbel_active.astype(i32),
        )
        zeros_f = jnp.zeros((batch, spec.action_size), jnp.float32)
        zeros_b = jnp.zeros((batch, spec.action_size), bool)
        dummy = (zeros_f, zeros_f, zeros_b, jnp.zeros((batch,), bool),
                 jnp.zeros((batch,), jnp.float32), jnp.ones((batch,), jnp.int32))
        sel0 = NextSelection(
            parent=jnp.zeros((batch,), jnp.int32),
            action=jnp.zeros((batch,), jnp.int32),
            leaf=jnp.full((batch,), -1, jnp.int32),
            is_new=jnp.zeros((batch,), bool),
            path=jnp.zeros((batch, spec.max_nodes), bool),
        )
        trees, sel = fused_tree_step(
            spec, trees, sel0, *dummy, 0, 0, interpret=self._kernel_interpret)
        return trees, sel

    @staticmethod
    def _kernel_masks_to_bool(trees):
        if trees.expanded.dtype != jnp.bool_:
            trees = trees.replace(
                expanded=trees.expanded > 0, terminal=trees.terminal > 0,
                legal=trees.legal > 0, gumbel_active=trees.gumbel_active > 0,
            )
        return trees

    # ------------------------------------------------- timed (console) search
    # Wall-clock think cap (reference ZeroActor::think, zero_actor.cpp:36-49):
    # a jitted search cannot be interrupted mid-flight, so the console runs
    # the sim loop in host-visible CHUNKS over the v1 kernel carry
    # (trees, next_selection, rng), checks the clock between chunks, and
    # decides from the partial tree — the same "decide from whatever the
    # tree holds" semantics as the reference's early-broken think loop.
    # AlphaZero board games only (the v1 kernel's domain); one leaf per sim.

    def supports_timed_search(self) -> bool:
        return (not self.is_muzero) and supports_fused_tree_step(self.spec)

    def az_init_timed(self, variables, states, rng):
        if not hasattr(self, "_az_init_timed_jit"):
            def impl(variables, states, rng):
                env = self.env
                turns = jax.vmap(env.turn)(states)
                feats = jax.vmap(env.features)(states)
                legal = jax.vmap(env.legal_mask)(states)
                rng, k_rot, k_noise = jax.random.split(rng, 3)
                cast = self._cast_variables(variables)
                trees, _, _ = self._az_root_trees(
                    cast, states, feats, legal, turns, k_rot, k_noise, v2=False)
                trees, sel = self._kernel_phase0(trees)
                pending = jax.tree_util.tree_map(lambda x: x[:, 0], trees.embedding)
                return trees, sel, pending, rng
            self._az_init_timed_jit = jax.jit(impl)
        return self._az_init_timed_jit(variables, states, rng)

    def az_advance_timed(self, variables, carry, lo, hi):
        """Run simulations [lo, hi) on an in-flight timed search carry."""
        cache = getattr(self, "_az_advance_timed_jit", None)
        if cache is None:
            cache = self._az_advance_timed_jit = {}
        key = (lo, hi)
        if key not in cache:
            def impl(variables, carry):
                trees, sel, pending, rng = carry
                cast = self._cast_variables(variables)
                sim_body = self._make_kernel_sim_body(cast, trees.visits.shape[0])
                return jax.lax.fori_loop(lo, hi, sim_body, (trees, sel, pending, rng))
            cache[key] = jax.jit(impl)
        return cache[key](variables, carry)

    def az_finish_timed(self, carry, temperature: float = 1.0):
        """Decide from the (possibly partial) tree; returns
        (action, policy_target, root_value, resign, trees)."""
        if not hasattr(self, "_az_finish_timed_jit"):
            def impl(carry, temperature):
                trees, _, _, rng = carry
                trees = self._kernel_masks_to_bool(trees)
                _, k_sel = jax.random.split(rng)
                action, policy_target, root_value, resign = self._decide(
                    trees, k_sel, temperature)
                return action, policy_target, root_value, resign, trees
            self._az_finish_timed_jit = jax.jit(impl)
        return self._az_finish_timed_jit(carry, jnp.float32(temperature))

    def _kernel_sim_loop(self, variables, trees, rng):
        """Sim loop driven by the fused Pallas tree kernel: per simulation,
        ONE tree op (expand+backup+halving+next-select) plus the env/network
        evaluation of the selected leaf."""
        env, spec = self.env, self.spec
        batch = trees.visits.shape[0]
        bool_masks = trees.expanded.dtype == jnp.bool_
        trees, sel = self._kernel_phase0(trees)
        pending = jax.tree_util.tree_map(lambda x: x[:, 0], trees.embedding)

        sim_body = self._make_kernel_sim_body(variables, batch)
        trees, _, _, rng = jax.lax.fori_loop(
            1, spec.num_simulations + 1, sim_body, (trees, sel, pending, rng))
        if bool_masks:
            trees = self._kernel_masks_to_bool(trees)
        return trees

    def _make_kernel_sim_body(self, variables, batch):
        """One v1-kernel simulation: leaf env step + net eval + fused tree op.
        Carry = (trees_i32, next_selection, pending_embedding, rng).

        ``pending`` is the PREVIOUS simulation's leaf state, stored into its
        node slot at the START of this iteration — before the one-hot parent
        read — so the carried [B, N, ...] embedding arrays see write-then-read
        order and stay in place. The original read-then-write order (pick
        parent, then store this sim's leaf at the end) made XLA keep a second
        copy of the embedding buffers live across every iteration (~50 MB/sim
        at Go9 b=1024 — the fori-loop 'self time' in the round-3 trace).
        Storing unconditionally (no ``enabled`` mask) is correct because node
        ``s`` is only ever referenced when sim ``s`` created it."""
        env, spec = self.env, self.spec
        iota_n = jnp.arange(spec.max_nodes, dtype=jnp.int32)

        def pick_parent(oh, x):
            # one-hot masked reduce instead of a per-lane gather: exactly one
            # node matches, so the native-dtype sum is exact (incl. int32
            # Zobrist hashes), and no gather means no per-sim layout copies
            # of the big [B, N, ...] embedding arrays
            m = oh.reshape(oh.shape + (1,) * (x.ndim - 2))
            return jnp.sum(jnp.where(m, x, jnp.zeros((), x.dtype)), axis=1, dtype=x.dtype)

        def sim_body(s, carry):
            trees, sel, pending, rng = carry
            trees = mcts.store_embedding_batch(trees, s - 1, pending)
            rng, k_rot = jax.random.split(rng)
            parent_oh = jnp.maximum(sel.parent, 0)[:, None] == iota_n[None, :]
            parent_embedding = jax.tree_util.tree_map(
                functools.partial(pick_parent, parent_oh), trees.embedding,
            )
            leaf_states = jax.vmap(env.step)(parent_embedding, sel.action)
            leaf_terminal = jax.vmap(env.is_terminal)(leaf_states)
            leaf_feats = jax.vmap(env.features)(leaf_states)
            leaf_policy, leaf_logits, net_value = self._forward_features(
                variables, leaf_feats, jax.random.split(k_rot, batch)
            )
            scores = self._leaf_scores(leaf_states, leaf_terminal)
            value = jnp.where(leaf_terminal, scores, net_value)
            leaf_legal = jax.vmap(env.legal_mask)(leaf_states)
            leaf_turn = jax.vmap(env.turn)(leaf_states).astype(jnp.int32)

            trees, nsel = fused_tree_step(
                spec, trees, sel, leaf_policy, leaf_logits, leaf_legal,
                leaf_terminal, value, leaf_turn, s, 1,
                interpret=self._kernel_interpret)
            return trees, nsel, leaf_states, rng

        return sim_body

    def _kernel_sim_loop_v2(self, variables, trees, root_states, rng):
        """Large-N AlphaZero sim loop on the edge-indexed v2 kernel.

        Env states live in a packed int32 blob ([B, N, W],
        ``ops/state_blob.py``); the selected parent's state is fetched by a
        Pallas row gather (O(state bytes) instead of the one-hot pick's
        O(N * state bytes)). Node capacity is staged (65 -> 129 -> ... -> N)
        so early simulations stream only the rows that can exist yet."""
        from minizero_tpu.ops.gather_rows import gather_rows
        from minizero_tpu.ops.state_blob import blob_spec, pack_rows, unpack_rows

        env, spec = self.env, self.spec
        batch = trees.visits.shape[0]
        n = spec.max_nodes
        interp = self._kernel_interpret

        bspec = blob_spec(jax.tree_util.tree_map(lambda x: x[0], root_states))
        # gather_rows DMAs need tile-aligned HBM slices: node dim rounded to
        # the sublane tile (8), row width to the lane tile (128)
        wpad = -(-bspec.width // 128) * 128

        def pad_w(rows):  # [B, width] -> [B, wpad]
            return jnp.pad(rows, ((0, 0), (0, wpad - bspec.width)))

        blob = jnp.zeros((batch, -(-n // 8) * 8, wpad), jnp.int32)
        blob = jax.lax.dynamic_update_slice_in_dim(
            blob, pad_w(pack_rows(bspec, root_states))[:, None], 0, axis=1)

        # capacity stages: sims in [lo, cap) run on capacity-cap arrays
        caps = []
        c = 65
        while c < n:
            caps.append(c)
            c = (c - 1) * 2 + 1
        caps.append(n)

        packed = pack_trees(spec, trees, caps[0])
        zeros_f = jnp.zeros((batch, spec.action_size), jnp.float32)
        zeros_b = jnp.zeros((batch, spec.action_size), bool)
        dummy = (zeros_f, zeros_b, jnp.zeros((batch,), bool),
                 jnp.zeros((batch,), jnp.float32), jnp.ones((batch,), jnp.int32))
        sel = empty_selection_v2(spec, batch, caps[0])
        packed, sel = fused_tree_step_v2(
            spec, packed, sel, *dummy, 0, 0, interpret=interp)

        def sim_body(s, carry):
            """Carry = (packed, sel, blob, pending_row, rng). The previous
            sim's leaf row is stored at the START of the iteration — before
            the gather — so the blob sees write-then-read order and updates
            in place; the original gather-then-update order made XLA keep a
            second copy of the ~0.6 GB blob live across every simulation.
            The store is unconditional (no is_new mask, so no read of the
            current row either): node s-1 is only referenced if sim s-1
            created it, so clobbering an unallocated slot is harmless."""
            packed, sel, blob, pending, rng = carry
            blob = jax.lax.dynamic_update_slice_in_dim(
                blob, pending[:, None], s - 1, axis=1)
            rng, k_rot = jax.random.split(rng)
            prow = gather_rows(blob, jnp.maximum(sel.parent, 0),
                               interpret=interp)
            parent_states = unpack_rows(bspec, prow[:, :bspec.width])
            leaf_states = jax.vmap(env.step)(parent_states, sel.action)
            leaf_terminal = jax.vmap(env.is_terminal)(leaf_states)
            leaf_feats = jax.vmap(env.features)(leaf_states)
            leaf_policy, _, net_value = self._forward_features(
                variables, leaf_feats, jax.random.split(k_rot, batch)
            )
            scores = self._leaf_scores(leaf_states, leaf_terminal)
            value = jnp.where(leaf_terminal, scores, net_value)
            leaf_legal = jax.vmap(env.legal_mask)(leaf_states)
            leaf_turn = jax.vmap(env.turn)(leaf_states).astype(jnp.int32)

            packed, nsel = fused_tree_step_v2(
                spec, packed, sel, leaf_policy, leaf_legal, leaf_terminal,
                value, leaf_turn, s, 1, interpret=interp)
            row = pad_w(pack_rows(bspec, leaf_states))
            return packed, nsel, blob, row, rng

        lo = 1
        pending = blob[:, 0]  # root row: re-stored at s=1, idempotent
        carry = (packed, sel, blob, pending, rng)
        for cap in caps:
            packed, sel, blob, pending, rng = carry
            if packed.visits.shape[1] < cap:
                packed = grow(packed, cap)
                sel = sel._replace(path=jnp.pad(
                    sel.path, ((0, 0), (0, cap - sel.path.shape[1]))))
            carry = jax.lax.fori_loop(
                lo, cap, sim_body, (packed, sel, blob, pending, rng))
            lo = cap
        packed = carry[0]
        return unpack_trees(spec, packed, trees)

    def _decide(self, trees, k_sel, temperature):
        spec = self.spec
        batch = trees.visits.shape[0]
        sel_keys = jax.random.split(k_sel, batch)
        if spec.use_gumbel:
            if spec.select_by_count:
                action = jax.vmap(functools.partial(gz.decide_action, spec))(trees)
            else:
                action = jax.vmap(
                    lambda t, k: mcts.select_action_by_softmax_count(spec, t, k, temperature)
                )(trees, sel_keys)
            policy_target = jax.vmap(functools.partial(gz.improved_policy_target, spec))(trees)
        else:
            if spec.select_by_count:
                action = jax.vmap(mcts.select_action_by_max_count)(trees)
            else:
                action = jax.vmap(
                    lambda t, k: mcts.select_action_by_softmax_count(spec, t, k, temperature)
                )(trees, sel_keys)
            policy_target = jax.vmap(mcts.mcts_policy_target)(trees)

        resign = jax.vmap(
            lambda t, a: mcts.is_resign(spec, t, a, self.cfg.actor_resign_threshold)
        )(trees, action)
        return action, policy_target, trees.mean[:, 0], resign

    def move(self, variables, states, rng, temperature: float = 1.0) -> MoveOutput:
        return self._move(variables, states, rng, jnp.float32(temperature))

    # ------------------------------------------------------------ multi-move
    def _move_scan_impl(self, variables, states, rng, temperature,
                        enable_resign, moves_since_reset, num_moves):
        """``num_moves`` moves in ONE jitted scan: move -> finish decision ->
        in-scan slot reset. Collapses per-move host dispatch (each costs a
        tunnel/runtime round trip) into one call per chunk; the finished-game
        bookkeeping the host loop used to do (resign gating, max-move cap,
        reset) runs on device and is reported back via ScanMoves."""
        disable_ratio = float(self.cfg.zero_disable_resign_ratio)
        max_moves = int(max(self.env.spec.max_game_length, 1) * 2)

        def body(carry, _):
            states, rng, enable, msr = carry
            rng, k_move, k_reset, k_enable = jax.random.split(rng, 4)
            out = self._move_impl(variables, states, k_move, temperature)
            # resign requires a prior recorded move (collector contract);
            # resign takes precedence over done (checked first on the host)
            resigned = out.resign & enable & (msr > 0)
            ended = (out.done | (msr + 1 >= max_moves)) & ~resigned
            reset = resigned | ended
            new_states = self._reset_slots_impl(out.states, reset, k_reset)
            fresh_enable = jax.random.uniform(k_enable, reset.shape) >= disable_ratio
            new_enable = jnp.where(reset, fresh_enable, enable)
            new_msr = jnp.where(reset, 0, msr + 1)
            emit = ScanMoves(
                action=out.action, turn=out.turn,
                # records store policy targets as f16 anyway — transfer f16
                # (halves the second-largest device->host stream)
                policy_target=out.policy_target.astype(jnp.float16),
                root_value=out.root_value, reward=out.reward, resign=out.resign,
                features=out.features, done=out.done, eval_score=out.eval_score,
                resign_score=out.resign_score, resigned=resigned, ended=ended,
            )
            return (new_states, rng, new_enable, new_msr), emit

        carry = (states, rng, enable_resign, moves_since_reset)
        (states, rng, enable, msr), stacked = jax.lax.scan(
            body, carry, None, length=num_moves)
        return stacked, states, enable, msr

    def move_scan(self, variables, states, rng, temperature: float = 1.0,
                  num_moves: int = 8, enable_resign=None, moves_since_reset=None):
        """Advance every game ``num_moves`` moves (with in-scan resets) in a
        single dispatch. Returns ``(ScanMoves, states, enable_resign,
        moves_since_reset)``; thread the last two back in across chunks."""
        batch = jax.tree_util.tree_leaves(states)[0].shape[0]
        if enable_resign is None:
            enable_resign = jnp.ones((batch,), bool)
        if moves_since_reset is None:
            moves_since_reset = jnp.zeros((batch,), jnp.int32)
        return self._move_scan(
            variables, states, rng, jnp.float32(temperature),
            jnp.asarray(enable_resign), jnp.asarray(moves_since_reset, jnp.int32),
            int(num_moves))
