"""Training step.

TPU-native re-design of the reference trainer (``minizero/learner/train.py``):
the same losses — policy CE (KL for Gumbel), value MSE (scalar) or CE
(distributional), reward CE, per-sample PER loss scaling, MuZero k-step unroll
with gradient halving on the hidden state — but as a single jitted/pjit-able
function with donated state, rotation augmentation fused on device (the
reference rotates on CPU in the data loader, ``data_loader.cpp:140,167``),
and optax replicating torch SGD/Adam/AdamW semantics with the reference's
StepLR(1e6, 0.1) schedule (``train.py:100-117``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from minizero_tpu.config import Config
from minizero_tpu.envs.base import Env
from minizero_tpu.utils import rotation as rot
from minizero_tpu.utils.transforms import to_discrete_value, transform_value


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # i32 scalar — training_step in the reference


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """torch-equivalent optimizers (reference train.py:100-117): weight decay
    added to the raw gradient before the momentum/Adam moments, and
    StepLR(step_size=1e6, gamma=0.1)."""
    lr0 = cfg.learner_learning_rate

    def schedule(step):
        return lr0 * jnp.power(0.1, step // 1_000_000)

    name = cfg.learner_optimizer.lower()
    if name == "adam":
        return optax.chain(
            optax.add_decayed_weights(cfg.learner_weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_schedule(lambda s: -schedule(s)),
        )
    if name == "adamw":
        return optax.chain(
            optax.scale_by_adam(),
            optax.add_decayed_weights(cfg.learner_weight_decay),
            optax.scale_by_schedule(lambda s: -schedule(s)),
        )
    # SGD + momentum (default)
    return optax.chain(
        optax.add_decayed_weights(cfg.learner_weight_decay),
        optax.trace(decay=cfg.learner_momentum),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    )


def init_train_state(cfg: Config, variables: Dict[str, Any]) -> TrainState:
    tx = make_optimizer(cfg)
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.int32(0),
    )


def scale_gradient(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Identity forward, gradient scaled backward (reference train.py:207
    ``register_hook(lambda grad: grad / 2)``)."""
    return x * scale + jax.lax.stop_gradient(x * (1.0 - scale))


def _policy_loss(cfg: Config, logits, label, loss_scale):
    logp = jax.nn.log_softmax(logits, axis=-1)
    if cfg.use_gumbel:
        # KL(label || p) summed over actions (reference train.py:133)
        safe = jnp.where(label > 0, label, 1.0)
        per = jnp.sum(label * (jnp.log(safe) - logp), axis=-1)
    else:
        per = -jnp.sum(label * logp, axis=-1)
    return jnp.mean(per * loss_scale)


def _value_loss(cfg: Config, out, label_value, loss_scale, value_size: int):
    if value_size == 1:
        # label [B] scalar vs net [B, 1] (reference train.py:139)
        err = (out["value"][:, 0] - label_value) ** 2
        return jnp.mean(err * loss_scale)
    # distributional: label [B, value_size] two-hot
    logp = jax.nn.log_softmax(out["value_logit"], axis=-1)
    return jnp.mean(-jnp.sum(label_value * logp, axis=-1) * loss_scale)


def _policy_accuracy(logits, label):
    return jnp.mean((jnp.argmax(logits, -1) == jnp.argmax(label, -1)).astype(jnp.float32))


def _augment_rotation(env: Env, rng, feats, policies, actions=None):
    """Per-sample random rotation of features + policy targets (+ MuZero
    action ids), fused on device (reference data_loader.cpp:140-146,
    166-177)."""
    b = feats.shape[0]
    n = env.num_rotations()
    if n <= 1:
        return feats, policies, actions
    rots = jax.random.randint(rng, (b,), 0, n)
    feats = jax.vmap(lambda f, r: env.rotate_features(f, r))(feats, rots)
    # policy label rotation: rotated_policy[rot(a)] = policy[a] — the inverse
    # gather of rotate_policy_back
    board = env.spec.board_size
    a_size = env.spec.action_size
    table = jnp.asarray(rot.action_rotation_table(board, a_size))
    inv = jnp.asarray(rot.REVERSED_ROTATION)

    def rot_policy(p, r):
        return jnp.take(p, table[inv[r]], axis=-1)

    if policies.ndim == 2:
        policies = jax.vmap(rot_policy)(policies, rots)
    else:  # [B, K+1, A]
        policies = jax.vmap(lambda ps, r: jax.vmap(lambda p: rot_policy(p, r))(ps))(policies, rots)
    if actions is not None:
        actions = jax.vmap(lambda acts, r: table[r][acts])(actions, rots)
    return feats, policies, actions


def make_train_step(cfg: Config, env: Env, network):
    """Returns ``train_step(state, batch, rng) -> (state, metrics)`` (one
    optimizer update; the reference's per-step body, train.py:163-219).
    With PER enabled, metrics carry ``_new_values`` — the fresh root value
    estimates used to refresh sampled priorities (reference
    train.py:208-209)."""
    tx = make_optimizer(cfg)
    value_size = env.spec.discrete_value_size

    def _scalar_value(out):
        if value_size == 1:
            return jax.lax.stop_gradient(out["value"][:, 0])
        from minizero_tpu.utils.transforms import from_discrete_value

        return jax.lax.stop_gradient(from_discrete_value(out["value"]))
    is_muzero = cfg.nn_type_name.lower() != "alphazero"
    k_unroll = cfg.learner_muzero_unrolling_step

    def prepare_value_label(value):
        """Scalar targets for scalar heads; transformed two-hot for
        distributional heads (reference atari.cpp:279-294)."""
        if value_size == 1:
            return value
        return to_discrete_value(transform_value(value), value_size)

    # replay stores u8 planes; atari's encode real values scaled by 255
    # (host_engine.move stores clip(f*255)), board games store 0/1
    feat_scale = 1.0 / 255.0 if env.spec.name.startswith("atari") else 1.0

    def alphazero_loss(params, batch_stats, batch, rng):
        feats = batch["features"].astype(jnp.float32) * feat_scale
        feats, policy_label, _ = _augment_rotation(
            env, rng, feats, batch["policy"].astype(jnp.float32))
        out, mutated = network.apply(
            {"params": params, "batch_stats": batch_stats}, feats, train=True, mutable=["batch_stats"]
        )
        ls = batch["loss_scale"]
        loss_p = _policy_loss(cfg, out["policy_logit"], policy_label, ls)
        loss_v = _value_loss(cfg, out, prepare_value_label(batch["value"]), ls, value_size)
        loss = loss_p + cfg.learner_value_loss_scale * loss_v
        metrics = {
            "loss": loss,
            "loss_policy": loss_p,
            "loss_value": loss_v,
            "accuracy_policy": _policy_accuracy(out["policy_logit"], policy_label),
        }
        if cfg.learner_use_per:
            metrics["_new_values"] = _scalar_value(out)
        return loss, (mutated["batch_stats"], metrics)

    # remat the Atari unroll: without it the b=256 train step's activations
    # (96x96 feature stack through the downsampling representation + 5
    # recurrent steps, all held live for the backward) need ~30 GB — double
    # a v5e chip's 16 GB HBM. jax.checkpoint recomputes each sub-forward in
    # the backward instead (HBM-bandwidth-for-memory, the standard TPU
    # trade); board games are small enough to skip the recompute cost.
    use_remat = env.spec.name.startswith("atari")

    def _initial_apply(params, batch_stats, feats):
        return network.apply(
            {"params": params, "batch_stats": batch_stats}, feats, train=True,
            mutable=["batch_stats"], method=network.initial_inference)

    def _recurrent_apply(params, batch_stats, hidden, planes):
        return network.apply(
            {"params": params, "batch_stats": batch_stats}, hidden, planes,
            train=True, mutable=["batch_stats"], method=network.recurrent_inference)

    if use_remat:
        _initial_apply = jax.checkpoint(_initial_apply)
        _recurrent_apply = jax.checkpoint(_recurrent_apply)

    def muzero_loss(params, batch_stats, batch, rng):
        feats = batch["features"].astype(jnp.float32) * feat_scale
        feats, policy_label, actions = _augment_rotation(
            env, rng, feats, batch["policy"].astype(jnp.float32), batch["actions"])
        ls = batch["loss_scale"]
        value_label = prepare_value_label(batch["value"])  # [B, K+1(, V)]
        has_reward = "reward" in batch and env.spec.name.startswith("atari")
        reward_label = prepare_value_label(batch["reward"]) if has_reward else None

        out, mutated = _initial_apply(params, batch_stats, feats)
        batch_stats = mutated["batch_stats"]
        loss_p = _policy_loss(cfg, out["policy_logit"], policy_label[:, 0], ls)
        loss_v = _value_loss(cfg, out, value_label[:, 0], ls, value_size)
        loss_r = 0.0
        acc0 = _policy_accuracy(out["policy_logit"], policy_label[:, 0])
        root_value = _scalar_value(out) if cfg.learner_use_per else None
        hidden = out["hidden_state"]
        # k-step unroll through dynamics (reference train.py:195-210)
        for i in range(k_unroll):
            hidden = scale_gradient(hidden, 0.5)
            planes = jax.vmap(env.action_features)(actions[:, i])
            out, mutated = _recurrent_apply(params, batch_stats, hidden, planes)
            batch_stats = mutated["batch_stats"]
            hidden = out["hidden_state"]
            loss_p = loss_p + _policy_loss(cfg, out["policy_logit"], policy_label[:, i + 1], ls) / k_unroll
            loss_v = loss_v + _value_loss(cfg, out, value_label[:, i + 1], ls, value_size) / k_unroll
            if has_reward:
                logp = jax.nn.log_softmax(out["reward_logit"], axis=-1)
                step_r = jnp.mean(-jnp.sum(reward_label[:, i] * logp, axis=-1) * ls)
                loss_r = loss_r + step_r / k_unroll
        loss = loss_p + cfg.learner_value_loss_scale * loss_v + loss_r
        metrics = {
            "loss": loss,
            "loss_policy": loss_p,
            "loss_value": loss_v,
            "loss_reward": jnp.asarray(loss_r, jnp.float32),
            "accuracy_policy": acc0,
        }
        if root_value is not None:
            metrics["_new_values"] = root_value
        return loss, (batch_stats, metrics)

    loss_fn = muzero_loss if is_muzero else alphazero_loss

    def train_step(state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(state.params, state.batch_stats, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, batch_stats=new_stats, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return train_step
