"""Evaluation matches + Elo.

TPU-native replacement for the reference's gogui-twogtp shell harnesses
(``tools/self-eval.sh``, ``tools/fight-eval.sh``): instead of two GTP
processes per game, a whole batch of head-to-head games runs on device in
lock-step — both candidate networks evaluate every position and each game
takes the action of the network owning the player to move, with colours
alternated across the batch (the reference alternates colours per game pair,
``self-eval.sh:86-118``). Elo from win rate matches ``tools/eval.py:64-71``:
``400 * log10(w / (1 - w))``.
"""

from __future__ import annotations

import math
import os
import pickle
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from minizero_tpu.config import Config
from minizero_tpu.envs import make_env
from minizero_tpu.models.factory import create_network, init_network
from minizero_tpu.selfplay.engine import SelfPlayEngine


@dataclass
class MatchResult:
    p1_wins: int
    p2_wins: int
    draws: int

    @property
    def games(self) -> int:
        return self.p1_wins + self.p2_wins + self.draws

    @property
    def p1_win_rate(self) -> float:
        # draws count half, like twogtp scoring
        return (self.p1_wins + 0.5 * self.draws) / max(self.games, 1)


def elo_from_win_rate(win_rate: float) -> float:
    """reference tools/eval.py compute_elo: 400*log10(w/(1-w)) capped to
    +/-1000 per match (sweeps count +/-1000)."""
    if win_rate >= 1.0:
        return 1000.0
    if win_rate <= 0.0:
        return -1000.0
    return max(min(400.0 * math.log10(win_rate / (1.0 - win_rate)), 1000.0), -1000.0)


def load_checkpoint_variables(path: str, cfg: Config, network, spec):
    """Read a ZeroLoop checkpoint into inference variables."""
    from flax import serialization

    from minizero_tpu.learner.train import init_train_state

    variables = init_network(network, spec, jax.random.PRNGKey(0))
    with open(path, "rb") as f:
        payload = pickle.load(f)
    state = init_train_state(cfg, variables)
    state = serialization.from_bytes(state, payload["state"])
    out = {"params": state.params}
    if state.batch_stats:
        out["batch_stats"] = state.batch_stats
    return out


# envs whose turn strictly alternates every action (pass/swap are explicit
# actions) — the precondition for the synchronized fast match path
_ALTERNATING = ("go", "killallgo", "nogo", "tictactoe", "othello", "gomoku",
                "hex", "havannah", "breakthrough", "clobber")


def play_match(
    cfg: Config,
    variables_a,
    variables_b,
    num_games: int = 100,
    seed: int = 0,
    max_moves: Optional[int] = None,
    opening_random_plies: int = 0,
) -> MatchResult:
    """Head-to-head A-vs-B with alternating colours; returns A's result.

    Eval recipe per the reference (``README.md:203``): sims from cfg,
    argmax-count selection, no exploration noise (``eval_mode=True``).

    Fast path (turn-alternating envs): games stay ply-synchronized — no
    mid-stream resets — so each ply needs ONE batched search (the mover's)
    instead of both engines searching every position, and whole rounds of
    plies run inside a single jitted scan per dispatch (per-move dispatch
    over the TPU tunnel costs a host round trip each, CLAUDE.md). Colours
    balance across the whole match via per-colour game budgets; finished
    slots freeze via masking.

    ``opening_random_plies``: play the first K plies uniformly at random
    over legal moves (per slot) before either net moves. Deterministic
    board eval otherwise collapses a whole batch to ONE distinct game per
    colour for nets without per-search randomness — MuZero engines here,
    where the reference's usual diversity source (random feature rotation)
    does not apply (actor_use_random_rotation_features is AlphaZero-only,
    configuration.cpp).
    """
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    if cfg.env_name in _ALTERNATING or any(
            cfg.env_name.startswith(p) for p in _ALTERNATING):
        return _play_match_synchronized(
            env, cfg, net, variables_a, variables_b, num_games, seed, max_moves,
            opening_random_plies)
    engine_a = SelfPlayEngine(env, cfg, net, eval_mode=True)
    engine_b = SelfPlayEngine(env, cfg, net, eval_mode=True)

    batch = min(num_games, max(cfg.zero_num_parallel_games, 1))
    rng = jax.random.PRNGKey(seed)
    a_wins = b_wins = draws = 0
    played = 0
    # colour of A per slot: slot i -> A plays (i % 2) + 1
    a_colour = np.array([(i % 2) + 1 for i in range(batch)], np.int8)
    rng, k = jax.random.split(rng)
    states = engine_a.init_batch(batch, k)
    moves = 0
    cap = max_moves or env.spec.max_game_length + 8

    while played < num_games and moves < cap * (num_games // batch + 2):
        rng, ka, kb = jax.random.split(rng, 3)
        out_a = engine_a.move(variables_a, states, ka)
        out_b = engine_b.move(variables_b, states, kb)
        turns = np.asarray(out_a.turn)
        use_a = turns == a_colour
        actions = np.where(use_a, np.asarray(out_a.action), np.asarray(out_b.action))
        # step all games with the chosen actions through engine A's env
        import jax.numpy as jnp

        states = jax.vmap(env.step)(states, jnp.asarray(actions, jnp.int32))
        done = np.asarray(jax.vmap(env.is_terminal)(states))
        moves += 1
        if done.any():
            scores = np.asarray(jax.vmap(env.eval_score)(states))
            reset_mask = np.zeros(batch, bool)
            for i in np.nonzero(done)[0]:
                if played >= num_games:
                    break
                s = float(scores[i])
                a_is_p1 = a_colour[i] == 1
                if s > 0:
                    a_wins += 1 if a_is_p1 else 0
                    b_wins += 0 if a_is_p1 else 1
                elif s < 0:
                    b_wins += 1 if a_is_p1 else 0
                    a_wins += 0 if a_is_p1 else 1
                else:
                    draws += 1
                played += 1
                reset_mask[i] = True
                a_colour[i] = 3 - a_colour[i]  # alternate colours
            if reset_mask.any():
                rng, kr = jax.random.split(rng)
                states = engine_a.reset_slots(states, reset_mask, kr)
    return MatchResult(p1_wins=a_wins, p2_wins=b_wins, draws=draws)


def _play_match_synchronized(env, cfg, net, variables_a, variables_b,
                             num_games: int, seed: int,
                             max_moves: Optional[int],
                             opening_random_plies: int = 0) -> MatchResult:
    """Fast eval path: rounds of ply-synchronized games, one engine call
    per ply, M plies per jitted dispatch (see play_match docstring)."""
    import jax.numpy as jnp

    engine = SelfPlayEngine(env, cfg, net, eval_mode=True)
    batch = min(num_games, max(cfg.zero_num_parallel_games, 1))
    cap = max_moves or env.spec.max_game_length + 8
    plies_per_dispatch = 16

    def chunk_impl(vars_first, vars_second, states, done, score, rng, phase):
        """M plies: alternating movers, finished slots frozen. ``phase``:
        parity of the first ply in this chunk (non-zero after random
        openings consumed plies)."""

        def ply(carry, swap):
            states, done, score, rng = carry
            rng, k = jax.random.split(rng)
            # swap==0 -> first mover's net, swap==1 -> second's: select the
            # VARIABLES (a cheap whole-tree where) so the big search graph
            # traces once, not per branch
            vars_sel = jax.tree_util.tree_map(
                lambda a, b: jnp.where(swap == 0, a, b), vars_first, vars_second)
            out = engine._move_impl(vars_sel, states, k, jnp.float32(1.0))
            keep = done
            states = jax.tree_util.tree_map(
                lambda old, new: jnp.where(
                    keep.reshape((-1,) + (1,) * (new.ndim - 1)), old, new),
                states, out.states)
            score = jnp.where(keep, score, out.eval_score)
            done = keep | out.done
            return (states, done, score, rng), None

        swaps = ((jnp.arange(plies_per_dispatch) + phase) % 2).astype(jnp.int32)
        (states, done, score, rng), _ = jax.lax.scan(
            ply, (states, done, score, rng), swaps)
        return states, done, score, rng

    chunk = jax.jit(chunk_impl)

    def openings_impl(states, rng):
        """K uniform-random legal plies per slot (both nets see the same
        opening; per-slot rng gives the batch distinct games)."""
        def one(carry, _):
            states, rng = carry
            rng, k = jax.random.split(rng)
            legal = jax.vmap(env.legal_mask)(states)
            logits = jnp.where(legal, 0.0, -1e9)
            acts = jax.random.categorical(k, logits, axis=-1).astype(jnp.int32)
            states = jax.vmap(env.step)(states, acts)
            return (states, rng), None
        (states, rng), _ = jax.lax.scan(
            one, (states, rng), None, length=opening_random_plies)
        return states

    openings = jax.jit(openings_impl)

    from minizero_tpu.utils.progress import ProgressBar

    rng = jax.random.PRNGKey(seed)
    a_wins = b_wins = draws = 0
    played = 0
    round_idx = 0
    # colours must BALANCE across the whole match (reference self-eval.sh
    # alternates per game pair): per-colour game budgets, counted per
    # round, so e.g. num_games <= batch still plays half the games with A
    # as P2 in a second round instead of all games with A as P1
    quota = {True: (num_games + 1) // 2, False: num_games // 2}
    with ProgressBar(num_games, "eval games ") as bar:
        while played < num_games:
            a_is_p1 = round_idx % 2 == 0
            round_idx += 1
            this_round = min(batch, quota[a_is_p1])
            if this_round <= 0:
                continue
            quota[a_is_p1] -= this_round
            rng, k_init = jax.random.split(rng)
            states = engine.init_batch(batch, k_init)
            if opening_random_plies > 0:
                # same opening seed for the A-as-P1 and A-as-P2 rounds of the
                # same pair index -> colour-mirrored openings like twogtp
                k_open = jax.random.fold_in(jax.random.PRNGKey(seed), (round_idx - 1) // 2)
                states = openings(states, k_open)
            done = jnp.zeros((batch,), bool)
            score = jnp.zeros((batch,), jnp.float32)
            vf, vs = (variables_a, variables_b) if a_is_p1 else (variables_b, variables_a)
            phase = jnp.int32(opening_random_plies % 2)
            for _ in range(-(-cap // plies_per_dispatch)):
                rng, k = jax.random.split(rng)
                states, done, score, rng = chunk(vf, vs, states, done, score, k, phase)
                if bool(np.asarray(done).all()):
                    break
            scores = np.asarray(score)[:this_round]
            dn = np.asarray(done)[:this_round]
            for i in range(this_round):
                s = float(scores[i]) if dn[i] else 0.0  # cap hit -> draw
                if s > 0:
                    a_wins += 1 if a_is_p1 else 0
                    b_wins += 0 if a_is_p1 else 1
                elif s < 0:
                    b_wins += 1 if a_is_p1 else 0
                    a_wins += 0 if a_is_p1 else 1
                else:
                    draws += 1
                played += 1
            bar.step(this_round)
    return MatchResult(p1_wins=a_wins, p2_wins=b_wins, draws=draws)


def self_eval(cfg: Config, run_dir: str, interval: int = 1, num_games: int = 100,
              seed: int = 0) -> List[Dict]:
    """Ladder: iteration i vs i+interval over a training dir's checkpoints,
    accumulating Elo (reference tools/self-eval.sh + eval.py)."""
    model_dir = os.path.join(run_dir, "model")
    ckpts = sorted(
        (f for f in os.listdir(model_dir) if f.endswith(".ckpt")),
        key=lambda f: int(f.split("_")[-1].split(".")[0]),
    )
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    results = []
    elo = 0.0
    for i in range(0, len(ckpts) - interval, interval):
        va = load_checkpoint_variables(os.path.join(model_dir, ckpts[i + interval]), cfg, net, env.spec)
        vb = load_checkpoint_variables(os.path.join(model_dir, ckpts[i]), cfg, net, env.spec)
        r = play_match(cfg, va, vb, num_games=num_games, seed=seed + i)
        elo += elo_from_win_rate(r.p1_win_rate)
        results.append({
            "new": ckpts[i + interval], "old": ckpts[i],
            "win_rate": r.p1_win_rate, "elo": elo,
            "wins": r.p1_wins, "losses": r.p2_wins, "draws": r.draws,
        })
    return results


def fight_eval(cfg: Config, run_dir_a: str, run_dir_b: str, iteration: str,
               num_games: int = 100, seed: int = 0) -> Dict:
    """Cross-run same-iteration match (reference tools/fight-eval.sh)."""
    env = make_env(cfg)
    net = create_network(cfg, env.spec)

    def resolve(run_dir: str) -> str:
        if iteration != "latest":
            return os.path.join(run_dir, "model", iteration)
        model_dir = os.path.join(run_dir, "model")
        ckpts = sorted(
            (f for f in os.listdir(model_dir) if f.endswith(".ckpt")),
            key=lambda f: int(f.split("_")[-1].split(".")[0]),
        )
        return os.path.join(model_dir, ckpts[-1])

    pa = resolve(run_dir_a)
    pb = resolve(run_dir_b)
    va = load_checkpoint_variables(pa, cfg, net, env.spec)
    vb = load_checkpoint_variables(pb, cfg, net, env.spec)
    r = play_match(cfg, va, vb, num_games=num_games, seed=seed)
    return {
        "a": pa, "b": pb, "win_rate_a": r.p1_win_rate,
        "elo_diff": elo_from_win_rate(r.p1_win_rate),
        "wins": r.p1_wins, "losses": r.p2_wins, "draws": r.draws,
    }


def run_eval_cli(cfg: Config, args) -> int:
    if getattr(args, "run_dir_b", ""):
        # cross-run fight-eval (reference tools/fight-eval.sh:91-109)
        row = fight_eval(cfg, args.run_dir, args.run_dir_b,
                         getattr(args, "iteration", "") or "latest",
                         num_games=args.num_games)
        print(
            f"{row['a']} vs {row['b']}: win_rate_a={row['win_rate_a']:.3f} "
            f"elo_diff={row['elo_diff']:.1f} "
            f"({row['wins']}W/{row['losses']}L/{row['draws']}D)"
        )
        return 0
    results = self_eval(cfg, args.run_dir, num_games=args.num_games)
    for row in results:
        print(
            f"{row['new']} vs {row['old']}: win_rate={row['win_rate']:.3f} "
            f"elo={row['elo']:.1f} ({row['wins']}W/{row['losses']}L/{row['draws']}D)"
        )
    write_eval_outputs(args.run_dir, results)
    return 0


def write_eval_outputs(run_dir: str, results: List[Dict]) -> None:
    """CSV + Elo curve like the reference's eval.py (tools/eval.py:103-177)."""
    if not results:
        return
    import csv

    csv_path = os.path.join(run_dir, "eval.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(results[0].keys()))
        w.writeheader()
        w.writerows(results)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        steps = [int(r["new"].split("_")[-1].split(".")[0]) for r in results]
        plt.figure(figsize=(7, 4))
        plt.plot(steps, [r["elo"] for r in results], marker="o")
        plt.xlabel("training step")
        plt.ylabel("Elo (accumulated)")
        plt.grid(True, alpha=0.3)
        plt.tight_layout()
        plt.savefig(os.path.join(run_dir, "eval.png"))
        plt.close()
    except Exception:
        pass  # plotting is best-effort (headless/missing backend)
