"""Zero training loop (single host).

TPU-native replacement for the reference's distributed triangle — TCP
``ZeroServer`` state machine + self-play workers + optimization worker + NFS
(``minizero/zero/zero_server.cpp:159-323``): on a TPU host the self-play
engine and the trainer share the device, so the per-iteration state machine

    for iteration: self-play 2000 games -> train 500 steps -> checkpoint

becomes a plain in-process loop with the same iteration semantics: per-game
resign disabling, temperature decay schedule (1 / 0.5 / 0.25 at 50% / 75% of
total iterations, ``zero_server.cpp:301-323``), PER beta annealing, replay window of
``zero_replay_buffer`` iterations, record files per iteration, and
``Training.log`` / ``op.log`` lines shaped like the reference's so the
analysis tooling ports over.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from minizero_tpu.config import Config
from minizero_tpu.envs import make_env
from minizero_tpu.learner.replay import ReplayBuffer
from minizero_tpu.learner.train import TrainState, init_train_state, make_train_step
from minizero_tpu.models.factory import create_network, init_network
from minizero_tpu.selfplay.collector import TrajectoryCollector
from minizero_tpu.selfplay.engine import SelfPlayEngine
from minizero_tpu.selfplay.record import serialize_game


def per_beta_for_iteration(cfg: Config, iteration: int) -> float:
    """Linear anneal of the PER importance exponent toward 1
    (reference zero_server.cpp:304-306)."""
    if not (cfg.learner_use_per and cfg.learner_per_beta_anneal):
        return cfg.learner_per_init_beta
    b0 = cfg.learner_per_init_beta
    return min(b0 + (iteration / max(cfg.zero_end_iteration, 1)) * (1.0 - b0), 1.0)


def temperature_for_iteration(cfg: Config, iteration: int) -> float:
    """1.0 / 0.5 / 0.25 for 0-50% / 50-75% / 75-100% of total iterations
    (reference zero_server.cpp:301-315)."""
    t = cfg.actor_select_action_softmax_temperature
    if not cfg.actor_select_action_softmax_temperature_decay:
        return t
    frac = iteration / max(cfg.zero_end_iteration, 1)
    if frac < 0.5:
        return t
    if frac < 0.75:
        return t * 0.5
    return t * 0.25


class ZeroLoop:
    def __init__(self, cfg: Config, run_dir: str, selfplay_batch: Optional[int] = None, seed: int = 0,
                 mesh=None, ale_factory=None):
        self.cfg = cfg
        self.run_dir = run_dir
        self.mesh = mesh
        # multi-host (SPMD single-controller-per-host): self-play is
        # embarrassingly parallel, so each process runs it on its OWN
        # addressable devices (local mesh) and plays its share of the games;
        # training runs on the global mesh with per-host batch shards
        # (SURVEY.md §2.6 TPU-native replacement of the TCP+NFS triangle).
        self.pid = jax.process_index()
        self.num_procs = jax.process_count()
        self.is_main = self.pid == 0
        os.makedirs(os.path.join(run_dir, "model"), exist_ok=True)
        os.makedirs(os.path.join(run_dir, "sgf"), exist_ok=True)

        self.selfplay_batch = selfplay_batch or cfg.zero_num_parallel_games
        self.is_host_env = cfg.env_name == "atari"
        if self.is_host_env:
            # host env (ALE) + device MuZero search: the reference's atari
            # actor keeps the env on CPU and consults it only at the root
            # (actor/zero_actor.cpp:58-68)
            if mesh is not None:
                raise NotImplementedError("mesh-sharded self-play is device-env only; "
                                          "run atari workers one process per host")
            from minizero_tpu.envs.atari import AtariVecEnv

            self.vec_env = AtariVecEnv(
                self.selfplay_batch, seed=cfg.program_seed,
                game_name=cfg.env_atari_name, rom_dir=cfg.env_atari_rom_dir,
                ale_factory=ale_factory,
            )
            self.env = self.vec_env.envs[0]
            # device-resident frame window: records store single frames; the
            # 32-ch stacks assemble on device at train time, killing the
            # 340 MB-per-chunk feature upload that was ~95% of the optimize
            # wall at b=128 (scripts/probe_atari_opt.py, VERDICT r4 #1)
            from minizero_tpu.learner.frame_window import DeviceFrameWindow

            spec = self.env.spec
            rows = DeviceFrameWindow.rows_needed(cfg)
            row_bytes = spec.input_height * spec.input_width * 3
            on_device = rows * row_bytes <= cfg.learner_device_feature_window_gb * (1 << 30)
            self.frame_window = DeviceFrameWindow(
                rows, spec.input_height, spec.input_width, device=on_device)
            self._assemble_jit = None
            if not on_device:
                print(f"[FrameWindow] {rows * row_bytes / 1e9:.1f} GB exceeds "
                      f"learner_device_feature_window_gb="
                      f"{cfg.learner_device_feature_window_gb}; using the "
                      "host-assembly fallback (slower optimize)", flush=True)
        else:
            self.vec_env = None
            self.frame_window = None
            self.env = make_env(cfg)
        self.network = create_network(cfg, self.env.spec)
        rng = jax.random.PRNGKey(cfg.program_seed if not cfg.program_auto_seed else int(time.time()))
        self.rng, init_rng = jax.random.split(rng)
        variables = init_network(self.network, self.env.spec, init_rng)
        self.state = init_train_state(cfg, variables)

        if self.is_host_env:
            from minizero_tpu.selfplay.host_engine import HostSelfPlayEngine

            self.engine = HostSelfPlayEngine(self.vec_env, cfg, self.network)
        else:
            # score_cond off under a mesh: the cond's any(terminal) would be
            # a cross-process all-reduce per simulation (engine._leaf_scores)
            self.engine = SelfPlayEngine(self.env, cfg, self.network,
                                         score_cond=mesh is None)
        self.buffer = ReplayBuffer(cfg, self.env.spec)
        self._replay_scan = None  # lazy cpu-backend record replayer (resume)
        if mesh is not None:
            # multi-device: self-play batch + train batch shard over dp,
            # weights replicate, gradients all-reduce over ICI
            from minizero_tpu.parallel.distributed import (
                ShardedSelfPlay,
                make_sharded_train_step,
            )

            if self.num_procs > 1:
                # self-play on this host's devices only: the collector must
                # read every array it is handed, so its mesh has to be fully
                # addressable. Training still spans the global mesh below.
                local = jax.local_devices()
                from jax.sharding import Mesh as _Mesh

                sp_mesh = _Mesh(np.asarray(local), ("dp",))
            else:
                sp_mesh = mesh
            self.sharded = ShardedSelfPlay(self.engine, sp_mesh)
            self._train_step, self.state, self._state_shardings = make_sharded_train_step(
                cfg, self.env, self.network, mesh, self.state
            )
            # chunked optimizer under the mesh too: the per-step dispatch
            # path measured 4.4x slower distributed than solo (round-5
            # weak-scaling phase attribution) — one dispatch + one watchdog
            # block per K-step chunk instead of per step
            from minizero_tpu.parallel.distributed import make_sharded_train_chunk

            self._train_chunk = make_sharded_train_chunk(
                cfg, self.env, self.network, mesh, self._state_shardings)
        else:
            self.sharded = None
            self._train_step = jax.jit(make_train_step(cfg, self.env, self.network), donate_argnums=0)
            # chunked optimizer: lax.scan K steps per device call. One
            # dispatch per step costs a full host<->device round trip
            # (~0.17 s over the tunnel -> 90 s per 500-step iteration for
            # ~4 s of device work); the scan brings it to K-per-dispatch.
            step_fn = make_train_step(cfg, self.env, self.network)

            def train_chunk(state, batches, rng):
                def body(carry, batch):
                    state, rng = carry
                    rng, k = jax.random.split(rng)
                    state, metrics = step_fn(state, batch, k)
                    return (state, rng), metrics

                (state, _), metrics = jax.lax.scan(body, (state, rng), batches)
                return state, metrics  # metrics stacked [K] (+ per-sample rows)

            self._train_chunk = jax.jit(train_chunk, donate_argnums=0)
        # u8 -> f32 cast and (for bit-packed board planes) unpack run as a
        # separate jit: a u8 convert inside the conv-grad graph trips an
        # XLA:TPU space-to-batch crash, and transfers stay packed
        n_ch = self.env.spec.num_input_channels

        def _cast(x):
            if x.shape[-1] != n_ch:
                from minizero_tpu.utils.bitpack import unpack_planes

                return unpack_planes(x, n_ch)
            return x.astype(jnp.float32)

        self._feat_cast = jax.jit(_cast)
        self.np_rng = np.random.RandomState(cfg.program_seed + 1)
        self.is_muzero = cfg.nn_type_name.lower() != "alphazero"
        suffix = "" if self.is_main else f".p{self.pid}"
        self._log_file = open(os.path.join(run_dir, f"Training{suffix}.log"), "a")
        self._op_log = open(os.path.join(run_dir, f"op{suffix}.log"), "a")

    # ------------------------------------------------------------------- log
    def log(self, message: str) -> None:
        line = f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] {message}"
        print(line, flush=True)
        self._log_file.write(line + "\n")
        self._log_file.flush()

    def op_log(self, message: str) -> None:
        self._op_log.write(f"[{time.strftime('%Y-%m-%d %H:%M:%S')}] {message}\n")
        self._op_log.flush()

    # ------------------------------------------------------------- variables
    @property
    def variables(self) -> Dict[str, Any]:
        v = {"params": self.state.params}
        if self.state.batch_stats:
            v["batch_stats"] = self.state.batch_stats
        return v

    # -------------------------------------------------------------- selfplay
    def self_play_iteration(self, iteration: int) -> Dict[str, float]:
        if self.is_host_env:
            return self._host_self_play_iteration(iteration)
        cfg = self.cfg
        temperature = temperature_for_iteration(cfg, iteration)
        collector = TrajectoryCollector(
            cfg, self.env.spec, self.selfplay_batch,
            seed=cfg.program_seed + iteration * self.num_procs + self.pid)
        self.rng, k_init = jax.random.split(self.rng)
        if self.num_procs > 1:
            k_init = jax.random.fold_in(k_init, self.pid)
        sp = self.sharded or self.engine
        states = sp.init_batch(self.selfplay_batch, k_init)
        num_games, lengths, returns = 0, [], []
        # each host plays its share of the iteration's games and appends to
        # its own record shard (host-0's shard keeps the unsuffixed name)
        games_target = -(-cfg.zero_num_games_per_iteration // self.num_procs)
        shard = "" if self.is_main else f".p{self.pid}"
        record_path = os.path.join(self.run_dir, "sgf", f"{iteration}{shard}.sgf")
        variables = self.variables
        if self.num_procs > 1:
            variables = self.sharded.place_variables(variables)
        t0 = time.time()
        # chunked collection: move_scan advances every game M moves (with
        # in-scan slot resets and device-side resign gating) in ONE dispatch;
        # the host collects a whole chunk at a time. Replaces the per-move
        # double-buffered loop — per-move dispatch costs a runtime round trip
        # each (the reference overlaps CPU/GPU phases per move instead,
        # actor_group.cpp:136-148).
        scan_moves = max(1, int(cfg.zero_moves_per_dispatch))
        enable = jnp.asarray(collector.enable_resign_flags())
        msr = None
        pending = None
        # per-phase wall attribution, logged as [SelfPlay Timing] (the
        # reference logs only phase totals; TPU runs need to see whether an
        # iteration is device-, transfer-, or host-bound)
        t_dispatch = t_collect = t_host = 0.0
        chunks = 0
        with open(record_path, "a") as record_file:
            while num_games < games_target:
                self.rng, k = jax.random.split(self.rng)
                if self.num_procs > 1:
                    k = jax.random.fold_in(k, self.pid)
                tp = time.time()
                stacked, states, enable, msr = sp.move_scan(
                    variables, states, k, temperature, scan_moves, enable, msr)
                t_dispatch += time.time() - tp
                chunks += 1
                # process the PREVIOUS chunk while the device runs this one:
                # jax dispatch is async, so the chunk's device->host transfer
                # and record assembly overlap the next scan's compute
                if pending is None:
                    pending = stacked
                    continue
                tp = time.time()
                finished = collector.add_scan(pending)
                t_collect += time.time() - tp
                pending = stacked
                tp = time.time()
                for fg in finished:
                    if num_games >= games_target:
                        # exact cutoff like the reference server, which stops
                        # accepting SelfPlay lines at the target
                        # (zero_server.cpp:191-213) — the chunk may overshoot
                        break
                    self.buffer.add_game(fg.record)
                    record_file.write(
                        serialize_game(
                            self.env.spec.name, fg.record, self.env.spec.board_size, fg.players,
                            model_file=f"weight_iter_{int(self.state.step)}",
                        )
                        + "\n"
                    )
                    lengths.append(fg.record.length)
                    returns.append(fg.record.result)
                    num_games += 1
                t_host += time.time() - tp
        self.log(
            f"[SelfPlay Timing] chunks: {chunks} x {scan_moves} moves, "
            f"dispatch: {t_dispatch:.1f}s, collect: {t_collect:.1f}s, "
            f"records: {t_host:.1f}s"
        )
        return self._selfplay_stats(iteration, num_games, lengths, returns, time.time() - t0)

    def _selfplay_stats(self, iteration, num_games, lengths, returns, dt) -> Dict[str, float]:
        if self.num_procs > 1:
            # combine per-host moments so every host logs the global stats
            # (reference server aggregates worker lines, zero_server.cpp:240-263)
            from jax.experimental import multihost_utils

            def mom(x):
                x = np.asarray(x, np.float64)
                if x.size == 0:
                    return [0.0, 0.0, np.inf, -np.inf]
                return [float(x.sum()), float((x * x).sum()), float(x.min()), float(x.max())]

            local = np.array([float(num_games)] + mom(lengths) + mom(returns) + [dt])
            from minizero_tpu.parallel.watchdog import collective_watchdog

            with collective_watchdog("selfplay_stats_allgather",
                                     self.cfg.zero_collective_timeout, self.log):
                g = np.asarray(multihost_utils.process_allgather(local))
            n = g[:, 0].sum()
            def comb(col):
                s, sq = g[:, col].sum(), g[:, col + 1].sum()
                avg = s / max(n, 1.0)
                std = float(np.sqrt(max(sq / max(n, 1.0) - avg * avg, 0.0)))
                return avg, std, float(g[:, col + 2].min()), float(g[:, col + 3].max())
            l_avg, l_std, l_min, l_max = comb(1)
            r_avg, r_std, r_min, r_max = comb(5)
            dt = float(g[:, 9].max())
            stats = {
                "games": int(n), "time_s": dt,
                "games_per_sec": n / max(dt, 1e-9),
                "length_avg": l_avg, "length_std": l_std,
                "return_avg": r_avg, "return_std": r_std,
            }
            self.log(
                f"[Iteration] {iteration}: self-play {int(n)} games in {dt:.1f}s "
                f"({stats['games_per_sec']:.2f} games/s, {self.num_procs} hosts)"
            )
            self.log(
                f"[SelfPlay Game Lengths] min: {l_min:g}, max: {l_max:g}, "
                f"avg: {l_avg:.2f}, std: {l_std:.2f}"
            )
            self.log(
                f"[SelfPlay Game Returns] min: {r_min:g}, max: {r_max:g}, "
                f"avg: {r_avg:.2f}, std: {r_std:.2f}"
            )
            return stats
        stats = {
            "games": num_games,
            "time_s": dt,
            "games_per_sec": num_games / max(dt, 1e-9),
            "length_avg": float(np.mean(lengths)) if lengths else 0.0,
            "length_std": float(np.std(lengths)) if lengths else 0.0,
            "return_avg": float(np.mean(returns)) if returns else 0.0,
            "return_std": float(np.std(returns)) if returns else 0.0,
        }
        # reference-style stats lines (zero_server.cpp:240-263)
        self.log(
            f"[Iteration] {iteration}: self-play {num_games} games in {dt:.1f}s "
            f"({stats['games_per_sec']:.2f} games/s)"
        )
        self.log(
            f"[SelfPlay Game Lengths] min: {min(lengths) if lengths else 0}, max: {max(lengths) if lengths else 0}, "
            f"avg: {stats['length_avg']:.2f}, std: {stats['length_std']:.2f}"
        )
        self.log(
            f"[SelfPlay Game Returns] min: {min(returns) if returns else 0}, max: {max(returns) if returns else 0}, "
            f"avg: {stats['return_avg']:.2f}, std: {stats['return_std']:.2f}"
        )
        latest = self.cfg.zero_display_latest_games
        if latest > 0 and returns:
            lr = returns[-latest:]
            ll = lengths[-latest:]
            self.log(
                f"[SelfPlay Latest {len(lr)} Games] "
                f"lengths avg: {float(np.mean(ll)):.2f}, std: {float(np.std(ll)):.2f}; "
                f"returns avg: {float(np.mean(lr)):.2f}, std: {float(np.std(lr)):.2f}"
            )
        return stats

    def _host_self_play_iteration(self, iteration: int) -> Dict[str, float]:
        """Self-play over the host vec env (Atari): device search + host
        ALE stepping, intermediate-sequence chunk emission, per-record SD
        seed tags and optional OBS observation tags (the reference's atari
        record schema, atari.cpp:106-110, base_env.h:215-219)."""
        from minizero_tpu.selfplay.host_engine import AtariTrajectoryCollector
        from minizero_tpu.tools.obs import pack_observations

        cfg = self.cfg
        temperature = temperature_for_iteration(cfg, iteration)
        # the collector PERSISTS across iterations: episodes are tens of
        # thousands of moves and keep running while the loop alternates
        # self-play/optimize phases, exactly like the reference's actors keep
        # their episode state between server iterations. Recreating it per
        # iteration (the round-4 bug) dropped each slot's accumulated prefix,
        # so the first emission of iteration N+1 was a truncated tail chunk
        # mislabeled as a fresh 10-move episode (runs/atari_gmz_r4_b128.log).
        if getattr(self, "_atari_collector", None) is None:
            self._atari_collector = AtariTrajectoryCollector(
                cfg, self.env.spec, self.selfplay_batch)
        collector = self._atari_collector
        lengths: list = []
        returns: list = []
        num_games = 0
        record_path = os.path.join(self.run_dir, "sgf", f"{iteration}.sgf")
        t0 = time.time()
        with open(record_path, "a") as record_file:
            while num_games < cfg.zero_num_games_per_iteration:
                self.rng, k = jax.random.split(self.rng)
                out = self.engine.move(self.variables, k, temperature)
                finished, reset_slots = collector.add_moves(out)
                for fg in finished:
                    self.buffer.add_game(fg.record)
                    # upload this game's frames into the device ring NOW —
                    # ~6 MB/game spread across self-play instead of a bulk
                    # optimize-phase transfer
                    self.frame_window.add(fg.record)
                    # slot envs are reset only after emission, so the seed
                    # read here is the one that produced this (chunk of the)
                    # episode — required for deterministic obs recovery
                    seed = self.vec_env.envs[fg.slot].seed
                    extra = {"SD": str(seed)}
                    if fg.abs_start:
                        # absolute episode position of this chunk's first
                        # move: disambiguates obs recovery alignment
                        extra["OFF"] = str(fg.abs_start)
                    if fg.record.lives_lost is not None:
                        extra["LL"] = "".join("1" if x else "0" for x in fg.record.lives_lost)
                    line = serialize_game(
                        self.env.spec.name, fg.record, self.env.spec.board_size, fg.players,
                        model_file=f"weight_iter_{int(self.state.step)}",
                        extra_tags=extra,
                    )
                    if cfg.zero_actor_record_observations:
                        # newest RGB frame per step (the stacked history is
                        # reconstructable from consecutive frames)
                        obs = fg.record.frames[fg.record.frame_lead:]
                        line = line[:-1] + f"OBS[{pack_observations(obs)}]" + line[-1:]
                    record_file.write(line + "\n")
                    lengths.append(fg.record.length)
                    returns.append(fg.record.result)
                    num_games += 1
                if reset_slots:
                    self.vec_env.reset_done()
        # drop frame-ring bookkeeping for games the replay buffer evicted
        self.frame_window.retain(self.buffer.games)
        return self._selfplay_stats(iteration, num_games, lengths, returns, time.time() - t0)

    # ------------------------------------------------------------ optimizing
    def optimize_iteration(self, iteration: int) -> Dict[str, float]:
        cfg = self.cfg
        self.buffer.per_beta = per_beta_for_iteration(cfg, iteration)
        t0 = time.time()
        # chunked for solo AND mesh: the retired per-step mesh path measured
        # 4.4x slower distributed than solo (round-5 weak-scaling phase
        # attribution — global rendezvous + a blocking watchdog per step)
        self._optimize_chunked(iteration)
        dt = time.time() - t0
        self.log(f"[Optimization] iteration {iteration}: {cfg.learner_training_step} steps in {dt:.1f}s")
        self.log(f"Optimization_Done {int(self.state.step)}")
        return {"time_s": dt}

    def _optimize_chunked(self, iteration: int) -> None:
        """Single-host optimizer: ``lax.scan`` K steps per device dispatch.

        Sampling (host, numpy) for the whole chunk happens up front, so with
        PER the priorities used for sampling lag the refresh by < K steps —
        a bounded deviation from the reference's per-step refresh
        (train.py:208-209); K shrinks to the display period when PER is on.
        """
        cfg = self.cfg
        totals: Dict[str, float] = {}
        shown = 0
        bs = cfg.learner_batch_size
        # PER refresh is vectorized (ReplayBuffer.refresh_priorities), so PER
        # no longer needs a shorter chunk; the refresh lag stays < K steps.
        # The chunk is also capped by the stacked-feature device footprint:
        # atari steps are ~150 MB of f32 features each (96x96x32 at b=256),
        # so a 100-step stack is 15 GB — past a whole v5e chip's HBM
        # (observed RESOURCE_EXHAUSTED); Go9 steps are ~6 MB and keep the
        # full 100-step chunk.
        spec = self.env.spec
        feat_bytes_per_step = (bs * spec.input_height * spec.input_width
                               * spec.num_input_channels * 4)
        chunk = max(1, min(cfg.learner_training_display_step, 100,
                           int(1.5e9 // max(feat_bytes_per_step, 1)) or 1))
        done = 0
        # with PER off, metrics materialization is deferred one chunk so the
        # next chunk's host sampling + H2D transfer overlap the device scan
        # (jax dispatch is async; np.asarray is the only block point). PER
        # keeps the synchronous order: its sampling must see the freshest
        # priorities (the documented lag stays < K steps, not 2K).
        overlap = not cfg.learner_use_per
        pending = None  # (metrics, sent_steps) awaiting materialization
        # host-side step counter: int(self.state.step) would block on the
        # freshest chunk and serialize exactly what the deferral overlaps
        base_step = int(self.state.step)

        def drain(metrics, sent_steps):
            nonlocal totals, shown
            sums = {key: np.asarray(val) for key, val in metrics.items()}
            for key, val in sums.items():
                totals[key] = totals.get(key, 0.0) + float(val.sum())
            if sent_steps - shown >= cfg.learner_training_display_step:
                avg = {k2: v / (sent_steps - shown) for k2, v in totals.items()}
                self.op_log(
                    f"nn step {base_step + sent_steps}, "
                    f"lr: {cfg.learner_learning_rate}. "
                    + " ".join(f"{k2}: {v:.5f}" for k2, v in sorted(avg.items()))
                )
                totals = {}
                shown = sent_steps

        frames_mode = self.buffer.frames_mode
        # multi-host: every host samples its shard of the global batch from
        # its local buffer; the stacked [K, b_local] arrays assemble into
        # [K, B_global] dp-sharded chunks (parallel/distributed.py)
        local_bs = bs // self.num_procs if self.mesh is not None else bs
        while done < cfg.learner_training_step:
            k_steps = min(chunk, cfg.learner_training_step - done)
            batches = []
            indices = []
            lookups = []
            for _ in range(k_steps):
                if self.is_muzero:
                    b = self.buffer.sample_muzero(local_bs, self.np_rng)
                else:
                    b = self.buffer.sample_alphazero(local_bs, self.np_rng)
                sampled_index = b.pop("sampled_index")
                indices.append(sampled_index)
                if frames_mode:
                    recs = [self.buffer.games[g] for g in sampled_index[:, 0]]
                    lookups.append(self.frame_window.lookup(recs, sampled_index[:, 1]))
                batches.append(b)
            host_stacked = {
                key: np.stack([b[key] for b in batches])
                for key in batches[0]
            }
            if self.mesh is not None:
                from minizero_tpu.parallel.distributed import global_stacked_from_local

                stacked = global_stacked_from_local(self.mesh, host_stacked)
            else:
                stacked = {key: jnp.asarray(v) for key, v in host_stacked.items()}
            if frames_mode:
                stacked["features"] = self._assemble_chunk_features(lookups)
            else:
                stacked["features"] = self._feat_cast(stacked["features"])
            self.rng, k = jax.random.split(self.rng)
            self.state, metrics = self._train_chunk(self.state, stacked, k)
            done += k_steps
            if self.num_procs > 1:
                # the gradient all-reduce spans hosts: block once per chunk
                # under the watchdog so a dead peer aborts this host promptly
                from minizero_tpu.parallel.watchdog import collective_watchdog

                with collective_watchdog(f"train_chunk_{done}",
                                         self.cfg.zero_collective_timeout, self.log):
                    jax.block_until_ready(jax.tree_util.tree_leaves(metrics))
            if cfg.learner_use_per and "_new_values" in metrics:
                nv = metrics.pop("_new_values")  # [K, B_global]
                if self.num_procs > 1:
                    # only this host's rows of the batch-sharded global array
                    from jax.experimental.multihost_utils import (
                        global_array_to_host_local_array,
                    )
                    from jax.sharding import PartitionSpec

                    nv = global_array_to_host_local_array(
                        nv, self.mesh, PartitionSpec(None, "dp"))
                new_values = np.asarray(nv)  # [K, b_local]
                for i, sampled_index in enumerate(indices):
                    self.buffer.refresh_priorities(sampled_index, new_values[i])
            metrics.pop("_new_values", None)
            if not overlap:
                drain(metrics, done)
                continue
            if pending is not None:
                drain(*pending)
            pending = (metrics, done)
        if pending is not None:
            drain(*pending)

    def _assemble_chunk_features(self, lookups) -> jnp.ndarray:
        """Frames schema: turn per-step gather plans into the f32 [K, B, H,
        W, 32] stacked features, on device when the window is resident
        (~1 MB of indices/masks crosses the tunnel instead of 340 MB of
        planes — learner/frame_window.py)."""
        from minizero_tpu.learner.frame_window import (
            assemble_features,
            assemble_features_host,
        )

        idx = np.stack([lk["frame_idx"] for lk in lookups])
        valid = np.stack([lk["frame_valid"] for lk in lookups])
        aplane = np.stack([lk["frame_aplane"] for lk in lookups])
        fw = self.frame_window
        if fw.device:
            if self._assemble_jit is None:
                self._assemble_jit = jax.jit(assemble_features)
            return self._assemble_jit(fw.frames, jnp.asarray(idx),
                                      jnp.asarray(valid), jnp.asarray(aplane))
        feats_u8 = assemble_features_host(fw.frames, idx, valid, aplane)
        return self._feat_cast(jnp.asarray(feats_u8))

    # ------------------------------------------------------------ checkpoint
    def save_checkpoint(self) -> str:
        step = int(self.state.step)
        path = os.path.join(self.run_dir, "model", f"weight_iter_{step}.ckpt")
        if self.is_main:
            # the state is replicated, so host-0 alone writes it
            payload = {
                "training_step": step,
                "state": serialization.to_bytes(self.state),
                "config": self.cfg.to_string(),
            }
            # atomic write: a crash/SIGKILL mid-dump must never leave a
            # truncated latest ckpt (resume picks the newest; the
            # supervisor would then relaunch into the same EOFError forever)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(payload, f)
            os.replace(tmp, path)
        if self.num_procs > 1:
            from jax.experimental.multihost_utils import sync_global_devices

            from minizero_tpu.parallel.watchdog import collective_watchdog

            with collective_watchdog(f"ckpt_barrier_{step}",
                                     self.cfg.zero_collective_timeout, self.log):
                sync_global_devices(f"ckpt_{step}")
        return path

    def load_checkpoint(self, path: str) -> None:
        with open(path, "rb") as f:
            payload = pickle.load(f)
        self.state = serialization.from_bytes(self.state, payload["state"])
        if self.mesh is not None:
            # restore the global placement (replicated state: every host
            # holds the same bytes, device_put broadcasts its local copy)
            self.state = jax.device_put(self.state, self._state_shardings)

    # ---------------------------------------------------------------- resume
    def _rebuild_features(self, actions: np.ndarray) -> np.ndarray:
        """Replay actions to regenerate per-position feature planes (the
        records store targets only; reference rebuilds its buffer by
        re-parsing sgf files, train.py:40-48)."""
        return self._rebuild_features_batch([np.asarray(actions)])[0]

    def _rebuild_features_batch(self, action_lists) -> list:
        """Batched replay on the HOST CPU backend: pad the games to one
        length and scan a vmapped env.step over all of them at once.

        Per-move b=1 jit calls would each cost a device round trip — over
        the axon tunnel a 46k-game resume window became millions of RTTs —
        so the replay is (a) vectorised across games and (b) pinned to the
        local cpu backend, where a one-off rebuild belongs."""
        spec = self.env.spec
        empty = np.zeros((0, spec.input_height, spec.input_width,
                          spec.num_input_channels), np.uint8)
        lens = [len(a) for a in action_lists]
        max_len = max(lens) if lens else 0
        if max_len == 0:
            outs = [empty for _ in action_lists]
        else:
            env = self.env
            b = len(action_lists)
            # static shapes: pad rows to a bucket and moves to the game cap
            # so jit compiles once, not per call
            bucket = 1
            while bucket < b:
                bucket *= 2
            max_len = max(max_len, spec.max_game_length)
            acts = np.zeros((bucket, max_len), np.int32)
            for i, a in enumerate(action_lists):
                # pad with action 0; env.step is well-shape-safe on illegal
                # or terminal states (envs/base.py) and padded moves are
                # sliced off below
                acts[i, : len(a)] = np.asarray(a, np.int32)

            if self._replay_scan is None:
                def replay(actions):  # i32[B, L] -> u8[L, B, H, W, C]
                    def body(state, a):
                        f = jax.vmap(env.features)(state)
                        return jax.vmap(env.step)(state, a), f.astype(jnp.uint8)

                    s0 = jax.vmap(lambda _: env.init())(jnp.zeros((actions.shape[0],)))
                    _, feats = jax.lax.scan(body, s0, actions.T)
                    return feats

                jitted = jax.jit(replay)
                cpu = jax.devices("cpu")[0]

                def run_on_cpu(a):
                    with jax.default_device(cpu):
                        return jitted(jax.device_put(a, cpu))

                self._replay_scan = run_on_cpu
            feats = np.asarray(self._replay_scan(acts))  # [L, B, H, W, C]
            outs = [feats[: lens[i], i] for i in range(b)]
        if spec.binary_features:
            from minizero_tpu.utils.bitpack import pack_planes_np

            outs = [pack_planes_np(o) if o.size else o for o in outs]
        return outs

    def resume(self) -> int:
        """Continue mode (reference zero-server.sh:116-128): load the latest
        checkpoint and rebuild the replay window from the last
        ``zero_replay_buffer`` iterations' record files. Returns the
        iteration to continue from."""
        from minizero_tpu.selfplay.record import game_record_from_string

        model_dir = os.path.join(self.run_dir, "model")
        ckpts = sorted(
            (f for f in os.listdir(model_dir) if f.endswith(".ckpt")),
            key=lambda f: int(f.split("_")[-1].split(".")[0]),
        ) if os.path.isdir(model_dir) else []
        if not ckpts:
            return self.cfg.zero_start_iteration
        # newest first; skip unloadable files (e.g. truncated by a crash on
        # an older build without the atomic rename) instead of wedging the
        # supervisor's relaunch loop on a permanent load error
        for name in reversed(ckpts):
            try:
                self.load_checkpoint(os.path.join(model_dir, name))
                break
            except Exception as exc:  # noqa: BLE001 - any broken ckpt: try older
                self.log(f"[Resume] skipping unreadable checkpoint {name}: {exc}")
        else:
            return self.cfg.zero_start_iteration
        start_iter = int(self.state.step) // max(self.cfg.learner_training_step, 1)
        sgf_dir = os.path.join(self.run_dir, "sgf")
        lo = max(1, start_iter - self.cfg.zero_replay_buffer + 1)
        loaded = 0
        shard = "" if self.is_main else f".p{self.pid}"
        pending_recs = []  # device-env records awaiting batched feature replay

        def flush_pending():
            nonlocal loaded
            if not pending_recs:
                return
            feats = self._rebuild_features_batch([r.actions for r in pending_recs])
            for rec, f in zip(pending_recs, feats):
                rec.features = f
                self.buffer.add_game(rec)
                loaded += 1
            pending_recs.clear()

        from minizero_tpu.utils.progress import ProgressBar

        bar = ProgressBar(start_iter - lo + 1, "rebuild replay window ")
        try:
            for it in range(lo, start_iter + 1):
                bar.step()
                path = os.path.join(sgf_dir, f"{it}{shard}.sgf")
                if not os.path.exists(path):
                    # record shards may be stored gzipped (checkpointed runs
                    # ship a compressed window across machines)
                    if os.path.exists(path + ".gz"):
                        import gzip

                        opener = gzip.open(path + ".gz", "rt")
                    else:
                        continue
                else:
                    opener = open(path)
                with opener:
                    lines = [ln for ln in opener]
                for line in lines:
                    line = line.strip()
                    if not line:
                        continue
                    if self.is_host_env:
                        # atari: frames come from the record's OBS tag, the
                        # episodic-life cut flags from its LL tag (no device
                        # replay possible for a host env). OBS stores only
                        # the record's own positions, so resumed continuation
                        # chunks zero-pad pre-chunk history (frame_lead=0) —
                        # the documented resume approximation
                        from minizero_tpu.tools.obs import unpack_observations

                        tags, rec = game_record_from_string(line, self.env.spec.action_size)
                        if "OBS" not in tags:
                            continue  # stripped records are not trainable
                        rec.features = None
                        rec.frames = unpack_observations(tags["OBS"])
                        rec.frame_lead = 0
                        rec.lead_actions = None
                        if "LL" in tags:
                            rec.lives_lost = np.asarray([c == "1" for c in tags["LL"]], bool)
                        self.buffer.add_game(rec)
                        self.frame_window.add(rec)
                        loaded += 1
                    else:
                        _, rec = game_record_from_string(line, self.env.spec.action_size)
                        pending_recs.append(rec)
                        if len(pending_recs) >= 256:
                            flush_pending()
            flush_pending()
        finally:
            bar.close()
        if self.frame_window is not None:
            self.frame_window.retain(self.buffer.games)
        self.cfg = self.cfg.replace(zero_start_iteration=start_iter)
        self.log(f"[Resume] iteration {start_iter}, {loaded} games reloaded")
        return start_iter

    # -------------------------------------------------------------- the loop
    def run(self) -> None:
        cfg = self.cfg
        self.save_checkpoint()  # weight_iter_0 bootstrap (zero-server.sh:113-115)
        # machine-readable per-phase monotonic stamps (perf.jsonl): the
        # second-granularity Training.log timestamps are too coarse for
        # scaling-efficiency claims over ~10 s spans (±7-12%, VERDICT r4
        # weak #5); perf_counter is microsecond-accurate and monotonic
        perf_path = os.path.join(self.run_dir,
                                 "perf.jsonl" if self.is_main else f"perf.p{self.pid}.jsonl")
        perf_log = open(perf_path, "a")
        for iteration in range(cfg.zero_start_iteration + 1, cfg.zero_end_iteration + 1):
            t0 = time.perf_counter()
            self.self_play_iteration(iteration)
            t1 = time.perf_counter()
            self.optimize_iteration(iteration)
            t2 = time.perf_counter()
            perf_log.write(json.dumps({
                "iteration": iteration, "t_start": round(t0, 6),
                "t_selfplay_done": round(t1, 6), "t_end": round(t2, 6)}) + "\n")
            perf_log.flush()
            self.save_checkpoint()
            try:
                # regenerate analysis plots every few iterations + at the end
                # (the reference's analysis.py is a manual tool; auto-running
                # it per iteration costs seconds of matplotlib + full-log
                # re-parsing that grow with the run); host-0 only
                if self.is_main and (
                        iteration % 5 == 0 or iteration == cfg.zero_end_iteration):
                    from minizero_tpu.tools.analysis import analysis

                    analysis(self.run_dir)
            except Exception as e:  # plotting must never kill training
                self.log(f"[Analysis] skipped: {e}")
