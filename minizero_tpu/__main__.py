"""Mode-dispatch CLI (reference ``minizero/console/mode_handler.cpp``).

    python -m minizero_tpu -mode <mode> [-conf_file f] [-conf_str s] [-gen f]

Modes (``mode_handler.cpp:20-27``): ``console`` (GTP), ``sp`` (standalone
self-play to a record file), ``zero`` (single-host zero training loop — the
fused replacement for zero_server + workers), ``env_test`` (random playout +
record round-trip self-check), ``zero_training_name`` (canonical run name),
``eval`` (head-to-head match between two checkpoints).
"""

from __future__ import annotations

import argparse
import os
import sys


def build_config(args):
    from minizero_tpu.config import default_config

    cfg = default_config()
    if args.conf_file:
        cfg = cfg.load_file(args.conf_file)
        # re-apply env defaults then file again so file overrides win
        from minizero_tpu.config import default_config as dc

        cfg = dc(cfg.env_name).load_file(args.conf_file)
    if args.conf_str:
        env_name = cfg.load_string(args.conf_str).env_name
        if env_name != cfg.env_name:
            from minizero_tpu.config import default_config as dc

            cfg = dc(env_name)
        cfg = cfg.load_string(args.conf_str)
    return cfg


def training_name(cfg) -> str:
    """reference ModeHandler::runZeroTrainingName (mode_handler.cpp:157-165):
    "{env}_{gumbel?}{az|mz}_{blocks}bx{channels}_n{sims}"."""
    alg = ("g" if cfg.actor_use_gumbel else "") + (
        "az" if cfg.nn_type_name == "alphazero" else "mz"
    )
    name = cfg.env_name
    if cfg.env_board_size:
        name += f"_{cfg.env_board_size}x{cfg.env_board_size}"
    return f"{name}_{alg}_{cfg.nn_num_blocks}bx{cfg.nn_num_hidden_channels}_n{cfg.actor_num_simulation}"


def run_env_test(cfg) -> None:
    """Random playout + record round-trip (reference
    ModeHandler::runEnvTest, mode_handler.cpp:167-192)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from minizero_tpu.envs import make_env

    env = make_env(cfg)
    rng = np.random.RandomState(cfg.program_seed)
    state = env.init_random(jax.random.PRNGKey(cfg.program_seed))
    step = jax.jit(env.step)
    actions = []
    for move in range(env.spec.max_game_length + 1):
        if bool(env.is_terminal(state)):
            break
        mask = np.asarray(env.legal_mask(state))
        legal = np.nonzero(mask)[0]
        assert len(legal) > 0, f"no legal action at move {move} (non-terminal)"
        a = int(rng.choice(legal))
        state = step(state, jnp.int32(a))
        actions.append(a)
    print(f"played {len(actions)} moves; terminal={bool(env.is_terminal(state))}; "
          f"eval={float(env.eval_score(state)):g}")
    # replay determinism check (deterministic envs only)
    if not hasattr(state, "rng"):
        state2 = env.init_random(jax.random.PRNGKey(cfg.program_seed))
        for a in actions:
            state2 = step(state2, jnp.int32(a))
        for leaf1, leaf2 in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(state2)):
            np.testing.assert_array_equal(np.asarray(leaf1), np.asarray(leaf2))
        print("replay determinism check passed")


def run_selfplay(cfg, num_games: int, output: str) -> None:
    import jax

    from minizero_tpu.envs import make_env
    from minizero_tpu.models.factory import create_network, init_network
    from minizero_tpu.selfplay.collector import TrajectoryCollector
    from minizero_tpu.selfplay.engine import SelfPlayEngine
    from minizero_tpu.selfplay.record import serialize_game

    if cfg.env_name == "atari":
        return run_selfplay_host(cfg, num_games, output)
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(cfg.program_seed))
    engine = SelfPlayEngine(env, cfg, net)
    batch = cfg.zero_num_parallel_games
    collector = TrajectoryCollector(cfg, env.spec, batch, seed=cfg.program_seed)
    rng = jax.random.PRNGKey(cfg.program_seed)
    rng, k = jax.random.split(rng)
    states = engine.init_batch(batch, k)
    done = 0
    out = open(output, "w") if output else sys.stdout
    # chunked collection like the zero loop: one dispatch per M moves
    enable = collector.enable_resign_flags()
    msr = None
    scan_moves = max(1, int(cfg.zero_moves_per_dispatch))
    while done < num_games:
        rng, k = jax.random.split(rng)
        stacked, states, enable, msr = engine.move_scan(
            variables, states, k, 1.0, scan_moves, enable, msr)
        for fg in collector.add_scan(stacked):
            if done >= num_games:
                break
            out.write(serialize_game(env.spec.name, fg.record, env.spec.board_size, fg.players) + "\n")
            done += 1
    if output:
        out.close()
    print(f"wrote {done} games", file=sys.stderr)


def run_selfplay_host(cfg, num_games: int, output: str, ale_factory=None) -> None:
    """Standalone self-play over the host (ALE) env with SD/LL/OBS record
    tags (the atari variant of -mode sp)."""
    import jax

    from minizero_tpu.envs.atari import AtariVecEnv
    from minizero_tpu.models.factory import create_network, init_network
    from minizero_tpu.selfplay.host_engine import AtariTrajectoryCollector, HostSelfPlayEngine
    from minizero_tpu.selfplay.record import serialize_game
    from minizero_tpu.tools.obs import pack_observations

    batch = cfg.zero_num_parallel_games
    vec = AtariVecEnv(batch, seed=cfg.program_seed, game_name=cfg.env_atari_name,
                      rom_dir=cfg.env_atari_rom_dir, ale_factory=ale_factory)
    net = create_network(cfg, vec.spec)
    variables = init_network(net, vec.spec, jax.random.PRNGKey(cfg.program_seed))
    engine = HostSelfPlayEngine(vec, cfg, net)
    collector = AtariTrajectoryCollector(cfg, vec.spec, batch)
    rng = jax.random.PRNGKey(cfg.program_seed)
    done = 0
    out = open(output, "w") if output else sys.stdout
    while done < num_games:
        rng, k = jax.random.split(rng)
        mv = engine.move(variables, k)
        finished, reset_slots = collector.add_moves(mv)
        for fg in finished:
            extra = {"SD": str(vec.envs[fg.slot].seed)}
            if fg.abs_start:
                extra["OFF"] = str(fg.abs_start)
            if fg.record.lives_lost is not None:
                extra["LL"] = "".join("1" if x else "0" for x in fg.record.lives_lost)
            line = serialize_game(vec.spec.name, fg.record, vec.spec.board_size,
                                  fg.players, extra_tags=extra)
            if cfg.zero_actor_record_observations:
                obs = fg.record.frames[fg.record.frame_lead:]
                line = line[:-1] + f"OBS[{pack_observations(obs)}]" + line[-1:]
            out.write(line + "\n")
            done += 1
        if reset_slots:
            vec.reset_done()
    if output:
        out.close()
    print(f"wrote {done} games", file=sys.stderr)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="minizero_tpu")
    parser.add_argument("-mode", default="console",
                        choices=["console", "sp", "zero", "env_test", "zero_training_name",
                                 "eval", "remove_obs", "recover_obs"])
    parser.add_argument("-conf_file", default="")
    parser.add_argument("-conf_str", default="")
    parser.add_argument("-gen", default="", help="generate an annotated config file and exit")
    parser.add_argument("-num_games", type=int, default=100)
    parser.add_argument("-input", default="")
    parser.add_argument("-output", default="")
    parser.add_argument("-run_dir", default="training_result")
    parser.add_argument("-run_dir_b", default="",
                        help="second run dir: eval mode runs a cross-run "
                             "fight-eval (reference tools/fight-eval.sh)")
    parser.add_argument("-iteration", default="",
                        help="checkpoint name for fight-eval (e.g. iter_10)")
    parser.add_argument("-multi_device", action="store_true",
                        help="zero mode: shard self-play/training over all "
                             "devices (multi-host via JAX_COORDINATOR_ADDRESS)")
    parser.add_argument("-platform", default="",
                        help="force a jax platform (e.g. cpu); needed because "
                             "the baked sitecustomize pins the tunneled TPU "
                             "backend regardless of JAX_PLATFORMS")
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    cfg = build_config(args)
    if cfg.program_quiet:
        # silence diagnostic output like the reference's cerr redirect
        # (console/mode_handler.cpp:61, utils/ostream_redirector.h); GTP
        # replies and mode outputs stay on stdout. Keep a handle and close
        # it at exit so the fd doesn't leak (sys.__stderr__ stays intact).
        import atexit

        devnull = open(os.devnull, "w")
        sys.stderr = devnull
        atexit.register(devnull.close)
    if args.gen:
        cfg.save_file(args.gen)
        print(f"wrote {args.gen}")
        return 0

    if args.mode == "zero_training_name":
        print(training_name(cfg))
        return 0
    if args.mode == "env_test":
        run_env_test(cfg)
        return 0
    if args.mode == "console":
        from minizero_tpu.console.gtp import GTPConsole

        GTPConsole(cfg).run()
        return 0
    if args.mode == "sp":
        run_selfplay(cfg, args.num_games, args.output)
        return 0
    if args.mode == "zero":
        from minizero_tpu.zero.loop import ZeroLoop

        mesh = None
        if args.multi_device:
            # shard self-play + training over every visible device (and,
            # under jax.distributed via JAX_COORDINATOR_ADDRESS, every host —
            # the reference's worker fleet, README.md:58-99)
            from minizero_tpu.parallel.distributed import init_distributed
            from minizero_tpu.parallel.mesh import make_mesh

            init_distributed()
            import jax

            if len(jax.devices()) > 1:
                mesh = make_mesh(len(jax.devices()))
        loop = ZeroLoop(cfg, args.run_dir, mesh=mesh)
        loop.resume()  # continue mode when the run dir has checkpoints
        loop.run()
        return 0
    if args.mode == "eval":
        from minizero_tpu.eval.match import run_eval_cli

        return run_eval_cli(cfg, args)
    if args.mode == "remove_obs":
        from minizero_tpu.tools.obs import remove_obs_file

        n = remove_obs_file(args.input, args.output or args.input + ".noobs")
        print(f"stripped OBS from {n} records")
        return 0
    if args.mode == "recover_obs":
        # deterministic seed replay via the env backend (reference
        # obs_recover.h:19-83); atari needs the optional ale_py package
        from minizero_tpu.tools.obs import AtariObsReplayer, recover_obs_file

        replayer = AtariObsReplayer(rom_dir=cfg.env_atari_rom_dir)
        n = recover_obs_file(args.input, args.output or args.input + ".obs", replayer)
        print(f"recovered OBS for {n} records")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
