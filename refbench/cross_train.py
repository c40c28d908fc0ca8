"""Cross-framework head-to-head, reference side (VERDICT r3 #8).

Trains the reference's OWN tictactoe AlphaZero pipeline on this host's CPU:
self-play via ``selfplay_worker_tictactoe`` (the reference ZeroActor/MCTS
stack compiled in place, emitting the exact record lines ZeroServer writes
to sgf/<iter>.sgf) and optimization via the reference's UNMODIFIED
``learner/train.py`` + its pybind ``minizero_py`` DataLoader (built against
the pybind11 headers bundled with the pip torch wheel — build_xtrain.sh).
This python driver only replaces the TCP server's iteration state machine
(zero_server.cpp:159-172): broadcast self-play, collect records, send
``train <pkl> <i> <i>``, wait for ``Optimization_Done``.

The SAME abbreviated recipe (written to ``xtrain/ttt_az.cfg``; key names are
shared between the frameworks by design) is then trained with minizero_tpu
(scripts via cross_fight.py), and the two trained nets fight through one
engine at matched search settings.

    python refbench/cross_train.py [iters] [games_per_iter]
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
XTRAIN = os.path.join(HERE, "xtrain")
REF = "/root/reference/minizero"

# the shared abbreviated recipe — identical keys for both frameworks
# env selection is compile-time in the reference (environment.h); the
# minizero_tpu run adds env_name=tictactoe on top of these shared keys
RECIPE = {
    "program_auto_seed": "false",
    "program_seed": "1",
    "actor_num_simulation": "16",
    "actor_select_action_by_count": "false",
    "actor_select_action_by_softmax_count": "true",
    "actor_select_action_softmax_temperature": "1.0",
    "actor_select_action_softmax_temperature_decay": "false",
    "actor_use_dirichlet_noise": "true",
    "actor_dirichlet_noise_alpha": "0.3",
    "actor_dirichlet_noise_epsilon": "0.25",
    "actor_use_gumbel": "false",
    "actor_use_gumbel_noise": "false",
    "actor_use_random_rotation_features": "true",
    "zero_num_parallel_games": "64",
    "zero_replay_buffer": "5",
    "learner_training_step": "100",
    "learner_training_display_step": "50",
    "learner_batch_size": "256",
    "learner_learning_rate": "0.02",
    "learner_momentum": "0.9",
    "learner_weight_decay": "0.0001",
    "learner_optimizer": "sgd",
    "learner_use_per": "false",
    "nn_type_name": "alphazero",
    "nn_num_blocks": "1",
    "nn_num_hidden_channels": "64",
    "nn_num_value_hidden_channels": "64",
}


def conf_str(extra=None):
    kv = dict(RECIPE)
    if extra:
        kv.update(extra)
    return ":".join(f"{k}={v}" for k, v in kv.items())


def setup_workspace():
    os.makedirs(XTRAIN, exist_ok=True)
    link = os.path.join(XTRAIN, "minizero")
    if not os.path.islink(link):
        os.symlink(REF, link)
    # train.py's post-optimization `analysis(training_dir, "analysis")` parses
    # server logs this driver does not write; stub it out (plots are not the
    # artifact here — the trained net is)
    tools = os.path.join(XTRAIN, "tools")
    os.makedirs(tools, exist_ok=True)
    open(os.path.join(tools, "__init__.py"), "w").close()
    with open(os.path.join(tools, "analysis.py"), "w") as f:
        f.write("def analysis(*args, **kwargs):\n    return None\n")
    cfg = os.path.join(XTRAIN, "ttt_az.cfg")
    with open(cfg, "w") as f:
        for k, v in RECIPE.items():
            f.write(f"{k}={v}\n")
    return cfg


def main(iters=15, games_per_iter=250):
    cfg = setup_workspace()
    tdir = os.path.join(XTRAIN, "ref_ttt_az")
    os.makedirs(os.path.join(tdir, "model"), exist_ok=True)
    os.makedirs(os.path.join(tdir, "sgf"), exist_ok=True)

    env = dict(os.environ)
    env["PYTHONPATH"] = XTRAIN + os.pathsep + env.get("PYTHONPATH", "")
    trainer = subprocess.Popen(
        [sys.executable, os.path.join(REF, "learner", "train.py"),
         "tictactoe", tdir, cfg],
        cwd=XTRAIN, env=env, text=True, bufsize=1,
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=open(
            os.path.join(tdir, "op.log"), "a"),
    )

    def send(cmd):
        trainer.stdin.write(cmd + "\n")
        trainer.stdin.flush()

    def wait_done(timeout=600):
        t0 = time.time()
        while time.time() - t0 < timeout:
            line = trainer.stdout.readline()
            if not line:
                raise RuntimeError("trainer exited; see op.log")
            if line.startswith("Optimization_Done"):
                return int(line.split()[1])
        raise TimeoutError("trainer did not finish")

    # bootstrap weight_iter_0 (zero-server.sh:113-115 sends `train "" -1 -1`)
    send('train "" -1 -1')
    pt0 = os.path.join(tdir, "model", "weight_iter_0.pt")
    for _ in range(600):
        if os.path.exists(pt0):
            break
        time.sleep(0.5)
    assert os.path.exists(pt0), "bootstrap model missing"

    step = 0
    steps_per_iter = int(RECIPE["learner_training_step"])
    t_start = time.time()
    for i in range(1, iters + 1):
        pt = os.path.join(tdir, "model", f"weight_iter_{step}.pt")
        sgf = os.path.join(tdir, "sgf", f"{i}.sgf")
        t0 = time.time()
        sp = subprocess.run(
            [os.path.join(HERE, "selfplay_worker_tictactoe"), pt,
             str(games_per_iter), sgf,
             conf_str({"program_seed": str(100 + i),
                       "nn_file_name": f"weight_iter_{step}.pt"}), "2"],
            capture_output=True, text=True, timeout=1200)
        if sp.returncode != 0:
            raise RuntimeError(f"selfplay failed: {sp.stderr[-2000:]}")
        t_sp = time.time() - t0
        send(f"train weight_iter_{step}.pkl {i} {i}")
        step = wait_done()
        print(f"[ref iter {i}] selfplay {games_per_iter} games {t_sp:.1f}s, "
              f"optimize -> step {step} ({time.time() - t0 - t_sp:.1f}s)",
              flush=True)
        assert step == i * steps_per_iter, (step, i)
    send("quit")
    trainer.wait(timeout=60)
    print(json.dumps({
        "metric": "reference_ttt_az_training",
        "iterations": iters,
        "games_per_iter": games_per_iter,
        "final_step": step,
        "seconds": round(time.time() - t_start, 1),
        "model": os.path.join(tdir, "model", f"weight_iter_{step}.pkl"),
    }))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
