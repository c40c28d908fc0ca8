"""True multi-process (multi-host) training-loop test on CPU.

SURVEY.md §4: "multi-host tests runnable on CPU via jax.distributed +
xla_force_host_platform_device_count". Two processes (2 virtual devices
each) join one 4-device global mesh: self-play runs per-host on local
meshes, training data-parallels over the global mesh, host-0 writes the
checkpoints and each host appends its own record shard.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
sys.path.insert(0, sys.argv[4])
import jax
jax.config.update("jax_platforms", "cpu")
pid, port, run_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 4

from minizero_tpu.config import default_config
from minizero_tpu.parallel.mesh import make_mesh
from minizero_tpu.zero.loop import ZeroLoop

cfg = default_config(
    "tictactoe",
    actor_num_simulation=4,
    nn_num_blocks=1,
    nn_num_hidden_channels=8,
    nn_num_value_hidden_channels=8,
    zero_num_parallel_games=8,
    zero_num_games_per_iteration=4,
    learner_training_step=2,
    learner_batch_size=8,
    zero_end_iteration=1,
    program_auto_seed=False,
    actor_use_random_rotation_features=False,
)
mesh = make_mesh(len(jax.devices()))
loop = ZeroLoop(cfg, run_dir, mesh=mesh)
loop.run()
print(f"WORKER_{pid}_DONE games_in_buffer={len(loop.buffer.games)}")
"""


@pytest.mark.slow
def test_two_process_training_loop(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    run_dir = str(tmp_path / "run")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), str(port), run_dir, repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_{pid}_DONE" in out

    # host-0 wrote checkpoints; each host wrote its own record shard
    ckpts = os.listdir(os.path.join(run_dir, "model"))
    assert any(c.startswith("weight_iter_") for c in ckpts)
    assert os.path.exists(os.path.join(run_dir, "sgf", "1.sgf"))
    assert os.path.exists(os.path.join(run_dir, "sgf", "1.p1.sgf"))
    # aggregated stats mention both hosts
    log = open(os.path.join(run_dir, "Training.log")).read()
    assert "2 hosts" in log


_DEAD_PEER_WORKER = r"""
import os, sys
sys.path.insert(0, sys.argv[4])
import jax
jax.config.update("jax_platforms", "cpu")
pid, port, run_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)

from minizero_tpu.config import default_config
from minizero_tpu.parallel.mesh import make_mesh
from minizero_tpu.zero.loop import ZeroLoop

cfg = default_config(
    "tictactoe",
    actor_num_simulation=4,
    nn_num_blocks=1,
    nn_num_hidden_channels=8,
    nn_num_value_hidden_channels=8,
    zero_num_parallel_games=8,
    zero_num_games_per_iteration=4,
    learner_training_step=2,
    learner_batch_size=8,
    zero_end_iteration=1,
    zero_collective_timeout=5.0,
    program_auto_seed=False,
    actor_use_random_rotation_features=False,
)
mesh = make_mesh(len(jax.devices()))
loop = ZeroLoop(cfg, run_dir, mesh=mesh)
if pid == 1:
    # simulate a WEDGED host: the process stays alive (so jax's
    # coordination-service heartbeat keeps passing) but stops
    # participating in collectives — the case only the watchdog catches.
    # (A peer that dies outright is caught by the heartbeat itself.)
    import time
    print("WORKER_1_WEDGED", flush=True)
    time.sleep(3600)
loop.run()
print("WORKER_0_DONE")  # must NOT be reached
"""


@pytest.mark.slow
def test_wedged_peer_aborts_fast(tmp_path):
    """A wedged peer must abort the survivor promptly (collective watchdog,
    parallel/watchdog.py) instead of blocking the job forever — the SPMD
    counterpart of the reference server dropping lost TCP workers
    (zero_server.cpp:86,148)."""
    from minizero_tpu.parallel.watchdog import WATCHDOG_EXIT_CODE

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    run_dir = str(tmp_path / "run")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _DEAD_PEER_WORKER, str(pid), str(port), run_dir, repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]
    try:
        # the survivor must fail fast (watchdog timeout 5s + jit/compile
        # slack), NOT hang until the 180s harness timeout
        out0, _ = procs[0].communicate(timeout=180)
    finally:
        procs[1].kill()
    out1, _ = procs[1].communicate(timeout=30)
    assert "WORKER_1_WEDGED" in out1
    assert procs[0].returncode == WATCHDOG_EXIT_CODE, f"worker 0:\n{out0[-4000:]}"
    assert "[Watchdog] collective" in out0
    assert "WORKER_0_DONE" not in out0
