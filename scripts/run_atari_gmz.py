"""Atari gmz zero-loop smoke ON THE CHIP (VERDICT r1 item #7).

Runs the full Atari iteration path — host vectorized env (FakeALE when
ale_py/ROMs are absent; the point is the host-engine + device MuZero
search + sequence chunking + OBS pipeline at b=256 on real TPU) — for a
few iterations with OBS recording on, then exercises an OBS-based resume
and reports measured self-play moves/s.

    python scripts/run_atari_gmz.py [run_dir] [iterations] [batch]
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
# env vars cannot override the baked axon platform config — this can
# (CPU smokes MUST NOT become a second TPU client next to a running job)
if os.environ.get("MINIZERO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MINIZERO_PLATFORM"])


def main(run_dir="runs/atari_gmz_r2", iterations=3, batch=256, sims=0, rb=0):
    from minizero_tpu.config import algorithm_preset, default_config
    from minizero_tpu.envs.atari import FakeALE
    from minizero_tpu.zero.loop import ZeroLoop

    try:
        import ale_py  # noqa: F401
        factory = None  # real ALE available
        backend = "ale_py"
    except ImportError:
        factory = lambda s: FakeALE(seed=s, length=900)  # noqa: E731
        backend = "FakeALE"

    over = dict(algorithm_preset("gmz", is_atari=True))
    if sims:  # staged-compile runs use a smaller search first (n=12)
        over.update(actor_num_simulation=sims, actor_gumbel_sample_size=sims)
    over.update(
        zero_num_parallel_games=batch,
        zero_num_games_per_iteration=batch,  # sequences per iteration
        zero_end_iteration=iterations,
        learner_training_step=200,
        learner_training_display_step=100,
        learner_batch_size=min(batch, 256),
        zero_actor_record_observations=True,
        program_auto_seed=False,
    )
    if rb:
        # smaller replay window (e.g. 8 iterations) keeps the whole frame
        # window device-resident within learner_device_feature_window_gb
        over.update(zero_replay_buffer=rb)
    if os.environ.get("ATARI_SMOKE_TINY"):  # CPU flow check
        over.update(nn_num_blocks=1, nn_num_hidden_channels=8,
                    nn_num_value_hidden_channels=8, actor_num_simulation=3,
                    learner_training_step=2, learner_training_display_step=2,
                    learner_batch_size=4, learner_muzero_unrolling_step=2,
                    learner_n_step_return=2)
    cfg = default_config("atari", **over)
    print(f"atari gmz n={cfg.actor_num_simulation} b={batch} backend={backend} "
          f"device={jax.devices()[0]}", flush=True)

    t0 = time.time()
    loop = ZeroLoop(cfg, run_dir, ale_factory=factory)
    try:
        start = loop.resume()  # reuse a prior attempt's finished self-play
    except Exception:
        start = 0
    if start:
        print(f"resumed at iteration {start}", flush=True)
    loop.run()
    wall = time.time() - t0

    log = open(os.path.join(run_dir, "Training.log")).read()
    moves = 0
    for m in re.finditer(r"\[SelfPlay Game Lengths\].*avg: ([\d.]+)", log):
        moves += float(m.group(1)) * batch
    print(f"run complete: {iterations} iterations in {wall:.1f}s "
          f"(~{moves / max(wall, 1):.0f} env-steps/s incl. training)", flush=True)

    # OBS-based resume: a fresh loop must rebuild the window from records.
    # Free the finished loop FIRST — two live loops means two device frame
    # windows (~7.5 GB each at rb=7) and a ResourceExhausted on the chip.
    import gc

    del loop
    gc.collect()
    loop2 = ZeroLoop(cfg.replace(zero_end_iteration=iterations + 1), run_dir,
                     ale_factory=factory)
    start = loop2.resume()
    print(f"resume from iteration {start}: {len(loop2.buffer)} sequences rebuilt")
    assert start == iterations and len(loop2.buffer) > 0
    loop2.run()
    print("post-resume iteration complete; analysis plots in",
          os.path.join(run_dir, "analysis"))


if __name__ == "__main__":
    main(*(sys.argv[1:] and [sys.argv[1]] or []),
         **({"iterations": int(sys.argv[2])} if len(sys.argv) > 2 else {}),
         **({"batch": int(sys.argv[3])} if len(sys.argv) > 3 else {}),
         **({"sims": int(sys.argv[4])} if len(sys.argv) > 4 else {}),
         **({"rb": int(sys.argv[5])} if len(sys.argv) > 5 else {}))
