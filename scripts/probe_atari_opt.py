"""Probe the Atari optimize phase: where do the 1.75 s/step go?

Round-4 measured 0.57 optimizer steps/s for atari gmz b=128 (the sole
blocker to a sustained run, VERDICT r4 missing #1). Before redesigning,
measure the split with the exact production shapes:

  t_sample  — host `ReplayBuffer.sample_muzero` for a K-step chunk
  t_stack   — np.stack of the K per-step batches
  t_upload  — jnp.asarray + block (host->device over the tunnel, u8)
  t_device  — feat cast + jitted K-step lax.scan train chunk + block
  t_device2 — same chunk re-run on the SAME device arrays (pure compute,
              no upload overlap ambiguity)

Synthetic window: one r4 iteration's worth of FakeALE-shaped records
(128 games x 215 positions, u8[215,96,96,32] random) — bit-identical
shapes/dtypes to runs/atari_gmz_r4_b128.

    python scripts/probe_atari_opt.py [batch=128] [chunks=3]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
if os.environ.get("MINIZERO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MINIZERO_PLATFORM"])


def main(batch=128, chunks=3):
    from minizero_tpu.config import algorithm_preset, default_config
    from minizero_tpu.learner.replay import GameRecord, ReplayBuffer
    from minizero_tpu.learner.train import init_train_state, make_train_step
    from minizero_tpu.models.factory import create_network, init_network

    over = dict(algorithm_preset("gmz", is_atari=True))
    over.update(
        zero_num_parallel_games=batch,
        zero_num_games_per_iteration=batch,
        learner_training_step=200,
        learner_training_display_step=100,
        learner_batch_size=min(batch, 256),
        program_auto_seed=False,
    )
    cfg = default_config("atari", **over)
    from minizero_tpu.envs.atari import AtariEnv, FakeALE
    spec_env = AtariEnv(game_name=cfg.env_atari_name,
                        ale_factory=lambda s: FakeALE(seed=s, length=900))
    spec = spec_env.spec
    print(f"net blocks={cfg.nn_num_blocks} ch={cfg.nn_num_hidden_channels} "
          f"bs={cfg.learner_batch_size} unroll={cfg.learner_muzero_unrolling_step} "
          f"per={cfg.learner_use_per} feat={spec.input_height}x{spec.input_width}"
          f"x{spec.num_input_channels}", flush=True)

    # ---- synthetic one-iteration window, r4 record schema -----------------
    rng = np.random.RandomState(0)
    buf = ReplayBuffer(cfg, spec)
    L = 215
    for g in range(batch):
        buf.add_game(GameRecord(
            actions=rng.randint(18, size=L).astype(np.int32),
            policy=rng.dirichlet(np.ones(spec.action_size), size=L).astype(np.float16),
            values=rng.randn(L).astype(np.float32),
            rewards=(rng.rand(L) < 0.05).astype(np.float32),
            features=rng.randint(0, 255, size=(L, spec.input_height, spec.input_width,
                                               spec.num_input_channels), dtype=np.uint8),
            result=float(rng.rand() * 300),
            lives_lost=(rng.rand(L) < 0.01),
        ))
    print(f"window: {len(buf)} games, {buf.num_data} positions", flush=True)

    network = create_network(cfg, spec)
    variables = init_network(network, spec, jax.random.PRNGKey(0))
    state = init_train_state(cfg, variables)
    step_fn = make_train_step(cfg, spec_env, network)

    def train_chunk(state, batches, k):
        def body(carry, b):
            st, kk = carry
            kk, k2 = jax.random.split(kk)
            st, metrics = step_fn(st, b, k2)
            return (st, kk), metrics
        (state, _), metrics = jax.lax.scan(body, (state, k), batches)
        return state, metrics

    jit_chunk = jax.jit(train_chunk)  # no donation: we re-run on same arrays
    n_ch = spec.num_input_channels
    feat_cast = jax.jit(lambda x: x.astype(jnp.float32))

    bs = cfg.learner_batch_size
    feat_bytes_per_step = bs * spec.input_height * spec.input_width * n_ch * 4
    K = max(1, min(cfg.learner_training_display_step, 100,
                   int(1.5e9 // max(feat_bytes_per_step, 1)) or 1))
    print(f"chunk K={K} ({feat_bytes_per_step/1e6:.0f} MB f32 feats/step)", flush=True)

    nprng = np.random.RandomState(1)
    key = jax.random.PRNGKey(1)
    for it in range(chunks + 1):  # +1: first incl. compile
        t0 = time.time()
        batches = []
        for _ in range(K):
            b = buf.sample_muzero(bs, nprng)
            b.pop("sampled_index")
            batches.append(b)
        t1 = time.time()
        stacked = {k2: np.stack([b[k2] for b in batches]) for k2 in batches[0]}
        t2 = time.time()
        dev = {k2: jnp.asarray(v) for k2, v in stacked.items()}
        jax.block_until_ready(dev)
        t3 = time.time()
        dev["features"] = feat_cast(dev["features"])
        key, k2 = jax.random.split(key)
        new_state, metrics = jit_chunk(state, dev, k2)
        # block_until_ready over the tunnel does NOT reliably block (CLAUDE.md
        # timing trap) — materialize a scalar fingerprint on host instead
        fp1 = float(np.asarray(sum(jnp.sum(v) for v in metrics.values()
                                   if v.dtype != jnp.int32)))
        t4 = time.time()
        # pure-compute re-run on the same device arrays
        key, k3 = jax.random.split(key)
        new_state2, metrics2 = jit_chunk(state, dev, k3)
        fp2 = float(np.asarray(sum(jnp.sum(v) for v in metrics2.values()
                                   if v.dtype != jnp.int32)))
        t5 = time.time()
        assert np.isfinite(fp1) and np.isfinite(fp2), (fp1, fp2)
        tag = "compile" if it == 0 else f"chunk {it}"
        print(f"[{tag}] sample={t1-t0:.2f}s stack={t2-t1:.2f}s "
              f"upload={t3-t2:.2f}s ({sum(v.nbytes for v in stacked.values())/1e6:.0f} MB, "
              f"{sum(v.nbytes for v in stacked.values())/1e6/max(t3-t2,1e-9):.0f} MB/s) "
              f"device={t4-t3:.2f}s device_rerun={t5-t4:.2f}s "
              f"-> steps/s={K/(t5-t0-(t5-t4)):.2f} (pure device {K/(t5-t4):.2f})",
              flush=True)
        del new_state, new_state2, metrics, metrics2, dev


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
