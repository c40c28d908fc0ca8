"""Self-play throughput benchmark — Go 9x9 Gumbel AlphaZero (the reference's
headline config: n=16 simulations, 1 block x 256 channels, README.md:179-194).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric: self-play env-steps/s on one chip (BASELINE.md north star).
``vs_baseline`` divides by an estimated reference throughput of 1000
env-steps/s for one MiniZero GPU worker (64 parallel games, C++ MCTS + batched
TorchScript inference on an RTX A5000-class GPU; the reference publishes no
throughput numbers — BASELINE.md — so this denominator is an engineering
estimate, documented here and held fixed across rounds for comparability).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: remote (tunnel) compiles of the fused engine
# take ~13 min per shape — cache them across processes
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

REFERENCE_ENV_STEPS_PER_S = 1000.0  # estimated reference GPU worker (see above)


def _latest_trained_ckpt():
    """Newest Go9 AZ-trained checkpoint from the training runs in runs/.

    Prefer the az n=200 run's own weights: a net trained WITH the az
    search gives the shallow, peaked-prior walks the production run
    actually sees. The gaz-trained net (previous fallback) is off-policy
    for n=200 — its priors at az-search depths are flat enough to behave
    like the random-init depth wall (round 4: bench said 572 env-steps/s
    on gaz weights while the live az200 training run measured ~1,900)."""
    import glob
    import os
    import re

    cands = []
    for run in ("runs/go9_az200_r3b", "runs/go9_gaz_full", "runs/go9_gaz_r1"):
        cands = glob.glob(os.path.join(os.path.dirname(__file__), run, "model", "weight_iter_*.ckpt"))
        if cands:
            break
    if not cands:
        return None
    return max(cands, key=lambda p: (int(re.search(r"(\d+)", os.path.basename(p)).group(1)),))


def _bench_az200(trained: bool) -> dict:
    """az n=200 (the reference's flagship AlphaZero config) env-steps/s."""
    from minizero_tpu.config import algorithm_preset, default_config
    from minizero_tpu.envs import make_env
    from minizero_tpu.models.factory import create_network, init_network
    from minizero_tpu.selfplay.engine import SelfPlayEngine

    cfg = default_config("go", **algorithm_preset("az")).replace(actor_num_simulation=200)
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))
    label = "random_init"
    if trained:
        ckpt = _latest_trained_ckpt()
        if ckpt is None:
            return {"skipped": "no trained checkpoint in runs/"}
        from minizero_tpu.eval.match import load_checkpoint_variables

        variables = load_checkpoint_variables(ckpt, cfg, net, env.spec)
        label = ckpt.split("runs/")[-1]
    engine = SelfPlayEngine(env, cfg, net)
    batch = 1024
    states = engine.init_batch(batch)
    rng, k = jax.random.split(jax.random.PRNGKey(1))
    # steady-state warm-up: a FRESH batch puts all 1024 games in the opening
    # phase — the deep-walk worst case for az n=200 (uniform-prior walks
    # retrace one chain, CLAUDE.md "depth wall") — which is why the round-4
    # synthetic bench read 567 env-steps/s while the production loop (whose
    # batch mixes phases via in-scan game resets) measured 2,357. Warming
    # ~56 moves reaches the production phase mix before timing.
    warm_moves = 56 if trained else 4
    moves = 16  # >=16 chained moves: 4-move samples are too
    # exposed to the tunnel's 0.1-100 ms RTT swings (VERDICT r2 weak #3)
    _, states, enable, msr = engine.move_scan(variables, states, k, 1.0, warm_moves)
    jax.block_until_ready(jax.tree_util.tree_leaves(states)[0])
    t0 = time.perf_counter()
    rng, k = jax.random.split(rng)
    _, states, enable, msr = engine.move_scan(variables, states, k, 1.0, moves, enable, msr)
    jax.block_until_ready(jax.tree_util.tree_leaves(states)[0])
    dt = time.perf_counter() - t0
    steps_per_s = batch * moves / dt
    out = {
        "env_steps_per_s": round(steps_per_s, 1),
        "weights": label,
        "batch_games": batch,
        "moves_timed": moves,
        "warm_moves": warm_moves,
        # per-config denominators (BASELINE.md round-4 refbench measurement:
        # reference CPU worker at az n=200 = 5.12 env-steps/s; GPU estimate =
        # the fixed 1000 n=16 figure scaled by the measured CPU ratio)
        "vs_reference_cpu_worker_n200": round(steps_per_s / 5.12, 1),
        "vs_reference_gpu_worker_est_n200": round(steps_per_s / 78.5, 1),
    }
    if trained:
        # trace-based net-vs-tree device split for the flagship az config
        import tempfile

        from minizero_tpu.tools.trace_report import aggregate

        trace_dir = tempfile.mkdtemp(prefix="bench_az200_trace_")
        with jax.profiler.trace(trace_dir):
            rng, k = jax.random.split(rng)
            _, states, enable, msr = engine.move_scan(
                variables, states, k, 1.0, 4, enable, msr)
            jax.block_until_ready(jax.tree_util.tree_leaves(states)[0])
        rows, total_ps = aggregate(trace_dir, by="op")
        total = float(total_ps) or 1.0
        net_ps = sum(r[1] for r in rows if any(
            s in r[0].lower() for s in ("conv", "dot", "fusion.clone")))
        tree_ps = sum(r[1] for r in rows if "custom-call" in r[0].lower())
        # source-line attribution: names the while-loops the op view leaves
        # opaque (VERDICT r4 weak #2 — "~68% of device time unattributed")
        src_rows, src_total = aggregate(trace_dir, by="source")
        src_total = float(src_total) or 1.0
        out["device_split"] = {
            "net_pct": round(100.0 * net_ps / total, 1),
            "tree_kernel_pct": round(100.0 * tree_ps / total, 1),
            "top_ops": [
                {"op": r[0][:40], "pct": round(100.0 * r[1] / total, 1)}
                for r in rows[:4]
            ],
            "top_sources": [
                {"source": r[0][-80:], "pct": round(100.0 * r[1] / src_total, 1)}
                for r in src_rows[:8]
            ],
        }
    return out


def _bench_mz50_search() -> dict:
    """Atari MuZero n=50 device search latency (reference mz headline;
    the ALE itself is host-side and excluded — scripts/perf_atari_search.py
    is the side-by-side)."""
    from minizero_tpu.config import algorithm_preset, default_config
    from minizero_tpu.envs.atari import atari_spec
    from minizero_tpu.models.factory import create_network, init_network
    from minizero_tpu.selfplay.engine import search_spec_from_config
    from minizero_tpu.selfplay.muzero_search import make_muzero_search

    cfg = default_config("atari", **algorithm_preset("mz")).replace(actor_num_simulation=50)
    spec = atari_spec()
    net = create_network(cfg, spec)
    variables = init_network(net, spec, jax.random.PRNGKey(0))
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, variables)
    sspec = search_spec_from_config(cfg, spec)
    c = spec.num_action_feature_channels

    def action_features(action):
        onehot = (jnp.arange(spec.action_size) == action).astype(jnp.float32)
        return jnp.broadcast_to(
            onehot[None, None, :], (spec.hidden_height, spec.hidden_width, c))

    search = make_muzero_search(
        net, sspec, action_features,
        num_players=1, discrete_value=spec.discrete_value_size > 1,
        compute_dtype=jnp.bfloat16)
    b = 256
    feats = jax.random.uniform(
        jax.random.PRNGKey(1),
        (b, spec.input_height, spec.input_width, spec.num_input_channels))
    legal = jnp.ones((b, spec.action_size), bool)
    turns = jnp.ones((b,), jnp.int32)
    fn = jax.jit(lambda v, f, rng: search(v, f, legal, turns, rng, jnp.float32(1.0)))
    out = fn(variables, feats, jax.random.PRNGKey(0))
    jax.block_until_ready(out.action)
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(variables, feats, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(out.action)
    return {"search_ms": round((time.perf_counter() - t0) / reps * 1000.0, 2),
            "batch": b, "sims": 50}


def _atari_e2e_from_run() -> dict:
    """Atari gmz end-to-end throughput, read from the committed on-chip run
    (runs/atari_gmz_r3_b128, round 3: FakeALE backend, b=128, n=12) —
    measured by scripts/run_atari_gmz.py, not re-run here (a full Atari
    iteration takes ~30 min wall, dominated by the HOST-side env stepping
    on this 2-CPU machine while the chip idles between search dispatches)."""
    import os
    import re

    runs = os.path.join(os.path.dirname(__file__), "runs")
    log = next((p for p in (os.path.join(runs, "atari_gmz_r5_b128", "Training.log"),
                            os.path.join(runs, "atari_gmz_r4_b128.log"),
                            os.path.join(runs, "atari_gmz_r3_b128.log"))
                if os.path.exists(p)), None)
    if log is None:
        return {"skipped": "no atari run artifact"}
    text = open(log, errors="ignore").read()
    # env-steps = games x the ADJACENT [SelfPlay Game Lengths] avg, not a
    # hardcoded sequence length: iterations can emit shorter terminal chunks
    # (advisor r4: the 215-move hardcode inflated a 10-move iteration 21x)
    sp = re.findall(
        r"\[Iteration\] (\d+): self-play (\d+) games in ([\d.]+)s.*?"
        r"\[SelfPlay Game Lengths\][^\n]*avg: ([\d.]+)",
        text, re.S)
    opt = re.findall(r"\[Optimization\] iteration \d+: (\d+) steps in ([\d.]+)s", text)
    if not sp or not opt:
        return {"skipped": "run log incomplete"}
    # iteration 1 includes jit compile; prefer steady-state iterations
    rows = [r for r in sp if int(r[0]) > 1] or sp
    steps = sum(int(g) * float(avg) for _, g, _, avg in rows)
    secs = sum(float(s) for _, _, s, _ in rows)
    o_rows = opt[1:] or opt
    return {
        "selfplay_env_steps_per_s": round(steps / max(secs, 1e-9), 1),
        "optimize_steps_per_s": round(
            sum(int(n) for n, _ in o_rows) / max(sum(float(s) for _, s in o_rows), 1e-9), 2),
        "iterations_averaged": len(rows),
        "note": "host-env (FakeALE) on 2 CPUs; measured by the run "
                "(iteration 1 excluded: includes compile), "
                f"see {os.path.relpath(log, os.path.dirname(__file__))}",
    }


def _az200_production_from_run() -> dict:
    """az n=200 throughput measured by the LIVE training run's own
    [SelfPlay Timing] lines (runs/go9_az200_r3b.launch.log): chunks x 8
    moves x 1024 slots over the collect wall — steady-state production
    numbers on the run's own trained weights."""
    import os
    import re

    log = os.path.join(os.path.dirname(__file__), "runs", "go9_az200_r3b.launch.log")
    if not os.path.exists(log):
        return {"skipped": "no az200 run log"}
    rows = re.findall(
        r"\[SelfPlay Timing\] chunks: (\d+) x (\d+) moves, dispatch: [\d.]+s, "
        r"collect: ([\d.]+)s", open(log, errors="ignore").read())
    if len(rows) < 5:
        return {"skipped": "az200 run log too short"}
    rows = rows[-20:]  # steady state
    steps = sum(int(c) * int(m) * 1024 for c, m, _ in rows)
    secs = sum(float(s) for _, _, s in rows)
    return {
        "env_steps_per_s": round(steps / max(secs, 1e-9), 1),
        "batch_games": 1024,
        "iterations_averaged": len(rows),
        "vs_reference_cpu_worker_n200": round(steps / secs / 5.12, 1),
        "vs_reference_gpu_worker_est_n200": round(steps / secs / 78.5, 1),
        "note": "measured by the live go9_az200_r3b training run (az-trained "
                "weights; the synthetic bench below uses the same ckpt)",
    }


def _trace_top_ops(engine, variables, states, rng) -> list:
    """Per-op device time for one gaz chunk via jax.profiler
    (tools/trace_report.py) — the regression-grade signal next to the
    wall-clock headline (tunnel RTT makes wall noisy, CLAUDE.md)."""
    import tempfile

    from minizero_tpu.tools.trace_report import aggregate

    trace_dir = tempfile.mkdtemp(prefix="bench_trace_")
    with jax.profiler.trace(trace_dir):
        rng, k = jax.random.split(rng)
        _, states, _, _ = engine.move_scan(variables, states, k, 1.0, 4)
        jax.block_until_ready(jax.tree_util.tree_leaves(states)[0])
    rows, total_ps = aggregate(trace_dir, by="op")
    total = float(total_ps) or 1.0
    src_rows, src_total = aggregate(trace_dir, by="source")
    src_total = float(src_total) or 1.0
    return {
        "top_ops": [
            {"op": r[0][:48], "ms": round(r[1] / 1e9, 3),
             "pct": round(100.0 * r[1] / total, 1)}
            for r in rows[:5]
        ],
        # source-line attribution for the opaque while-loops (VERDICT r4
        # weak #3: 25% of gaz device time was two unnamed loops)
        "top_sources": [
            {"source": r[0][-80:], "pct": round(100.0 * r[1] / src_total, 1)}
            for r in src_rows[:8]
        ],
    }


def main(batch_size: int = 1024, measure_moves: int = 12) -> None:
    # round-1 sweep on the real chip: 512 -> 2992, 1024 -> 3790,
    # 2048 -> 3884 env-steps/s; 1024 is the knee (2048 costs 2x latency
    # for +2.5%)
    from minizero_tpu.config import algorithm_preset, default_config
    from minizero_tpu.envs import make_env
    from minizero_tpu.models.factory import create_network, init_network
    from minizero_tpu.selfplay.engine import SelfPlayEngine

    cfg = default_config("go", **algorithm_preset("gaz"))
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    variables = init_network(net, env.spec, jax.random.PRNGKey(0))
    engine = SelfPlayEngine(env, cfg, net)

    states = engine.init_batch(batch_size)
    rng = jax.random.PRNGKey(0)

    # warmup / compile (move_scan = the collection loop's real dispatch unit:
    # M moves + in-scan resets per device call)
    rng, k = jax.random.split(rng)
    _, states, enable, msr = engine.move_scan(variables, states, k, 1.0, measure_moves)
    jax.block_until_ready(jax.tree_util.tree_leaves(states)[0])

    chunks = 3
    t0 = time.perf_counter()
    for _ in range(chunks):
        rng, k = jax.random.split(rng)
        _, states, enable, msr = engine.move_scan(
            variables, states, k, 1.0, measure_moves, enable, msr)
    jax.block_until_ready(jax.tree_util.tree_leaves(states)[0])
    dt = time.perf_counter() - t0
    measure_moves *= chunks

    env_steps_per_s = batch_size * measure_moves / dt
    sims_per_s = env_steps_per_s * (cfg.actor_num_simulation + 1)
    games_per_hour = env_steps_per_s / 110.0 * 3600.0  # ~110 moves per 9x9 game

    def emit(extras):
        print(
            json.dumps(
                {
                    "metric": "selfplay_env_steps_per_s_go9_gaz_1chip",
                    "value": round(env_steps_per_s, 1),
                    "unit": "env-steps/s",
                    "vs_baseline": round(env_steps_per_s / REFERENCE_ENV_STEPS_PER_S, 3),
                    "detail": {
                        "batch_games": batch_size,
                        "moves_timed": measure_moves,
                        "seconds": round(dt, 3),
                        "mcts_sims_per_s": round(sims_per_s, 1),
                        "est_games_per_hour": round(games_per_hour, 1),
                        "device": str(jax.devices()[0]),
                        **extras,
                    },
                }
            ),
            flush=True,
        )

    # emit the headline IMMEDIATELY: the extras below compile several big
    # shapes (az n=200, mz n=50) which on a cold cache can exceed the
    # driver's patience over the tunnel — a hang there must not cost the
    # primary metric. A second line with extras follows; take the last line.
    emit({"extras": "pending"})

    # secondary reference-headline configs + per-op device attribution
    # (VERDICT r1 #2/#3); each guarded so a failure can't kill the headline
    extras = {}
    for key, fn in (
        ("az200_production_run_measured", _az200_production_from_run),
        ("az200_trained", lambda: _bench_az200(trained=True)),
        ("az200_random_init", lambda: _bench_az200(trained=False)),
        ("mz50_atari_search", _bench_mz50_search),
        ("atari_gmz_e2e_run_measured", _atari_e2e_from_run),
        ("gaz_top_ops_device_time",
         lambda: _trace_top_ops(engine, variables, states, rng)),
    ):
        try:
            extras[key] = fn()
        except Exception as e:  # noqa: BLE001
            extras[key] = {"error": f"{type(e).__name__}: {e}"[:200]}

    emit(extras)


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    main(batch_size=bs)
