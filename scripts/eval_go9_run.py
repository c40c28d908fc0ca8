"""Ladder eval of a Go9 training run: latest vs mid vs initial weights.

Plays head-to-head matches (alternating colours, eval mode: argmax count,
no noise) between checkpoints of a run directory and prints win rates +
Elo gaps (reference tools/eval.py scoring).

    python scripts/eval_go9_run.py <run_dir> [games_per_pair]
"""
import glob, json, os, re, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main(run_dir, games=96):
    from minizero_tpu.config import default_config
    from minizero_tpu.envs import make_env
    from minizero_tpu.eval.match import (
        elo_from_win_rate, load_checkpoint_variables, play_match)
    from minizero_tpu.models.factory import create_network, init_network

    ckpts = sorted(
        glob.glob(os.path.join(run_dir, "model", "weight_iter_*.ckpt")),
        key=lambda p: int(re.search(r"(\d+)", os.path.basename(p)).group(1)))
    assert ckpts, f"no checkpoints in {run_dir}"
    import pickle
    with open(ckpts[-1], "rb") as f:
        conf_text = pickle.load(f)["config"]
    pairs = []
    for line in conf_text.splitlines():
        line = line.split("#", 1)[0].strip()
        if line and "=" in line:
            pairs.append(line)
    cfg = default_config("go").load_string(":".join(pairs))
    cfg = cfg.replace(zero_num_parallel_games=min(games, 96))
    env = make_env(cfg)
    net = create_network(cfg, env.spec)

    points = {"init": None,
              "mid": ckpts[len(ckpts) // 2],
              "latest": ckpts[-1]}
    variables = {}
    for name, path in points.items():
        if path is None:
            variables[name] = init_network(net, env.spec, jax.random.PRNGKey(123))
        else:
            variables[name] = load_checkpoint_variables(path, cfg, net, env.spec)
        print(f"{name}: {os.path.basename(path) if path else 'random init'}",
              file=sys.stderr)

    for a, b in [("latest", "init"), ("latest", "mid"), ("mid", "init")]:
        r = play_match(cfg, variables[a], variables[b], num_games=games, seed=7)
        print(json.dumps({
            "pair": f"{a} vs {b}", "games": r.games,
            "wins": r.p1_wins, "losses": r.p2_wins, "draws": r.draws,
            "win_rate": round(r.p1_win_rate, 4),
            "elo_gap": round(elo_from_win_rate(r.p1_win_rate), 1),
        }), flush=True)


if __name__ == "__main__":
    rd = sys.argv[1] if len(sys.argv) > 1 else "runs/go9_gaz_r1"
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    main(rd, g)
