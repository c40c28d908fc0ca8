"""Elo curve: sequential checkpoint ladder + overlay vs the reference's
published figures (VERDICT r1 item #3). Go 9x9 and Othello 8x8.

Ladders checkpoint i vs i+interval through the run (reference
tools/self-eval.sh protocol: alternating colours, argmax-count, noise off,
Elo accumulation capped +/-1000 per match like tools/eval.py compute_elo),
then plots accumulated Elo over training steps against the reference's
curves digitized from docs/imgs/minizero_go_9x9.svg
(refbench/ref_go9_elo_curves.json).

    python scripts/elo_curve.py <run_dir> [interval_iters] [games_per_pair] \
        [conf_override] [out_suffix]

``conf_override`` lets the ladder run at the reference's strength-
measurement protocol (README.md:203): pass
"actor_num_simulation=800:actor_select_action_by_count=true:\
actor_select_action_by_softmax_count=false:actor_use_dirichlet_noise=false:\
actor_use_gumbel_noise=false" and e.g. out_suffix "_n800" to write
elo_curve_n800.json / elo_curve_vs_reference_n800.png alongside the
training-sims ladder.
"""
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
# env vars cannot override the baked axon platform config — this can
if os.environ.get("MINIZERO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MINIZERO_PLATFORM"])


def main(run_dir, interval=10, games=96, conf_override="", out_suffix="", opening_plies=0):
    import pickle
    import time

    from minizero_tpu.config import default_config
    from minizero_tpu.envs import make_env
    from minizero_tpu.eval.match import (
        elo_from_win_rate, load_checkpoint_variables, play_match)
    from minizero_tpu.models.factory import create_network

    model_dir = os.path.join(run_dir, "model")
    ckpts = sorted(
        glob.glob(os.path.join(model_dir, "weight_iter_*.ckpt")),
        key=lambda p: int(re.search(r"(\d+)", os.path.basename(p)).group(1)))
    assert ckpts, f"no checkpoints in {run_dir}"
    with open(ckpts[-1], "rb") as f:
        conf_text = pickle.load(f)["config"]
    pairs = [ln.split("#", 1)[0].strip() for ln in conf_text.splitlines()]
    kv = [p for p in pairs if p and "=" in p]
    env_name = next(p.split("=", 1)[1] for p in kv if p.startswith("env_name="))
    cfg = default_config(env_name).load_string(":".join(kv))
    if conf_override:
        cfg = cfg.load_string(conf_override)
    cfg = cfg.replace(zero_num_parallel_games=min(games, 96))
    env = make_env(cfg)
    net = create_network(cfg, env.spec)

    steps_of = lambda p: int(re.search(r"(\d+)", os.path.basename(p)).group(1))
    sel = [c for c in ckpts if steps_of(c) % (interval * cfg.learner_training_step) == 0]
    print(f"ladder over {len(sel)} checkpoints (every {interval} iterations)")

    elo = 0.0
    points = [{"step": 0, "elo": 0.0}]
    results = []
    vb = load_checkpoint_variables(sel[0], cfg, net, env.spec)
    for i in range(1, len(sel)):
        va = load_checkpoint_variables(sel[i], cfg, net, env.spec)
        t0 = time.time()
        r = play_match(cfg, va, vb, num_games=games, seed=1000 + i,
                       opening_random_plies=opening_plies)
        gain = elo_from_win_rate(r.p1_win_rate)
        elo += gain
        points.append({"step": steps_of(sel[i]), "elo": round(elo, 1)})
        results.append({
            "new": os.path.basename(sel[i]), "old": os.path.basename(sel[i - 1]),
            "wins": r.p1_wins, "losses": r.p2_wins, "draws": r.draws,
            "win_rate": round(r.p1_win_rate, 4), "elo_gain": round(gain, 1),
            "elo": round(elo, 1), "seconds": round(time.time() - t0, 1),
        })
        print(results[-1], flush=True)
        vb = va

    out = {"run": run_dir, "interval_iters": interval, "games_per_pair": games,
           "opening_random_plies": opening_plies,
           # Effective eval protocol: play_match forces eval_mode=True
           # (argmax visit count, exploration noise off) regardless of the
           # training-config values, so record what actually ran.
           "protocol": {
               "num_simulation": cfg.actor_num_simulation,
               "eval_mode": True,
               "select_by_count": True,
               "noise": False,
               "conf_override": conf_override,
           },
           "points": points, "matches": results}
    with open(os.path.join(run_dir, f"elo_curve{out_suffix}.json"), "w") as f:
        json.dump(out, f, indent=1)

    # overlay vs reference curves
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ref_name = {"go": "ref_go9_elo_curves.json",
                "othello": "ref_oth8_elo_curves.json"}.get(cfg.env_name, "")
    ref_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "refbench", ref_name)
    fig, ax = plt.subplots(figsize=(8, 5))
    if ref_name and os.path.isfile(ref_path):
        ref = json.load(open(ref_path))["curves"]
        for name, pts in ref.items():
            style = dict(lw=2.2, alpha=0.9) if name == "g-az n=16" else dict(lw=1.0, alpha=0.35)
            ax.plot([p["step"] for p in pts], [p["elo"] for p in pts],
                    label=f"reference {name}", **style)
    ax.plot([p["step"] for p in points], [p["elo"] for p in points],
            "k-o", lw=2.2, ms=3, label=f"minizero_tpu this run ({cfg.env_name})")
    ax.set_xlabel("training steps")
    ax.set_ylabel("Elo (sequential self-ladder, +/-1000 cap)")
    proto = (f"n={cfg.actor_num_simulation} argmax noise-off, {games} games/pair"
             " (reference curves: 800-sim gogui-twogtp)")
    ax.set_title(f"{cfg.env_name} strength vs reference published curves\n{proto}",
                 fontsize=9)
    ax.legend(fontsize=7)
    ax.grid(alpha=0.3)
    png = os.path.join(run_dir, f"elo_curve_vs_reference{out_suffix}.png")
    fig.savefig(png, dpi=120, bbox_inches="tight")
    print("wrote", png)


if __name__ == "__main__":
    main(sys.argv[1],
         int(sys.argv[2]) if len(sys.argv) > 2 else 10,
         int(sys.argv[3]) if len(sys.argv) > 3 else 96,
         sys.argv[4] if len(sys.argv) > 4 else "",
         sys.argv[5] if len(sys.argv) > 5 else "",
         int(sys.argv[6]) if len(sys.argv) > 6 else 0)
