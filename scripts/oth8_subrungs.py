"""Decompose the oth8 n800 ladder's capped first rung (0 -> 5000 swept
200-0 -> +1000 cap) into two intermediate n800 pairs in ONE process so the
eval shapes compile once. Writes runs/oth8_gaz_r5/subrungs_n800.json."""
import json
import os
import pickle
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from minizero_tpu.config import default_config  # noqa: E402
from minizero_tpu.envs import make_env  # noqa: E402
from minizero_tpu.eval.match import (  # noqa: E402
    elo_from_win_rate,
    load_checkpoint_variables,
    play_match,
)
from minizero_tpu.models.factory import create_network  # noqa: E402

run_dir = os.path.join(_REPO, "runs", "oth8_gaz_r5")
conf_text = pickle.load(open(os.path.join(run_dir, "model", "weight_iter_0.ckpt"), "rb"))["config"]
kv = [ln.split("#", 1)[0].strip() for ln in conf_text.splitlines()]
kv = [p for p in kv if p and "=" in p]
cfg = default_config("othello").load_string(":".join(kv))
cfg = cfg.load_string(
    "actor_num_simulation=800:actor_select_action_by_count=true:"
    "actor_select_action_by_softmax_count=false:actor_use_dirichlet_noise=false:"
    "actor_use_gumbel_noise=false")
cfg = cfg.replace(zero_num_parallel_games=96)
env = make_env(cfg)
net = create_network(cfg, env.spec)

out = []
for a, b in [(2500, 0), (5000, 2500)]:
    va = load_checkpoint_variables(
        os.path.join(run_dir, "model", f"weight_iter_{a}.ckpt"), cfg, net, env.spec)
    vb = load_checkpoint_variables(
        os.path.join(run_dir, "model", f"weight_iter_{b}.ckpt"), cfg, net, env.spec)
    t0 = time.time()
    r = play_match(cfg, va, vb, num_games=200, seed=31000 + a)
    out.append({"pair": f"{a} vs {b}", "wins": r.p1_wins, "losses": r.p2_wins,
                "draws": r.draws, "win_rate": round(r.p1_win_rate, 4),
                "elo": round(elo_from_win_rate(r.p1_win_rate), 1),
                "seconds": round(time.time() - t0, 1)})
    print(out[-1], flush=True)
json.dump({"protocol": "n800 argmax noise-free, 200 games", "pairs": out},
          open(os.path.join(run_dir, "subrungs_n800.json"), "w"), indent=1)
