"""One reference-protocol evaluation pair between two checkpoints.

The reference publishes strength at n=800, argmax-count, noise-free
(README.md:203); round-4 left go9_gmz_r4 and go9_az200_r3b confirmed only
at their training-sims eval (VERDICT r4 weak #7). play_match already
forces eval_mode (argmax visit count, exploration noise off); this script
adds the n=800 search override and prints one JSON line.

    python scripts/n800_pair.py <run_dir> <iter_a> <iter_b> [games=200] \
        [sims=800] [opening_plies=4]
"""
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
if os.environ.get("MINIZERO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MINIZERO_PLATFORM"])


def main(run_dir, iter_a, iter_b, games=200, sims=800, opening_plies=4):
    from minizero_tpu.config import default_config
    from minizero_tpu.envs import make_env
    from minizero_tpu.eval.match import (
        elo_from_win_rate,
        load_checkpoint_variables,
        play_match,
    )
    from minizero_tpu.models.factory import create_network

    ck_a = os.path.join(run_dir, "model", f"weight_iter_{iter_a}.ckpt")
    ck_b = os.path.join(run_dir, "model", f"weight_iter_{iter_b}.ckpt")
    conf_text = pickle.load(open(ck_a, "rb"))["config"]
    kv = [ln.split("#", 1)[0].strip() for ln in conf_text.splitlines()]
    kv = [p for p in kv if p and "=" in p]
    env_name = next(p.split("=", 1)[1] for p in kv if p.startswith("env_name="))
    cfg = default_config(env_name).load_string(":".join(kv))
    cfg = cfg.replace(actor_num_simulation=int(sims),
                      zero_num_parallel_games=min(int(games), 96))
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    va = load_checkpoint_variables(ck_a, cfg, net, env.spec)
    vb = load_checkpoint_variables(ck_b, cfg, net, env.spec)
    t0 = time.time()
    r = play_match(cfg, va, vb, num_games=int(games), seed=77000 + int(iter_a),
                   opening_random_plies=int(opening_plies))
    print(json.dumps({
        "run": run_dir, "pair": f"{iter_a} vs {iter_b}",
        "protocol": {"num_simulation": int(sims), "eval_mode": True,
                     "select_by_count": True, "noise": False,
                     "opening_random_plies": int(opening_plies)},
        "wins": r.p1_wins, "losses": r.p2_wins, "draws": r.draws,
        "win_rate": round(r.p1_win_rate, 4),
        "elo": round(elo_from_win_rate(r.p1_win_rate), 1),
        "seconds": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], *sys.argv[4:])
