import sys, os, glob, pickle, re, time
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
from minizero_tpu.config import default_config
from minizero_tpu.envs import make_env
from minizero_tpu.eval.match import elo_from_win_rate, load_checkpoint_variables, play_match
from minizero_tpu.models.factory import create_network

run_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_REPO, "runs", "go9_gmz_r4")
ck_new = os.path.join(run_dir, "model", "weight_iter_25000.ckpt")
ck_old = os.path.join(run_dir, "model", "weight_iter_0.ckpt")
conf_text = pickle.load(open(ck_new, "rb"))["config"]
kv = [ln.split("#", 1)[0].strip() for ln in conf_text.splitlines()]
kv = [p for p in kv if p and "=" in p]
env_name = next(p.split("=", 1)[1] for p in kv if p.startswith("env_name="))
cfg = default_config(env_name).load_string(":".join(kv))
cfg = cfg.replace(zero_num_parallel_games=96)
env = make_env(cfg)
net = create_network(cfg, env.spec)
va = load_checkpoint_variables(ck_new, cfg, net, env.spec)
vb = load_checkpoint_variables(ck_old, cfg, net, env.spec)
t0 = time.time()
r = play_match(cfg, va, vb, num_games=400, seed=424242, opening_random_plies=4)
print({"pair": "25000 vs 0", "wins": r.p1_wins, "losses": r.p2_wins,
       "draws": r.draws, "win_rate": round(r.p1_win_rate, 4),
       "elo": round(elo_from_win_rate(r.p1_win_rate), 1),
       "seconds": round(time.time() - t0, 1)})
