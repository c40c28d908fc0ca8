"""Cross-framework head-to-head, fight stage (VERDICT r3 #8).

Loads the reference-pipeline-trained tictactoe AlphaZero net (converted via
convert_ref_weights, forward-parity-checked against its own TorchScript
module) and the minizero_tpu-trained net from the SAME abbreviated recipe,
then plays them against each other through ONE engine (eval/match.play_match:
argmax-count, noise off, colours balanced) so the search is held constant and
the match measures what the two TRAINING PIPELINES learned.

    python refbench/cross_fight.py [games] [opening_random_plies]
"""
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from convert_ref_weights import load_ref_pkl, verify_forward  # noqa: E402


def main(games=400, opening_plies=2):
    from minizero_tpu.config import default_config
    from minizero_tpu.envs import make_env
    from minizero_tpu.eval.match import (
        elo_from_win_rate, load_checkpoint_variables, play_match)
    from minizero_tpu.models.factory import create_network

    here = os.path.dirname(os.path.abspath(__file__))
    ref_dir = os.path.join(here, "xtrain", "ref_ttt_az", "model")
    tpu_dir = os.path.join(here, "xtrain", "tpu_ttt_az", "model")
    ref_pkl = max(glob.glob(os.path.join(ref_dir, "weight_iter_*.pkl")),
                  key=lambda p: int(re.search(r"(\d+)", os.path.basename(p)).group(1)))
    tpu_ckpt = max(glob.glob(os.path.join(tpu_dir, "weight_iter_*.ckpt")),
                   key=lambda p: int(re.search(r"(\d+)", os.path.basename(p)).group(1)))

    cfg = default_config(
        "tictactoe", actor_num_simulation=16, nn_num_blocks=1,
        nn_num_hidden_channels=64, nn_num_value_hidden_channels=64,
        zero_num_parallel_games=min(games, 128),
    )
    env = make_env(cfg)
    net = create_network(cfg, env.spec)

    ref_vars, ref_step = load_ref_pkl(ref_pkl, cfg.nn_num_blocks, 3, 3)
    dp, dv = verify_forward(ref_pkl.replace(".pkl", ".pt"), ref_vars, net, env.spec)
    tpu_vars = load_checkpoint_variables(tpu_ckpt, cfg, net, env.spec)

    r = play_match(cfg, ref_vars, tpu_vars, num_games=games, seed=77,
                   opening_random_plies=opening_plies)

    # context baselines: both trained nets must beat an untrained net at the
    # same protocol, else "even" would just mean "neither learned"
    from minizero_tpu.models.factory import init_network

    init_vars = init_network(net, env.spec, jax.random.PRNGKey(123))
    b = min(games, 200)
    r_ref_init = play_match(cfg, ref_vars, init_vars, num_games=b, seed=78,
                            opening_random_plies=opening_plies)
    r_tpu_init = play_match(cfg, tpu_vars, init_vars, num_games=b, seed=79,
                            opening_random_plies=opening_plies)
    out = {
        "metric": "cross_framework_ttt_az_head_to_head",
        "reference_trained": os.path.basename(ref_pkl),
        "reference_steps": ref_step,
        "minizero_tpu_trained": os.path.basename(tpu_ckpt),
        "conversion_forward_parity": {"policy_logit": dp, "value": dv},
        "protocol": {"num_simulation": 16, "eval_mode": True,
                     "opening_random_plies": opening_plies, "games": games},
        "reference_wins": r.p1_wins, "minizero_tpu_wins": r.p2_wins,
        "draws": r.draws,
        "reference_win_rate": round(r.p1_win_rate, 4),
        "elo_diff_ref_minus_tpu": round(elo_from_win_rate(r.p1_win_rate), 1),
        "baselines_vs_untrained": {
            "reference_trained": f"{r_ref_init.p1_wins}W/{r_ref_init.p2_wins}L/{r_ref_init.draws}D",
            "minizero_tpu_trained": f"{r_tpu_init.p1_wins}W/{r_tpu_init.p2_wins}L/{r_tpu_init.draws}D",
        },
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(here, "xtrain", "head_to_head.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
