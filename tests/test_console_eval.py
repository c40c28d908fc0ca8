"""GTP console, CLI mode dispatch, and eval-match tests."""

import io
import os

import jax
import numpy as np
import pytest

from minizero_tpu.config import algorithm_preset, default_config
from minizero_tpu.console.gtp import GTPConsole, action_to_gtp, gtp_to_action

_TINY = dict(
    actor_num_simulation=4,
    actor_gumbel_sample_size=4,
    nn_num_blocks=1,
    nn_num_hidden_channels=8,
    nn_num_value_hidden_channels=8,
)


def _console(env="tictactoe", **over):
    cfg = default_config(env, **{**_TINY, **over})
    out = io.StringIO()
    return GTPConsole(cfg, out=out), out


def test_gtp_coordinates():
    assert action_to_gtp(0, 9, True) == "A1"
    assert action_to_gtp(8, 9, True) == "J1"  # I skipped
    assert action_to_gtp(81, 9, True) == "PASS"
    assert gtp_to_action("A1", 9) == 0
    assert gtp_to_action("J1", 9) == 8
    assert gtp_to_action("pass", 9) == 81
    assert gtp_to_action("D4", 9) == 3 * 9 + 3
    # round trip all points
    for a in range(81):
        assert gtp_to_action(action_to_gtp(a, 9, True), 9) == a


def test_console_basic_commands():
    console, out = _console()
    console.execute("name")
    console.execute("protocol_version")
    console.execute("list_commands")
    text = out.getvalue()
    assert "= minizero_tpu" in text
    assert "= 2" in text
    assert "genmove" in text


def test_console_play_and_genmove():
    console, out = _console()
    console.execute("play b A1")
    console.execute("genmove w")
    console.execute("showboard")
    console.execute("final_score")
    text = out.getvalue()
    assert text.count("=") >= 4
    assert "?" not in text.split("\n")[0]
    # board shows the played stone
    assert "O" in text


def test_console_invalid_play():
    console, out = _console()
    console.execute("play b A1")
    console.execute("play w A1")  # occupied
    assert "Invalid action" in out.getvalue()


def test_console_pv():
    console, out = _console()
    console.execute("pv")
    assert "%" in out.getvalue()


def test_console_command_id_and_unknown():
    console, out = _console()
    console.execute("7 name")
    console.execute("bogus_cmd")
    text = out.getvalue()
    assert "=7 minizero_tpu" in text
    assert "? Unknown command" in text


def test_training_name():
    from minizero_tpu.__main__ import training_name

    cfg = default_config("go", **algorithm_preset("gaz"))
    name = training_name(cfg)
    assert name == "go_9x9_gaz_1bx256_n16"


def test_env_test_mode_runs():
    from minizero_tpu.__main__ import run_env_test

    run_env_test(default_config("tictactoe"))
    run_env_test(default_config("othello", env_board_size=4))


def test_eval_match_and_elo():
    from minizero_tpu.eval.match import elo_from_win_rate, play_match
    from minizero_tpu.envs import make_env
    from minizero_tpu.models.factory import create_network, init_network

    assert elo_from_win_rate(0.5) == 0.0
    assert elo_from_win_rate(0.64) == pytest.approx(100, abs=2)

    cfg = default_config("tictactoe", **_TINY, zero_num_parallel_games=4)
    env = make_env(cfg)
    net = create_network(cfg, env.spec)
    va = init_network(net, env.spec, jax.random.PRNGKey(0))
    vb = init_network(net, env.spec, jax.random.PRNGKey(1))
    r = play_match(cfg, va, vb, num_games=8, seed=0)
    assert r.games == 8
    assert 0.0 <= r.p1_win_rate <= 1.0

    # colour balance: an engine-vs-ITSELF match must come out exactly even
    # once wins are colour-paired (regression: per-round alternation gave
    # one net 2/3 of the blacks when num_games <= batch). Rotation off so
    # searches are deterministic and the A-as-P1/A-as-P2 rounds mirror.
    cfg_det = cfg.replace(actor_use_random_rotation_features=False)
    r2 = play_match(cfg_det, va, va, num_games=8, seed=3, opening_random_plies=2)
    assert r2.games == 8
    assert r2.p1_wins == r2.p2_wins, f"self-match must be colour-symmetric: {r2}"


def test_cli_gen_config(tmp_path):
    from minizero_tpu.__main__ import main

    out = tmp_path / "test.cfg"
    assert main(["-mode", "env_test", "-conf_str", "env_name=tictactoe", "-gen", str(out)]) == 0
    text = out.read_text()
    assert "env_name=tictactoe" in text
    assert "# Actor" in text


def test_console_load_game(tmp_path):
    """load_game replays a record file into the console env (reference
    cmdLoadGame)."""
    rec = tmp_path / "game.sgf"
    rec.write_text("(;GM[tictactoe]RE[0]SZ[3];B[4]P[4:1]V[0]R[0];W[0]P[0:1]V[0]R[0])\n")
    console, out = _console()
    console.execute(f"load_game {rec}")
    console.execute("game_string")
    text = out.getvalue()
    assert "?" not in text.splitlines()[0]
    assert "B[4]" in text and "W[0]" in text
    # bad path fails cleanly
    console2, out2 = _console()
    console2.execute("load_game /nonexistent/file.sgf")
    assert out2.getvalue().startswith("?")


def test_console_tree_string():
    console, out = _console()
    console.execute("play b A1")
    console.execute("tree_string")
    text = out.getvalue()
    # SGF-style nesting with root + at least one visited child
    assert "[root]C[count:" in text
    assert text.count("(;") >= 2, text[-500:]
