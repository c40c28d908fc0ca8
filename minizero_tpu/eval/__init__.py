from minizero_tpu.eval.match import MatchResult, elo_from_win_rate, play_match  # noqa: F401
