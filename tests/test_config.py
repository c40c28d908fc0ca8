from minizero_tpu.config import Config, default_config


def test_defaults_match_reference():
    # reference configuration.cpp:7-90 compiled defaults
    cfg = Config()
    assert cfg.actor_num_simulation == 50
    assert cfg.actor_mcts_puct_base == 19652.0
    assert cfg.actor_mcts_puct_init == 1.25
    assert cfg.learner_batch_size == 1024
    assert cfg.learner_learning_rate == 0.02
    assert cfg.zero_num_games_per_iteration == 2000
    assert cfg.nn_type_name == "alphazero"
    assert cfg.actor_select_action_by_softmax_count is True


def test_conf_str_roundtrip():
    cfg = Config().load_string("actor_num_simulation=16:actor_use_gumbel=true:env_go_komi=6.5")
    assert cfg.actor_num_simulation == 16
    assert cfg.actor_use_gumbel is True
    assert cfg.env_go_komi == 6.5


def test_cfg_file_roundtrip(tmp_path):
    cfg = Config().replace(actor_num_simulation=123, actor_use_gumbel=True)
    path = tmp_path / "test.cfg"
    cfg.save_file(str(path))
    cfg2 = Config().load_file(str(path))
    assert cfg2 == cfg


def test_env_defaults():
    cfg = default_config("tictactoe")
    assert cfg.env_board_size == 3
    assert cfg.env_name == "tictactoe"


def test_hashable():
    assert hash(Config()) == hash(Config())
    assert Config() == Config()
    assert Config().replace(actor_num_simulation=1) != Config()
