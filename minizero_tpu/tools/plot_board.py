"""Board position renders (reference ``tools/plot_board.py``): matplotlib
images of go/othello/hex-family positions from record files."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from minizero_tpu.selfplay.record import parse_game


def board_from_record(content: str, env_name: Optional[str] = None, move_limit: Optional[int] = None):
    """Replay a record's actions into the named env; returns (env, state)."""
    import jax.numpy as jnp

    from minizero_tpu.config import default_config
    from minizero_tpu.envs import make_env

    tags, moves = parse_game(content, action_size=1 << 20)
    name = env_name or tags.get("GM", "go").split("_")[0]
    size = int(tags.get("SZ", 0) or 0)
    cfg = default_config(name)
    if size:
        cfg = cfg.replace(env_board_size=size)
    env = make_env(cfg)
    state = env.init()
    for mv in moves[: move_limit if move_limit is not None else len(moves)]:
        state = env.step(state, jnp.int32(int(mv["action"])))
    return env, state


def plot_board(env, state, out_path: str, title: str = "") -> str:
    """Stone-diagram PNG for square-board envs."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = env.spec.board_size
    board = np.asarray(state.board).reshape(-1)[: n * n].reshape(n, n)
    fig, ax = plt.subplots(figsize=(n / 2 + 1, n / 2 + 1))
    ax.set_facecolor("#deb06f")
    for i in range(n):
        ax.plot([0, n - 1], [i, i], color="k", lw=0.5, zorder=1)
        ax.plot([i, i], [0, n - 1], color="k", lw=0.5, zorder=1)
    for r in range(n):
        for c in range(n):
            v = int(board[r, c])
            if v == 1:
                ax.scatter(c, r, s=220, c="black", zorder=2)
            elif v == 2:
                ax.scatter(c, r, s=220, c="white", edgecolors="black", zorder=2)
            elif v == 3:
                ax.scatter(c, r, s=150, c="red", marker="x", zorder=2)
    ax.set_xlim(-0.7, n - 0.3)
    ax.set_ylim(-0.7, n - 0.3)
    ax.set_xticks(range(n))
    ax.set_xticklabels(chr(ord("A") + c + (1 if c >= 8 else 0)) for c in range(n))
    ax.set_yticks(range(n))
    ax.set_yticklabels(str(r + 1) for r in range(n))
    ax.set_aspect("equal")
    if title:
        ax.set_title(title)
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return out_path


if __name__ == "__main__":
    import sys

    with open(sys.argv[1]) as f:
        first = f.readline().strip()
    env, state = board_from_record(first)
    print(plot_board(env, state, sys.argv[2] if len(sys.argv) > 2 else "board.png"))
