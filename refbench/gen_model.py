"""Generate an untrained reference TorchScript model for the CPU baseline
benchmark (refbench/main.cpp).

Imports the reference's own network definitions from
/root/reference/minizero/network/py (NOT copied into this repo) and saves a
TorchScript module exactly like the reference trainer does
(reference learner/train.py:127: ``torch.jit.script(net).save(...)``).

    python refbench/gen_model.py out.pt [game] [blocks] [channels]
"""
import importlib
import sys
import types

import torch

REF_PY = "/root/reference/minizero/network/py"


def load_ref_module(name):
    pkg = types.ModuleType("refpy")
    pkg.__path__ = [REF_PY]
    sys.modules.setdefault("refpy", pkg)
    return importlib.import_module(f"refpy.{name}")


GAME_DIMS = {
    # game: (in_channels, h, w, action_size)  — reference env feature specs
    "go": (18, 9, 9, 82),          # go.cpp:280-307, go.h:55 (9x9)
    "othello": (4, 8, 8, 65),      # othello 8x8
    "tictactoe": (4, 3, 3, 9),
}


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "refbench/go9_az_1bx256.pt"
    game = sys.argv[2] if len(sys.argv) > 2 else "go"
    blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    channels = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    in_ch, h, w, action_size = GAME_DIMS[game]

    az = load_ref_module("alphazero_network")
    net = az.AlphaZeroNetwork(
        game_name=game,
        num_input_channels=in_ch,
        input_channel_height=h,
        input_channel_width=w,
        num_hidden_channels=channels,
        hidden_channel_height=h,
        hidden_channel_width=w,
        num_blocks=blocks,
        action_size=action_size,
        num_value_hidden_channels=256,
        discrete_value_size=1,
    )
    net.eval()
    torch.jit.script(net).save(out)
    print(f"wrote {out} ({game} az {blocks}bx{channels})")


if __name__ == "__main__":
    main()
