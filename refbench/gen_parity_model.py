"""Export the parity network (tests/parity_common.py) as a TorchScript
module the reference binary can load (metadata contract:
/root/reference/minizero/network/network.cpp loadModel get_* methods;
output dict contract: alphazero_network.h forward()).

    python refbench/gen_parity_model.py <out.pt> <game>
"""
import os
import sys

import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.parity_common import (  # noqa: E402
    ACTION_OFFSET, GAME_DIMS, POLICY_SCALE, VALUE_CLAMP, VALUE_SCALE,
    parity_weights)


class ParityNet(torch.nn.Module):
    def __init__(self, game: str):
        super().__init__()
        c, h, w, a = GAME_DIMS[game]
        wp, wv = parity_weights(game)
        self.game_name = game
        self.c, self.h, self.w, self.a = c, h, w, a
        self.policy_scale: float = float(POLICY_SCALE)
        self.value_scale: float = float(VALUE_SCALE)
        self.value_clamp: float = float(VALUE_CLAMP)
        # canonical [C,H,W,A] -> [C*H*W, A]; torch flattens NCHW input the
        # same channel-major way, so x_flat @ wp matches the jax einsum
        # bitwise (integer-exact f32 sums)
        self.register_buffer("wp", torch.tensor(wp, dtype=torch.float32).reshape(c * h * w, a))
        self.register_buffer("wv", torch.tensor(wv, dtype=torch.float32).reshape(c * h * w, 1))
        self.register_buffer("offs", torch.arange(a, dtype=torch.float32) * ACTION_OFFSET)

    def forward(self, state):
        x = state.reshape(state.shape[0], self.c * self.h * self.w)
        logits = torch.matmul(x, self.wp) / self.policy_scale + self.offs
        value = torch.clamp(torch.matmul(x, self.wv) / self.value_scale,
                            -self.value_clamp, self.value_clamp)
        return {
            "policy_logit": logits,
            "policy": torch.softmax(logits, dim=1),
            "value": value,
        }

    @torch.jit.export
    def get_type_name(self):
        return "alphazero"

    @torch.jit.export
    def get_game_name(self):
        return self.game_name

    @torch.jit.export
    def get_num_input_channels(self):
        return self.c

    @torch.jit.export
    def get_input_channel_height(self):
        return self.h

    @torch.jit.export
    def get_input_channel_width(self):
        return self.w

    @torch.jit.export
    def get_num_hidden_channels(self):
        return 1

    @torch.jit.export
    def get_hidden_channel_height(self):
        return self.h

    @torch.jit.export
    def get_hidden_channel_width(self):
        return self.w

    @torch.jit.export
    def get_num_blocks(self):
        return 0

    @torch.jit.export
    def get_action_size(self):
        return self.a

    @torch.jit.export
    def get_num_value_hidden_channels(self):
        return 1

    @torch.jit.export
    def get_discrete_value_size(self):
        return 1


def main():
    out = sys.argv[1]
    game = sys.argv[2]
    net = ParityNet(game)
    net.eval()
    torch.jit.script(net).save(out)
    print(f"wrote {out} (parity net, {game})")


if __name__ == "__main__":
    main()
