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
    ACTION_OFFSET, GAME_DIMS, MZ_BIN_MOD, MZ_DISCRETE_SIZE,
    MZ_HIDDEN_CHANNELS, MZ_MOD, MZ_POLICY_SCALE, MZ_VALUE_SCALE,
    POLICY_SCALE, VALUE_CLAMP, VALUE_SCALE, muzero_parity_weights,
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


class MuZeroParityNet(torch.nn.Module):
    """MuZero twin of tests/parity_common.py jax_muzero_parity_network.

    TorchScript contract: reference muzero_network.h loadModel/forward —
    ``initial_inference(state)`` and ``recurrent_inference(hidden, action)``
    exported methods returning {policy_logit, policy, value, hidden_state
    [, reward]}, plus get_num_action_feature_channels metadata. All
    exchanged tensors are integer-valued f32 (see muzero_parity_weights)
    so the torch NCHW matmuls and the jax canonical einsums are bitwise
    equal.
    """

    def __init__(self, game: str, atari_mode: bool):
        super().__init__()
        from tests.parity_common import ACTION_FEATURE_CHANNELS, HIDDEN_DIMS

        c, h, w, a = GAME_DIMS[game]
        hh, wh = HIDDEN_DIMS.get(game, (h, w))
        ca = ACTION_FEATURE_CHANNELS.get(game, 1)
        m = int(MZ_HIDDEN_CHANNELS)
        k = m * hh * wh
        ws = muzero_parity_weights(game)
        self.game_name = game
        self.atari_mode = atari_mode
        self.is_atari_game = game == "atari"
        self.c, self.h, self.w, self.a, self.m, self.k = c, h, w, a, m, k
        self.hh, self.wh, self.ca = hh, wh, ca
        self.mod: float = float(MZ_MOD)
        self.dsize: int = int(MZ_DISCRETE_SIZE)
        self.policy_scale: float = float(MZ_POLICY_SCALE)
        self.value_scale: float = float(MZ_VALUE_SCALE)
        self.value_clamp: float = float(VALUE_CLAMP)
        self.bin_mod: float = float(MZ_BIN_MOD)
        t = lambda x, shape: torch.tensor(  # noqa: E731
            x, dtype=torch.float32).reshape(shape)
        if self.is_atari_game:
            # pixel-gather representation (see muzero_parity_weights)
            self.register_buffer("Ridx", torch.tensor(ws["Ridx"], dtype=torch.long))
            self.register_buffer("Wr", torch.zeros(1))
        else:
            self.register_buffer("Wr", t(ws["Wr"], (c * h * w, k)))
            self.register_buffer("Ridx", torch.zeros(1, dtype=torch.long))
        self.register_buffer("Wd", t(ws["Wd"], (k, k)))
        self.register_buffer("Wa", t(ws["Wa"], (ca * hh * wh, k)))
        self.register_buffer("Wp", t(ws["Wp"], (k, a)))
        self.register_buffer("Wv", t(ws["Wv"], (k,)))
        self.register_buffer("Wvd", t(ws["Wvd"], (k,)))
        self.register_buffer("Wrd", t(ws["Wrd"], (k,)))
        self.register_buffer("offs", torch.arange(a, dtype=torch.float32) * ACTION_OFFSET)

    def _mod16(self, t):
        return t - self.mod * torch.floor(t / self.mod)

    def _mod_d(self, t):
        # power-of-2 modulus: exact under every backend (see MZ_BIN_MOD)
        b = t - self.bin_mod * torch.floor(t / self.bin_mod)
        return torch.clamp(b, 0.0, float(self.dsize) - 1.0).to(torch.int64)

    def _predict(self, hidden):
        logits = torch.matmul(hidden, self.Wp) / self.policy_scale + self.offs
        if self.atari_mode:
            bins = self._mod_d(torch.matmul(hidden, self.Wvd))
            value = torch.nn.functional.one_hot(bins, self.dsize).to(torch.float32)
        else:
            value = torch.clamp(torch.matmul(hidden, self.Wv) / self.value_scale,
                                -self.value_clamp, self.value_clamp).unsqueeze(1)
        return logits, value

    @torch.jit.export
    def initial_inference(self, state):
        x = state.reshape(state.shape[0], self.c * self.h * self.w)
        if self.is_atari_game:
            hidden = self._mod16(torch.round(x[:, self.Ridx] * 255.0))
        else:
            hidden = self._mod16(torch.matmul(x, self.Wr))
        logits, value = self._predict(hidden)
        return {
            "policy_logit": logits,
            "policy": torch.softmax(logits, dim=1),
            "value": value,
            "hidden_state": hidden.reshape(hidden.shape[0], self.m, self.hh, self.wh),
        }

    @torch.jit.export
    def recurrent_inference(self, hidden_state, action_plane):
        hflat = hidden_state.reshape(hidden_state.shape[0], self.k)
        aflat = action_plane.reshape(action_plane.shape[0], self.ca * self.hh * self.wh)
        hidden = self._mod16(torch.matmul(hflat, self.Wd) + torch.matmul(aflat, self.Wa))
        logits, value = self._predict(hidden)
        out = {
            "policy_logit": logits,
            "policy": torch.softmax(logits, dim=1),
            "value": value,
            "hidden_state": hidden.reshape(hidden.shape[0], self.m, self.hh, self.wh),
        }
        if self.atari_mode:
            bins = self._mod_d(torch.matmul(hidden, self.Wrd))
            out["reward"] = torch.nn.functional.one_hot(bins, self.dsize).to(torch.float32)
        return out

    def forward(self, state):
        return self.initial_inference(state)

    @torch.jit.export
    def get_type_name(self):
        return "muzero_atari" if self.atari_mode else "muzero"

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
        return self.m

    @torch.jit.export
    def get_hidden_channel_height(self):
        return self.hh

    @torch.jit.export
    def get_hidden_channel_width(self):
        return self.wh

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
        return self.dsize if self.atari_mode else 1

    @torch.jit.export
    def get_num_action_feature_channels(self):
        return self.ca


def main():
    out = sys.argv[1]
    game = sys.argv[2]
    kind = sys.argv[3] if len(sys.argv) > 3 else "alphazero"
    if kind == "alphazero":
        net = ParityNet(game)
    elif kind in ("muzero", "muzero_atari"):
        net = MuZeroParityNet(game, atari_mode=(kind == "muzero_atari"))
    else:
        raise SystemExit(f"unknown net kind {kind!r}")
    net.eval()
    torch.jit.script(net).save(out)
    print(f"wrote {out} (parity net, {game}, {kind})")


if __name__ == "__main__":
    main()
