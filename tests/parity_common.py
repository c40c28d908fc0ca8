"""Shared definitions for the reference-parity harness.

The parity harness (VERDICT round-1 item #1) compares this framework's
search against the REAL reference binary (rlglab/minizero, compiled in
place by ``refbench/build_parity.sh``) move-for-move under deterministic
settings. Both sides evaluate the SAME "parity network" — a linear
policy/value model whose arithmetic is *exactly* reproducible across
torch (NCHW, reference side) and jax (NHWC, this side):

  * weights are small integers; logits are sums of <= action_size*C*H*W
    integer terms, all partial sums < 2^24, so float32 summation is exact
    in ANY order (torch matmul vs jax einsum give bitwise-equal logits);
  * logits are divided by 8 and the value by 64 (exact power-of-two
    scaling), the value is clamped to +/-0.96875 (exactly representable);
  * only the softmax (priors) differs across libraries, by ~1 ulp, which
    cannot flip a PUCT argmax whose margins come from integer-separated
    logits.

This isolates MCTS/search semantics parity from conv-stack numerics.
The torch-side TorchScript export lives in ``refbench/gen_parity_model.py``
(imports this module); dumps are produced by ``refbench/parity_dump.cpp``
driving the reference's own ZeroActor + MCTS/GumbelZero + env classes.
"""

from __future__ import annotations

import numpy as np

# (in_channels, h, w, action_size) — reference env feature specs
# (go.cpp:280-307 → 18 planes; tictactoe.cpp:71-97 → 4 planes;
# atari.h:66-73 → 8-history x [action, R, G, B] = 32 planes @ 96x96)
GAME_DIMS = {
    "go": (18, 9, 9, 82),
    "tictactoe": (4, 3, 3, 9),
    "atari": (32, 96, 96, 18),
}
# MuZero hidden-state spatial dims where they differ from the input
# (atari.h kAtariHiddenChannelHeight/Width = 6)
HIDDEN_DIMS = {"atari": (6, 6)}
# MuZero action-feature channels (board: 1 one-hot plane; atari: 18
# channel-fill planes, atari.cpp getActionFeatures)
ACTION_FEATURE_CHANNELS = {"atari": 18}

POLICY_SCALE = 32.0  # logits = int_sum / 32 (soft enough that visits spread)
# --- MuZero parity net constants (see muzero_parity_weights) -------------
MZ_HIDDEN_CHANNELS = 4  # M: hidden state = [M, H, W] (torch) / [H, W, M] (jax)
MZ_MOD = 16.0  # hidden entries live in [0, 16): h = t - 16*floor(t/16), exact
MZ_POLICY_SCALE = 256.0  # logits = int_sum / 256 (hidden sums are larger)
MZ_VALUE_SCALE = 16384.0  # value = clamp(int_sum / 2^14)
MZ_DISCRETE_SIZE = 11  # atari-mode two-hot head size (bins -5..5)
# bin selector modulus MUST be a power of 2: t - m*floor(t/m) is exact for
# m=8, while m=11 hits XLA's reciprocal-multiply rewrite (floor(t*(1/11))
# loses exact multiples under jit -> different bins jit vs eager vs torch)
MZ_BIN_MOD = 8.0
# tiny exact per-action offset (a * 2^-16) added to every logit so that no
# two actions ever tie exactly: the reference sorts children with an
# UNSTABLE std::sort on policy (zero_actor.cpp:225-228), so exact-tie
# order — and hence tie-broken PUCT selection — is implementation-defined
# in the reference itself. Distinct logits make its behaviour (and ours)
# fully determined. |int_sum/32| < 2^4 and a*2^-16 < 2^-9 span 21 mantissa
# bits, so the sum stays exactly representable in float32 on both sides.
ACTION_OFFSET = 2.0 ** -16
VALUE_SCALE = 64.0  # value = clamp(int_sum / 64)
VALUE_CLAMP = 0.96875  # 31/32, exactly representable in f32


def parity_weights(game: str, seed: int = 20260820):
    """Deterministic integer weights, canonical layout.

    Returns (Wp[C, H, W, A] int8 in [-7, 7], Wv[C, H, W] int8 in [-3, 3]).
    """
    c, h, w, a = GAME_DIMS[game]
    rng = np.random.Generator(np.random.PCG64(seed + len(game) * 1009))
    wp = rng.integers(-7, 8, size=(c, h, w, a), dtype=np.int8)
    wv = rng.integers(-3, 4, size=(c, h, w), dtype=np.int8)
    return wp, wv


def jax_parity_network(game: str):
    """A Flax AlphaZeroNetwork-compatible parity net + its variables.

    Drop-in for ``SelfPlayEngine`` (duck-types ``models.alphazero.
    AlphaZeroNetwork``: ``apply(variables, feats_nhwc, train=False) ->
    {policy_logit, policy, value}``).
    """
    import jax.numpy as jnp
    from flax import linen as nn

    from minizero_tpu.models.alphazero import AlphaZeroNetwork

    c, h, w, a = GAME_DIMS[game]

    class ParityNet(AlphaZeroNetwork):
        @nn.compact
        def __call__(self, state, train: bool = False):
            wp = self.param("Wp", lambda k: jnp.zeros((c, h, w, a), jnp.float32))
            wv = self.param("Wv", lambda k: jnp.zeros((c, h, w), jnp.float32))
            x = state.astype(jnp.float32)
            # exact integer sums (< 2^24) -> /8, /64 exact
            logits = (jnp.einsum("bhwc,chwa->ba", x, wp) / POLICY_SCALE
                      + jnp.arange(a, dtype=jnp.float32) * ACTION_OFFSET)
            value = jnp.einsum("bhwc,chw->b", x, wv) / VALUE_SCALE
            value = jnp.clip(value, -VALUE_CLAMP, VALUE_CLAMP)
            return {
                "policy_logit": logits,
                "policy": nn.softmax(logits, axis=-1),
                "value": value[:, None],
            }

    net = ParityNet(
        num_input_channels=c, input_height=h, input_width=w,
        num_hidden_channels=1, hidden_height=h, hidden_width=w,
        num_blocks=0, action_size=a, num_value_hidden_channels=1,
        discrete_value_size=1,
    )
    wp, wv = parity_weights(game)
    variables = {"params": {
        "Wp": jnp.asarray(wp, jnp.float32),
        "Wv": jnp.asarray(wv, jnp.float32),
    }}
    return net, variables


class ParityFakeALE:
    """numpy twin of refbench/stub_include/ale_interface.hpp.

    Screens/rewards/lives are uint32-hash functions of (seed, frame
    [, action]); screens are emitted at 96x96 so both sides' resize is the
    identity. Plug into ``envs.atari.AtariEnv`` via ``ale_factory``."""

    RES = 96
    EPISODE_FRAMES = 800
    MINIMAL = (0, 1, 2, 3, 4, 5, 11, 17)

    def __init__(self, seed: int):
        self.seed = np.uint32(seed)
        self.frame = 0

    def reset_game(self):
        self.frame = 0

    def act(self, action: int) -> float:
        self.frame += 1
        u = np.uint32
        with np.errstate(over="ignore"):
            x = u(self.frame) * u(2654435761)
            x ^= self.seed * u(97)
            x ^= u(action) * u(31)
            x ^= x >> u(15)
            x *= u(2246822519)
        return 1.0 if int(x >> np.uint32(20)) % 16 == 0 else 0.0

    def lives(self) -> int:
        return max(0, 3 - self.frame // 350)

    def game_over(self, *_a, **_k) -> bool:
        return self.frame >= self.EPISODE_FRAMES

    def getMinimalActionSet(self):
        return list(self.MINIMAL)

    def getScreenRGB(self) -> np.ndarray:
        u = np.uint32
        i = np.arange(self.RES * self.RES * 3, dtype=np.uint32)
        with np.errstate(over="ignore"):
            x = i * u(2654435761)
            x ^= u(self.frame) * u(2246822519)
            x ^= self.seed * u(3266489917)
            x ^= x >> u(15)
            x *= u(2654435761)
        return ((x >> u(16)) & u(0xFF)).astype(np.uint8).reshape(self.RES, self.RES, 3)


def atari_parity_pixel_indices(k: int):
    """Deterministic indices into the canonical CHW-flat atari feature
    vector, restricted to PIXEL entries (channel % 4 != 0 — action-history
    planes hold a/18 values whose products are not order-exact in f32, so
    the parity representation must not touch them). Shared by the torch
    and jax parity nets (computed once here, stored as a buffer)."""
    c, h, w, _ = GAME_DIMS["atari"]
    total, plane = c * h * w, h * w
    idx = []
    cand = 12345
    for j in range(k):
        cand = (cand + 2654435761) % total
        while (cand // plane) % 4 == 0:
            cand = (cand + 9973) % total
        idx.append(cand)
    return np.asarray(idx, np.int64)


def muzero_parity_weights(game: str, seed: int = 20260821):
    """Deterministic integer weights for the MuZero parity net.

    The MuZero parity net keeps EVERY tensor exchanged between the torch
    (reference) and jax (this repo) sides integer-valued so the recursion
    through the dynamics net stays bitwise reproducible:

      initial:   h0 = mod16(x_can  @ Wr)                    (representation)
      recurrent: h' = mod16(h_flat @ Wd + a_can @ Wa)       (dynamics)
      predict:   logits = h @ Wp / 256 + a * 2^-16
                 value  = clamp(h @ Wv / 2^14, +/-0.96875)  (board "muzero")
                 value  = onehot(mod11(h @ Wvd))            (atari two-hot)
                 reward = onehot(mod11(h' @ Wrd))           (atari, recurrent)

    mod16(t) = t - 16*floor(t/16) is EXACT in f32 (power-of-two divide);
    all integer dot products stay < 2^24 so the sums are exact in any
    order; mod11 uses a correctly-rounded /11 that is merely *identical*
    across libraries rather than exact, which is all parity needs.
    Canonical layouts put torch's NCHW flatten and the jax transpose on
    the same flat index space (same trick as ``parity_weights``).

    Returns dict of int8 arrays: Wr[C,H,W,K], Wd[K,K], Wa[Ca,Hh,Wh,K],
    Wp[M,Hh,Wh,A], Wv[M,Hh,Wh], Wvd/Wrd[M,Hh,Wh]  (K = M*Hh*Wh, Hh/Wh the
    hidden dims). Atari swaps Wr for a pixel-gather: h0 = mod16(255 *
    x_can[Ridx]) — byte-exact on both sides, see atari_parity_pixel_indices.
    """
    c, h, w, a = GAME_DIMS[game]
    hh, wh = HIDDEN_DIMS.get(game, (h, w))
    ca = ACTION_FEATURE_CHANNELS.get(game, 1)
    m = int(MZ_HIDDEN_CHANNELS)
    k = m * hh * wh
    rng = np.random.Generator(np.random.PCG64(seed + len(game) * 2003))
    out = {}
    # draw order is part of the committed-dump contract — do not reorder
    if game == "atari":
        out["Ridx"] = atari_parity_pixel_indices(k)
    else:
        out["Wr"] = rng.integers(-3, 4, size=(c, h, w, k), dtype=np.int8)
    out["Wd"] = rng.integers(-2, 3, size=(k, k), dtype=np.int8)
    out["Wa"] = rng.integers(-7, 8, size=(ca, hh, wh, k), dtype=np.int8)
    out["Wp"] = rng.integers(-7, 8, size=(m, hh, wh, a), dtype=np.int8)
    out["Wv"] = rng.integers(-3, 4, size=(m, hh, wh), dtype=np.int8)
    out["Wvd"] = rng.integers(-2, 3, size=(m, hh, wh), dtype=np.int8)
    out["Wrd"] = rng.integers(-2, 3, size=(m, hh, wh), dtype=np.int8)
    return out


def jax_muzero_parity_network(game: str, atari_mode: bool = False):
    """A Flax MuZeroNetwork-compatible parity net + its variables.

    Duck-types ``models.muzero.MuZeroNetwork`` for ``SelfPlayEngine`` /
    ``make_muzero_search``: ``apply(variables, feats, train=False,
    method=net.initial_inference)`` and ``recurrent_inference(hidden,
    action_plane)``. Hidden states are flat f32[B, K] integer-valued
    vectors on the canonical (torch NCHW-flatten) index space.
    """
    import jax.numpy as jnp
    from flax import linen as nn

    from minizero_tpu.models.muzero import MuZeroNetwork

    c, h, w, a = GAME_DIMS[game]
    hh, wh = HIDDEN_DIMS.get(game, (h, w))
    ca = ACTION_FEATURE_CHANNELS.get(game, 1)
    m = int(MZ_HIDDEN_CHANNELS)
    k = m * hh * wh
    D = int(MZ_DISCRETE_SIZE)
    ws = muzero_parity_weights(game)
    ridx = jnp.asarray(ws["Ridx"]) if game == "atari" else None

    def mod16(t):
        return t - MZ_MOD * jnp.floor(t / MZ_MOD)

    def mod_d(t):
        b = t - MZ_BIN_MOD * jnp.floor(t / MZ_BIN_MOD)
        return jnp.clip(b, 0, D - 1).astype(jnp.int32)

    class MZParityNet(MuZeroNetwork):
        def setup(self):
            z = nn.initializers.zeros
            if game != "atari":
                self.Wr = self.param("Wr", z, (c * h * w, k), jnp.float32)
            self.Wd = self.param("Wd", z, (k, k), jnp.float32)
            self.Wa = self.param("Wa", z, (ca * hh * wh, k), jnp.float32)
            self.Wp = self.param("Wp", z, (k, a), jnp.float32)
            self.Wv = self.param("Wv", z, (k,), jnp.float32)
            self.Wvd = self.param("Wvd", z, (k,), jnp.float32)
            self.Wrd = self.param("Wrd", z, (k,), jnp.float32)

        def _predict(self, hidden):
            logits = (hidden @ self.Wp) / MZ_POLICY_SCALE + (
                jnp.arange(a, dtype=jnp.float32) * ACTION_OFFSET)
            out = {"policy_logit": logits, "policy": nn.softmax(logits, axis=-1)}
            if self.atari_mode:
                bins = mod_d(hidden @ self.Wvd)
                out["value"] = (bins[:, None] == jnp.arange(D)[None, :]).astype(jnp.float32)
            else:
                v = jnp.clip((hidden @ self.Wv) / MZ_VALUE_SCALE,
                             -VALUE_CLAMP, VALUE_CLAMP)
                out["value"] = v[:, None]
            return out

        def initial_inference(self, state, train: bool = False):
            x = jnp.transpose(state.astype(jnp.float32), (0, 3, 1, 2))
            xf = x.reshape(x.shape[0], c * h * w)
            if game == "atari":
                # byte-exact pixel gather: (pixel/255)*255 rounds to exactly
                # the byte — but ONLY with an explicit round: under jit XLA
                # fuses the multiply into an FMA inside mod16's subtraction
                # (--xla_allow_excess_precision), skipping the intermediate
                # rounding and leaving k*(1+eps) residues
                hidden = mod16(jnp.round(xf[:, ridx] * 255.0))
            else:
                hidden = mod16(xf @ self.Wr)
            out = self._predict(hidden)
            out["hidden_state"] = hidden
            return out

        def recurrent_inference(self, hidden_state, action_plane, train: bool = False):
            ap = jnp.transpose(action_plane.astype(jnp.float32), (0, 3, 1, 2))
            t = hidden_state @ self.Wd + ap.reshape(ap.shape[0], ca * hh * wh) @ self.Wa
            hidden = mod16(t)
            out = self._predict(hidden)
            out["hidden_state"] = hidden
            if self.atari_mode:
                bins = mod_d(hidden @ self.Wrd)
                out["reward"] = (bins[:, None] == jnp.arange(D)[None, :]).astype(jnp.float32)
            return out

        def __call__(self, state, train: bool = False):
            return self.initial_inference(state, train)

    net = MZParityNet(
        num_input_channels=c, input_height=h, input_width=w,
        num_hidden_channels=m, hidden_height=hh, hidden_width=wh,
        num_action_feature_channels=ca, num_blocks=0, action_size=a,
        num_value_hidden_channels=1,
        discrete_value_size=D if atari_mode else 1,
        atari_mode=atari_mode,
    )
    params = {
        "Wd": jnp.asarray(ws["Wd"], jnp.float32),
        "Wa": jnp.asarray(ws["Wa"], jnp.float32).reshape(ca * hh * wh, k),
        "Wp": jnp.asarray(ws["Wp"], jnp.float32).reshape(k, a),
        "Wv": jnp.asarray(ws["Wv"], jnp.float32).reshape(k),
        "Wvd": jnp.asarray(ws["Wvd"], jnp.float32).reshape(k),
        "Wrd": jnp.asarray(ws["Wrd"], jnp.float32).reshape(k),
    }
    if game != "atari":
        params["Wr"] = jnp.asarray(ws["Wr"], jnp.float32).reshape(c * h * w, k)
    return net, {"params": params}


def feature_checksum(flat_chw_nonzero: np.ndarray) -> int:
    """Integer checksum over the flat CHW feature vector's nonzero mask.

    C++ twin in refbench/parity_dump.cpp (featChecksum): must use the same
    uint64 hash. ``flat_chw_nonzero``: bool/0-1 array, reference feature
    order (channel-major, row-major board).
    """
    idx = np.nonzero(np.asarray(flat_chw_nonzero).ravel())[0].astype(np.uint64)
    h = (idx * np.uint64(2654435761)) >> np.uint64(7)
    return int(np.sum((h % np.uint64(251)).astype(np.int64) - 125))


def opening_actions(game_idx: int, num_moves: int):
    """Deterministic pseudo-random opening: move j of game g picks the
    (r mod n_legal)-th legal action (legal action IDs ascending).

    Returns the list of per-move raw LCG draws; the caller reduces each
    modulo its own legal count. C++ twin: openingDraw() in parity_dump.cpp.
    """
    mask = (1 << 64) - 1
    draws = []
    for j in range(num_moves):
        s = (game_idx * 1000003 + j * 7919 + 12345) & mask
        s = (s * 6364136223846793005 + 1442695040888963407) & mask
        s = (s * 6364136223846793005 + 1442695040888963407) & mask
        draws.append(s >> 33)
    return draws
