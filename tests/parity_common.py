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
# (go.cpp:280-307 → 18 planes; tictactoe.cpp:71-97 → 4 planes)
GAME_DIMS = {
    "go": (18, 9, 9, 82),
    "tictactoe": (4, 3, 3, 9),
}

POLICY_SCALE = 32.0  # logits = int_sum / 32 (soft enough that visits spread)
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
