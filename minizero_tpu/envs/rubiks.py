"""Rubik's cube — single-player; solve within 30 rotations (reference
``minizero/environment/rubiks/rubiks.{h,cpp}``).

Actions: 12 per layer-pair (6 faces x clockwise/prime), policy size
``board_size/2*12`` (``rubiks.h:152``). Every action is legal; terminal when
solved or after ``kMaxRotateNum``=30 rotations; eval = +1 solved else -1
(``rubiks.cpp:71-80``). Features: 6 colour-indicator channels over the
6-face-stacked [6n, n] sticker grid (``rubiks.cpp getFeatures``).

Each episode starts from ``env_rubiks_scramble_rotate`` random rotations
(``rubiks.cpp reset``) — surfaced through the functional ``init_random(rng)``
hook. The reference's sticker-swap rotation routine is executed once on an
index cube at construction to extract the 12 permutations; ``step`` is a
single gather.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec

_FACES = 6
_MAX_ROTATE = 30  # kMaxRotateNum

# kCubeRotateSide (rubiks.h:96-115)
_SIDES = (
    ((1, 0, 0, 0), (2, 0, 0, 0), (3, 0, 0, 0), (4, 0, 0, 0)),
    ((0, 1, 0, 1), (4, 1, 1, 0), (5, 1, 0, 1), (2, 1, 0, 1)),
    ((0, 0, 1, 1), (1, 1, 1, 0), (5, 0, 0, 0), (3, 1, 0, 1)),
    ((0, 1, 1, 0), (2, 1, 1, 0), (5, 1, 1, 0), (4, 1, 0, 1)),
    ((0, 0, 0, 0), (3, 1, 1, 0), (5, 0, 1, 1), (1, 1, 0, 1)),
    ((1, 0, 1, 1), (4, 0, 1, 1), (3, 0, 1, 1), (2, 0, 1, 1)),
)


def _coords(side, ly, bs, n):
    f, a, b, c = side
    if a:
        x = (n - bs - 1) if c else bs
        y = (n - ly - 1) if b else ly
    else:
        x = (n - ly - 1) if b else ly
        y = (n - bs - 1) if c else bs
    return f, x, y


def _rotate_np(board, face, layer, prime, n):
    """Direct port of RubiksEnv::rotate (rubiks.cpp:118-168) on a [6, n, n]
    numpy array."""
    sides = _SIDES[face]
    if prime:
        board[face] = board[face].T.copy()
        for i in range(2, -1, -1):
            for ly in range(layer):
                for bs in range(n):
                    fa, ax, ay = _coords(sides[i], ly, bs, n)
                    fb, bx, by = _coords(sides[i + 1], ly, bs, n)
                    board[fa, ax, ay], board[fb, bx, by] = board[fb, bx, by], board[fa, ax, ay]
    board[face] = board[face][::-1].copy()
    if not prime:
        board[face] = board[face].T.copy()
        for i in range(1, 4):
            for ly in range(layer):
                for bs in range(n):
                    fa, ax, ay = _coords(sides[i], ly, bs, n)
                    fb, bx, by = _coords(sides[i - 1], ly, bs, n)
                    board[fa, ax, ay], board[fb, bx, by] = board[fb, bx, by], board[fa, ax, ay]
    return board


@flax.struct.dataclass
class RubiksState:
    stickers: jnp.ndarray  # i8[6*n*n] colour per sticker (0..5)
    num_moves: jnp.ndarray  # i32


class RubiksEnv(Env):
    def __init__(self, board_size: int = 3, scramble: int = 5):
        assert 2 <= board_size <= 3
        n = board_size
        self.n = n
        self.cells = _FACES * n * n
        self.scramble = int(scramble)
        self.num_actions = max(n // 2, 1) * 12
        self.spec = EnvSpec(
            name="rubiks",
            num_players=1,
            board_size=n,
            action_size=self.num_actions,
            num_input_channels=_FACES,
            input_height=_FACES * n,
            input_width=n,
            hidden_height=_FACES * n,
            hidden_width=n,
            max_game_length=_MAX_ROTATE,
        )
        # extract the permutation of each action id from the reference
        # rotation routine applied to an index cube
        perms = np.zeros((self.num_actions, self.cells), np.int32)
        for a in range(self.num_actions):
            idx = np.arange(self.cells).reshape(_FACES, n, n)
            face = a % 6
            layer = a // 12 + 1
            prime = (a % 12) >= 6
            out = _rotate_np(idx.copy(), face, layer, prime, n)
            # out[pos] = old index now at pos  ->  new[pos] = old[out[pos]]
            perms[a] = out.reshape(-1)
        self._perms = jnp.asarray(perms)
        self._solved = jnp.asarray(
            np.repeat(np.arange(_FACES, dtype=np.int8), n * n)
        )

    # --------------------------------------------------------------- protocol
    def init(self) -> RubiksState:
        return RubiksState(stickers=self._solved, num_moves=jnp.int32(0))

    def init_random(self, rng: jax.Array) -> RubiksState:
        """Scrambled start (reference reset, rubiks.cpp:14-37)."""
        actions = jax.random.randint(rng, (self.scramble,), 0, self.num_actions)

        def body(i, stickers):
            return stickers[self._perms[actions[i]]]

        stickers = jax.lax.fori_loop(0, self.scramble, body, self._solved)
        return RubiksState(stickers=stickers, num_moves=jnp.int32(0))

    def step(self, state: RubiksState, action: jnp.ndarray) -> RubiksState:
        return RubiksState(
            stickers=state.stickers[self._perms[action]],
            num_moves=state.num_moves + 1,
        )

    def legal_mask(self, state: RubiksState) -> jnp.ndarray:
        return jnp.ones((self.num_actions,), bool)  # rubiks.cpp:66-69

    def _solved_now(self, state: RubiksState) -> jnp.ndarray:
        return jnp.all(state.stickers == self._solved)

    def is_terminal(self, state: RubiksState) -> jnp.ndarray:
        return self._solved_now(state) | (state.num_moves >= _MAX_ROTATE)

    def eval_score(self, state: RubiksState) -> jnp.ndarray:
        return jnp.where(self._solved_now(state), 1.0, -1.0).astype(jnp.float32)

    def turn(self, state: RubiksState) -> jnp.ndarray:
        return jnp.int8(1)

    def features(self, state: RubiksState) -> jnp.ndarray:
        """f32[6n, n, 6]: per-colour indicator planes over the stacked
        faces."""
        n = self.n
        grid = state.stickers.reshape(_FACES * n, n)
        return (grid[:, :, None] == jnp.arange(_FACES, dtype=grid.dtype)[None, None, :]).astype(
            jnp.float32
        )

    def num_rotations(self) -> int:
        return 1
