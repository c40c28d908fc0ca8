"""ConHex — stones claim board "holes"; surrounding cells are captured by the
first player to hold enough of a cell's holes; P1 connects top-bottom, P2
left-right through captured-cell adjacency (reference
``minizero/environment/conhex/{conhex,conhex_graph,conhex_graph_cell}.cpp``).

Rules preserved:
  * 9x9 holes with 12 permanently invalid positions (``conhex.cpp:15-26``)
  * 41 cells (16 outer x 3 holes, 24 inner x 6, 1 center x 5) captured by the
    FIRST player reaching 2 (outer) / 3 (inner, center) holes
    (``conhex_graph.cpp initGraph``, ``conhex_graph_cell.cpp placeStone``)
  * cells sharing a hole that belongs to exactly 3 cells are adjacent
    (``conhex_graph.cpp:58-71``); edge-flagged cells connect to the
    respective player's virtual border nodes; winner = border-to-border
    connection (``conhex_graph.cpp placeStone``)
  * swap rule: move 1 may repeat move 0, replacing it with White's stone
    REFLECTED over the anti-diagonal (``conhex.cpp:43-60``)
  * features: 6 planes = own/opp stones, own/opp captured cells (cell ids
    written into the first 41 entries of the plane, matching the
    reference's indexing), turn planes (``conhex.cpp getFeatures``)

Connectivity is a 45-node boolean transitive closure via log-round matrix
squaring — static [45, 45] ops replacing the reference's DSU.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.envs.base import Env, EnvSpec

_N = 9
_NN = 81
_INVALID = (10, 16, 20, 24, 30, 32, 48, 50, 56, 60, 64, 70)

# (holes, edge flags) in cell-id order — conhex_graph.cpp initGraph
_T, _R, _L, _B = 1, 2, 4, 8
_CELLS = (
    ((0, 1, 9), _T | _L), ((1, 2, 3), _T), ((3, 4, 5), _T), ((5, 6, 7), _T),
    ((7, 8, 17), _T | _R), ((17, 26, 35), _R), ((35, 44, 53), _R), ((53, 62, 71), _R),
    ((71, 79, 80), _R | _B), ((77, 78, 79), _B), ((75, 76, 77), _B), ((73, 74, 75), _B),
    ((63, 72, 73), _B | _L), ((45, 54, 63), _L), ((27, 36, 45), _L), ((9, 18, 27), _L),
    ((1, 2, 9, 11, 18, 19), 0), ((2, 3, 4, 11, 12, 13), 0), ((4, 5, 6, 13, 14, 15), 0),
    ((6, 7, 15, 17, 25, 26), 0), ((25, 26, 34, 35, 43, 44), 0),
    ((43, 44, 52, 53, 61, 62), 0), ((61, 62, 69, 71, 78, 79), 0),
    ((67, 68, 69, 76, 77, 78), 0), ((65, 66, 67, 74, 75, 76), 0),
    ((54, 55, 63, 65, 73, 74), 0), ((36, 37, 45, 46, 54, 55), 0),
    ((18, 19, 27, 28, 36, 37), 0), ((11, 12, 19, 21, 28, 29), 0),
    ((12, 13, 14, 21, 22, 23), 0), ((14, 15, 23, 25, 33, 34), 0),
    ((33, 34, 42, 43, 51, 52), 0), ((51, 52, 59, 61, 68, 69), 0),
    ((57, 58, 59, 66, 67, 68), 0), ((46, 47, 55, 57, 65, 66), 0),
    ((28, 29, 37, 38, 46, 47), 0), ((21, 22, 29, 31, 38, 39), 0),
    ((22, 23, 31, 33, 41, 42), 0), ((41, 42, 49, 51, 58, 59), 0),
    ((38, 39, 47, 49, 57, 58), 0), ((31, 39, 40, 41, 49), 0),
)
_NC = len(_CELLS)  # 41
_TOP, _LEFT, _RIGHT, _BOTTOM = _NC, _NC + 1, _NC + 2, _NC + 3
_NG = _NC + 4  # graph nodes


@flax.struct.dataclass
class ConHexState:
    holes: jnp.ndarray  # i8[81]
    cell_owner: jnp.ndarray  # i8[41] — sticky first capturer
    turn: jnp.ndarray  # i8
    num_moves: jnp.ndarray  # i32
    winner: jnp.ndarray  # i8
    first_action: jnp.ndarray  # i32


class ConHexEnv(Env):
    spec = EnvSpec(
        name="conhex",
        num_players=2,
        board_size=_N,
        action_size=_NN,
        num_input_channels=6,
        input_height=_N,
        input_width=_N,
        hidden_height=_N,
        hidden_width=_N,
        max_game_length=_NN,
    )

    def __init__(self, use_swap_rule: bool = True):
        self.use_swap = use_swap_rule
        invalid = np.zeros(_NN, bool)
        invalid[list(_INVALID)] = True
        self._invalid = jnp.asarray(invalid)
        member = np.zeros((_NC, _NN), np.float32)
        threshold = np.zeros(_NC, np.int32)
        for cid, (holes, _) in enumerate(_CELLS):
            member[cid, list(holes)] = 1.0
            threshold[cid] = 2 if len(holes) == 3 else 3
        self._member = jnp.asarray(member)
        self._threshold = jnp.asarray(threshold)
        # adjacency through holes shared by exactly 3 cells
        hole_cells = [[] for _ in range(_NN)]
        for cid, (holes, _) in enumerate(_CELLS):
            for h in holes:
                hole_cells[h].append(cid)
        adj = np.zeros((_NG, _NG), bool)
        for h in range(_NN):
            if len(hole_cells[h]) == 3:
                for a in hole_cells[h]:
                    for b in hole_cells[h]:
                        if a != b:
                            adj[a, b] = True
        # per-player graphs with virtual border nodes
        adj1 = adj.copy()
        adj2 = adj.copy()
        for cid, (_, flag) in enumerate(_CELLS):
            if flag & _T:
                adj1[cid, _TOP] = adj1[_TOP, cid] = True
            if flag & _B:
                adj1[cid, _BOTTOM] = adj1[_BOTTOM, cid] = True
            if flag & _L:
                adj2[cid, _LEFT] = adj2[_LEFT, cid] = True
            if flag & _R:
                adj2[cid, _RIGHT] = adj2[_RIGHT, cid] = True
        self._adj = (jnp.asarray(adj1), jnp.asarray(adj2))

    # ------------------------------------------------------------- primitives
    def _capture_update(self, holes, cell_owner, player):
        """Sticky cell capture after a stone placement
        (conhex_graph_cell.cpp placeStone)."""
        counts = jnp.dot(self._member, (holes == player).astype(jnp.float32))
        newly = (cell_owner == 0) & (counts.astype(jnp.int32) >= self._threshold)
        return jnp.where(newly, player, cell_owner).astype(jnp.int8)

    @staticmethod
    def _closure(adj, owned, src, dst):
        """Reachability src->dst over owned nodes: 6 boolean matrix
        squarings (2^6 = 64 > 45 nodes)."""
        m = adj & owned[None, :] & owned[:, None]
        m = m | jnp.eye(_NG, dtype=bool)
        for _ in range(6):
            m = jnp.dot(m.astype(jnp.float32), m.astype(jnp.float32)) > 0
        return m[src, dst]

    def _connected(self, cell_owner, player) -> jnp.ndarray:
        """Border-to-border connection check for (traced) ``player``."""
        owned1 = jnp.concatenate([cell_owner == 1, jnp.ones((4,), bool)])
        owned2 = jnp.concatenate([cell_owner == 2, jnp.ones((4,), bool)])
        win1 = self._closure(self._adj[0], owned1, _TOP, _BOTTOM)
        win2 = self._closure(self._adj[1], owned2, _LEFT, _RIGHT)
        return jnp.where(player == 1, win1, win2)

    # --------------------------------------------------------------- protocol
    def init(self) -> ConHexState:
        return ConHexState(
            holes=jnp.zeros((_NN,), jnp.int8),
            cell_owner=jnp.zeros((_NC,), jnp.int8),
            turn=jnp.int8(1),
            num_moves=jnp.int32(0),
            winner=jnp.int8(0),
            first_action=jnp.int32(-1),
        )

    def legal_mask(self, state: ConHexState) -> jnp.ndarray:
        empty = (state.holes == 0) & ~self._invalid
        if self.use_swap:
            return jnp.where(state.num_moves == 1, ~self._invalid, empty)
        return empty

    def step(self, state: ConHexState, action: jnp.ndarray) -> ConHexState:
        player = state.turn
        is_swap = (
            jnp.bool_(self.use_swap)
            & (state.num_moves == 1)
            & (action == state.first_action)
        )
        # reflection over the anti-diagonal (conhex.cpp:49-54)
        row, col = action // _N, action % _N
        reflected = (_N - 1 - col) * _N + (_N - 1 - row)
        eff_action = jnp.where(is_swap, reflected, action)
        holes = jnp.where(is_swap, jnp.zeros_like(state.holes), state.holes)
        cell_owner = jnp.where(is_swap, jnp.zeros_like(state.cell_owner), state.cell_owner)

        holes = holes.at[eff_action].set(player)
        cell_owner = self._capture_update(holes, cell_owner, player)
        win = self._connected(cell_owner, player)
        winner = jnp.where(state.winner != 0, state.winner, jnp.where(win, player, jnp.int8(0)))
        return ConHexState(
            holes=holes,
            cell_owner=cell_owner,
            turn=(jnp.int8(3) - player),
            num_moves=state.num_moves + 1,
            winner=winner.astype(jnp.int8),
            first_action=jnp.where(state.num_moves == 0, action.astype(jnp.int32), state.first_action),
        )

    def is_terminal(self, state: ConHexState) -> jnp.ndarray:
        full = ~jnp.any((state.holes == 0) & ~self._invalid)
        return (state.winner != 0) | full

    def eval_score(self, state: ConHexState) -> jnp.ndarray:
        w = state.winner
        return jnp.where(w == 1, 1.0, jnp.where(w == 2, -1.0, 0.0)).astype(jnp.float32)

    def turn(self, state: ConHexState) -> jnp.ndarray:
        return state.turn

    def features(self, state: ConHexState) -> jnp.ndarray:
        """6 planes NHWC (conhex.cpp getFeatures): stones own/opp, captured
        cells own/opp (cell ids in the first 41 slots), turn planes."""
        turn = state.turn
        opp = (3 - turn).astype(state.holes.dtype)
        own = (state.holes == turn).astype(jnp.float32)
        other = (state.holes == opp).astype(jnp.float32)
        cell_own = jnp.zeros((_NN,)).at[:_NC].set((state.cell_owner == turn).astype(jnp.float32))
        cell_opp = jnp.zeros((_NN,)).at[:_NC].set((state.cell_owner == opp).astype(jnp.float32))
        p1 = jnp.full((_NN,), (turn == 1).astype(jnp.float32))
        p2 = jnp.full((_NN,), (turn == 2).astype(jnp.float32))
        feats = jnp.stack([own, other, cell_own, cell_opp, p1, p2], axis=0)
        return jnp.transpose(feats.reshape(6, _N, _N), (1, 2, 0))

    def num_rotations(self) -> int:
        return 1
