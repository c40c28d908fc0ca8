"""Independent Python re-verification of the killallgo seki table.

The 7x7 seki tables (``native/seki_7x7_*.tbl``) are produced by the C++
AND-OR proof search in ``minizero_tpu/native/seki_gen.cpp`` (counterpart of
the reference's generator, killallgo_seki_7x7.cpp:312-375).  VERDICT r1 #9
asked for a cross-check of sampled patterns against an independent
adjudicator: this module re-implements the *semantics* of the proof — Go
captures/suicide, Benson life, the enclosed-seki termination rules, the
pass/superko variants — from scratch in Python (sets + int bitboards, no
move-ordering heuristics, no node caps) and re-runs sampled table entries
through it.

Checked both ways:
  * sampled table entries must re-prove as sekis (no side can change the
    local status in any of the 4 search variants);
  * eye-filled perturbations of those entries must fail the seki proof and
    must be absent from the table.
"""

import itertools
import os
import random

import pytest

N = 7
NN = 49
FULL = (1 << NN) - 1
BLACK, WHITE = 1, 2

_NBR4 = []
_NBR8 = []
for _r in range(N):
    for _c in range(N):
        m4 = m8 = 0
        for dr, dc in itertools.product((-1, 0, 1), repeat=2):
            if dr == 0 and dc == 0:
                continue
            rr, cc = _r + dr, _c + dc
            if 0 <= rr < N and 0 <= cc < N:
                m8 |= 1 << (rr * N + cc)
                if dr == 0 or dc == 0:
                    m4 |= 1 << (rr * N + cc)
        _NBR4.append(m4)
        _NBR8.append(m8)


def bits(mask):
    while mask:
        low = mask & -mask
        yield low.bit_length() - 1
        mask ^= low


def dilate(mask):
    out = mask
    for i in bits(mask):
        out |= _NBR4[i]
    return out


def flood(seed, allowed):
    cur = seed & allowed
    while True:
        grown = dilate(cur) & allowed
        if grown == cur:
            return cur
        cur = grown


def blocks_of(mask):
    rest = mask
    while rest:
        blk = flood(rest & -rest, mask)
        yield blk
        rest &= ~blk


class Pos:
    __slots__ = ("black", "white", "passes")

    def __init__(self, black, white, passes=0):
        self.black, self.white, self.passes = black, white, passes

    def occ(self):
        return self.black | self.white

    def stones(self, player):
        return self.black if player == BLACK else self.white


def play(pos, cell, player):
    """Returns the successor Pos, or None on suicide."""
    bit = 1 << cell
    mine = pos.stones(player) | bit
    theirs = pos.stones(3 - player)
    occ = mine | theirs
    dead = 0
    for j in bits(_NBR4[cell] & theirs):
        if (1 << j) & dead:
            continue
        blk = flood(1 << j, theirs)
        if not (dilate(blk) & ~occ & FULL):
            dead |= blk
    theirs &= ~dead
    occ = mine | theirs
    own = flood(bit, mine)
    if not (dilate(own) & ~occ & FULL):
        return None
    if player == BLACK:
        return Pos(mine, theirs, 0)
    return Pos(theirs, mine, 0)


def benson(pos, player):
    """Benson pass-alive points of `player` (independent list/dict impl)."""
    mine = pos.stones(player)
    if not mine:
        return 0
    empty = ~pos.occ() & FULL
    blocks = list(blocks_of(mine))
    regions = list(blocks_of(FULL & ~mine))
    libs = [dilate(b) & empty for b in blocks]
    vital = {}
    adj = {}
    for ai, area in enumerate(regions):
        ae = area & empty
        for bi, blk in enumerate(blocks):
            adj[(ai, bi)] = bool(dilate(blk) & area)
            vital[(ai, bi)] = bool(ae) and not (ae & ~libs[bi])
    keep_b = [True] * len(blocks)
    keep_a = [True] * len(regions)
    changed = True
    while changed:
        changed = False
        for bi in range(len(blocks)):
            if keep_b[bi] and sum(
                    1 for ai in range(len(regions))
                    if keep_a[ai] and vital[(ai, bi)]) < 2:
                keep_b[bi] = False
                changed = True
        for ai in range(len(regions)):
            if keep_a[ai] and any(
                    adj[(ai, bi)] and not keep_b[bi]
                    for bi in range(len(blocks))):
                keep_a[ai] = False
                changed = True
    out = 0
    for bi, blk in enumerate(blocks):
        if keep_b[bi]:
            out |= blk
    for ai, area in enumerate(regions):
        if keep_a[ai]:
            out |= area
    return out


class ProofSearch:
    """AND-OR status-change proof (semantics of seki_gen.cpp run_search)."""

    def __init__(self, search_area, anchor, attacker, allow_pass):
        self.search_area = search_area
        self.anchor = anchor
        self.attacker = attacker
        self.allow_pass = allow_pass
        self.ssk_seen = False
        self.hist = []
        self.hist_base = 0
        self.nodes = 0

    def in_hist(self, pos):
        return any(b == pos.black and w == pos.white
                   for b, w in self.hist[self.hist_base:])

    def attacker_fails(self, pos, turn, new_board):
        self.nodes += 1
        assert self.nodes < 5_000_000, "oracle search exploded"

        if benson(pos, WHITE):
            return self.attacker == BLACK
        ring = (flood(1 << self.anchor, pos.white)
                if (pos.white >> self.anchor) & 1 else 0)
        if not ring:
            return self.attacker == WHITE
        if benson(pos, BLACK) & self.search_area:
            return self.attacker == WHITE

        ring_libs = dilate(ring) & ~pos.occ() & FULL
        area = (self.search_area | ring) & ~pos.occ()
        if turn == BLACK:
            area |= ring_libs

        can_pass = turn != self.attacker
        if self.allow_pass:
            if pos.passes >= 2:
                self.hist_base = len(self.hist)
                pos = Pos(pos.black, pos.white, 0)
                new_board = True
            else:
                new_board = False
            if not new_board and turn == self.attacker:
                can_pass = any(
                    (q := play(pos, i, turn)) is not None and self.in_hist(q)
                    for i in bits(area))

        # moves in the raw bit order — deliberately NOT the generator's
        # capture-threat priority ordering (a pure cutoff heuristic)
        for cell in bits(area):
            succ = play(pos, cell, turn)
            if succ is None:
                continue
            if self.in_hist(succ):
                if turn == self.attacker:
                    self.ssk_seen = True
                continue
            self.hist.append((succ.black, succ.white))
            res = self.attacker_fails(succ, 3 - turn, new_board)
            self.hist.pop()
            if turn == self.attacker:
                if not res:
                    return False
            elif res:
                return True
        if can_pass:
            succ = Pos(pos.black, pos.white, pos.passes + 1)
            res = self.attacker_fails(succ, 3 - turn, new_board)
            if turn == self.attacker:
                if not res:
                    return False
            elif res:
                return True
        return turn == self.attacker


def build_position(black, eyes):
    """Reconstruct the generator's local position from a table key; returns
    (Pos, search_area, anchor) or None if the setup is rejected (mirrors
    seki_gen.cpp main's construction filters)."""
    shape = black | eyes
    ring = 0
    for i in bits(shape):
        ring |= _NBR8[i]
    ring &= ~shape
    outer = dilate(ring) & ~shape & ~ring
    pos = Pos(black | outer, ring)
    for player in (BLACK, WHITE):
        for blk in blocks_of(pos.stones(player)):
            if not (dilate(blk) & ~pos.occ() & FULL):
                return None
    inner = dilate(black) & ~pos.white
    ring_libs = dilate(ring) & ~pos.occ() & FULL
    if shape & ~inner & ~ring_libs:
        return None
    search_area = inner | ring | ring_libs
    anchor = next(bits(ring))
    return pos, search_area, anchor


def prove_seki(black, eyes):
    """Full 4-variant seki proof; returns (is_seki, ssk_seen)."""
    built = build_position(black, eyes)
    if built is None:
        return False, False
    pos, search_area, anchor = built
    ssk = False
    for attacker, allow_pass in ((WHITE, False), (BLACK, False),
                                 (WHITE, True), (BLACK, True)):
        s = ProofSearch(search_area, anchor, attacker, allow_pass)
        s.hist.append((pos.black, pos.white))
        ok = s.attacker_fails(pos, attacker, False)
        ssk = ssk or s.ssk_seen
        if not ok:
            return False, ssk
    return True, ssk


def _load_table():
    base = os.path.join(os.path.dirname(__file__), "..",
                        "minizero_tpu", "native")
    for name in ("seki_7x7_5_8.tbl", "seki_7x7_5_5.tbl"):
        path = os.path.join(base, name)
        if os.path.exists(path):
            entries = []
            with open(path) as f:
                for line in f:
                    b, e = line.split()
                    entries.append((int(b, 16), int(e, 16)))
            return name, entries
    pytest.skip("no committed seki table")


def test_sampled_table_entries_reprove_as_seki():
    name, entries = _load_table()
    assert len(entries) > 100
    rng = random.Random(0)
    # restrict to small shapes so the unpruned Python proof stays fast
    small = [(b, e) for b, e in entries
             if (b | e).bit_count() <= 6] or entries
    sample = rng.sample(small, min(6, len(small)))
    for black, eyes in sample:
        is_seki, ssk = prove_seki(black, eyes)
        assert is_seki, (name, hex(black), hex(eyes))
        # table entries must not have depended on a superko prune
        assert not ssk, (name, hex(black), hex(eyes))


def test_eye_filled_perturbations_are_not_seki():
    name, entries = _load_table()
    keys = set(entries)
    rng = random.Random(1)
    small = [(b, e) for b, e in entries
             if (b | e).bit_count() <= 6 and e.bit_count() >= 2] or entries
    sample = rng.sample(small, min(4, len(small)))
    for black, eyes in sample:
        eye = 1 << next(bits(eyes))
        black2, eyes2 = black | eye, eyes & ~eye
        assert (black2, eyes2) not in keys, (hex(black2), hex(eyes2))
        is_seki, _ = prove_seki(black2, eyes2)
        assert not is_seki, (name, hex(black2), hex(eyes2))
