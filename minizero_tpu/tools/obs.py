"""Observation (OBS tag) handling for long-episode records.

Reference parity for ``minizero/utils/utils.h:35-91`` (gzip + hex-string
observation compression) and the ``-mode remove_obs / recover_obs`` tools
(``minizero/environment/atari/obs_{remover,recover}.{h,cpp}``,
``tools/handle_obs.sh``): OBS tags keep raw per-step observations inside a
record; removal strips them to shrink archives; recovery replays the episode
from its seed to regenerate them (possible because envs reset
deterministically from the stored SD seed, ``atari.cpp:41-46``).
"""

from __future__ import annotations

import re
import zlib
from typing import Callable, List, Optional

import numpy as np

_OBS_TAG = re.compile(r"OBS\[((?:\\.|[^\]\\])*)\]")


def compress_obs(data: bytes) -> str:
    """gzip + hex (reference compressString/binaryToHexString,
    utils.h:35-68)."""
    return zlib.compress(data, level=6).hex()


def decompress_obs(text: str) -> bytes:
    return zlib.decompress(bytes.fromhex(text))


def pack_observations(obs: np.ndarray) -> str:
    """uint8 observation stack -> OBS tag payload."""
    arr = np.ascontiguousarray(obs, np.uint8)
    header = np.asarray(arr.shape, np.int32).tobytes()
    return compress_obs(np.asarray([arr.ndim], np.int32).tobytes() + header + arr.tobytes())


def unpack_observations(payload: str) -> np.ndarray:
    raw = decompress_obs(payload)
    ndim = int(np.frombuffer(raw[:4], np.int32)[0])
    shape = tuple(np.frombuffer(raw[4 : 4 + 4 * ndim], np.int32))
    return np.frombuffer(raw[4 + 4 * ndim :], np.uint8).reshape(shape)


def remove_obs(record: str) -> str:
    """Strip OBS tags (reference obs_remover.cpp:17-50)."""
    return _OBS_TAG.sub("", record)


def remove_obs_file(in_path: str, out_path: str) -> int:
    n = 0
    with open(in_path) as fin, open(out_path, "w") as fout:
        for line in fin:
            fout.write(remove_obs(line.rstrip("\n")) + "\n")
            n += 1
    return n


def recover_obs(
    record: str,
    replay_observations: Callable[[str], Optional[np.ndarray]],
) -> str:
    """Re-attach an OBS tag by deterministic replay (reference
    obs_recover.h:19-83). ``replay_observations(record)`` regenerates the
    uint8 observation stack from the record's seed/actions (needs the real
    env backend, e.g. ALE); records it cannot handle pass through
    unchanged."""
    if _OBS_TAG.search(record):
        return record
    obs = replay_observations(record)
    if obs is None:
        return record
    payload = pack_observations(obs)
    # insert before the final ')'
    idx = record.rfind(")")
    return record[:idx] + f"OBS[{payload}]" + record[idx:]


class AtariObsReplayer:
    """Regenerates newest-frame observations for (possibly chunked) atari
    records by deterministic seed replay (reference obs_recover.h:19-83:
    split sequences of one episode are re-aligned by matching action
    prefixes against the ongoing replay)."""

    def __init__(self, rom_dir: str = "/opt/atari57/", ale_factory=None):
        self.rom_dir = rom_dir
        self.ale_factory = ale_factory
        self._sessions: dict = {}

    def _frame(self, env) -> np.ndarray:
        return env.newest_frame()  # u8 history ring, verbatim bytes

    def __call__(self, record: str) -> Optional[np.ndarray]:
        from minizero_tpu.envs.atari import ACTION_SIZE, AtariEnv

        from minizero_tpu.selfplay.record import parse_game

        tags, moves = parse_game(record, ACTION_SIZE)
        game = tags.get("GM", "")
        if not game.startswith("atari") or "SD" not in tags:
            return None
        seed = int(tags["SD"])
        key = (game, seed)
        actions = [int(m["action"]) for m in moves]
        sess = self._sessions.get(key)
        if sess is None:
            env = AtariEnv(
                game_name=game[len("atari_"):] if game.startswith("atari_") else game,
                rom_dir=self.rom_dir, seed=seed, ale_factory=self.ale_factory,
            )
            # "base" = episode position of actions[0]/frames[0]: chunk
            # offsets only grow, so consumed prefixes are trimmed
            # (memory-bounded like the reference's retention, atari.cpp:86-91)
            sess = {"env": env, "actions": [], "frames": [self._frame(env)], "base": 0}
            self._sessions[key] = sess
        # align this chunk against the replay so far: the OFF tag (absolute
        # episode position of the chunk's first move) is authoritative;
        # otherwise find the offset where the chunk's action string
        # continues the episode's action stream (the reference's
        # prefix-matching recovery — ambiguous for periodic action streams)
        played = sess["actions"]
        base = sess["base"]
        end = base + len(played)  # episode positions played so far
        offset = None
        if "OFF" in tags:
            o = int(tags["OFF"])
            if base <= o <= end and actions[: end - o] == played[o - base:]:
                offset = o
        if offset is None:
            for o in range(max(base, end - len(actions)), end + 1):
                n_overlap = end - o
                if actions[:n_overlap] == played[o - base:]:
                    offset = o
                    break
        if offset is None:
            return None  # not a continuation of this episode's replay
        for a in actions[end - offset:]:
            sess["env"].step(a)
            played.append(a)
            sess["frames"].append(self._frame(sess["env"]))
        out = np.stack(sess["frames"][offset - base: offset - base + len(actions)])
        drop = offset - base
        if drop > 0:
            del played[:drop]
            del sess["frames"][:drop]
            sess["base"] = offset
        if sess["env"].is_terminal():
            del self._sessions[key]
        return out


def recover_obs_file(in_path: str, out_path: str, replayer) -> int:
    n = 0
    with open(in_path) as fin, open(out_path, "w") as fout:
        for line in fin:
            line = line.rstrip("\n")
            if line:
                line = recover_obs(line, replayer)
            fout.write(line + "\n")
            n += 1
    return n
