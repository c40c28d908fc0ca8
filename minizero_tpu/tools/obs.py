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
