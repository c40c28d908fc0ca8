"""Native (C++) host-runtime components, loaded via ctypes.

The compute path is JAX/XLA on device; these cover the host-side hot paths
the reference implements in C++ (record serialization/parsing,
``base_env.h:207-319`` / ``data_loader.cpp:99-200``). The library compiles
on first import with g++ and is cached next to the source; every entry point
has a pure-Python fallback so a missing toolchain never breaks the
framework.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "codec.cpp")
_LIB = os.path.join(_DIR, "libmzcodec.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The codec library, building it on first use; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.mz_serialize_moves.restype = ctypes.c_int
        lib.mz_serialize_moves.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_char_p, ctypes.c_int,
        ]
        lib.mz_parse_moves.restype = ctypes.c_int
        lib.mz_parse_moves.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def serialize_moves(
    actions: np.ndarray,
    players: np.ndarray,
    policy: np.ndarray,
    values: np.ndarray,
    rewards: np.ndarray,
    threshold: float = 0.0,
) -> Optional[str]:
    """One game's ``;B[a]P[...]V[v]R[r]`` move stream; None -> use the
    Python fallback."""
    lib = load()
    if lib is None:
        return None
    length = len(actions)
    action_size = policy.shape[1] if policy.ndim == 2 else 0
    actions = np.ascontiguousarray(actions, np.int32)
    players = np.ascontiguousarray(players, np.int8)
    policy = np.ascontiguousarray(policy, np.float32)
    values = np.ascontiguousarray(values, np.float32)
    rewards = np.ascontiguousarray(rewards, np.float32)
    cap = 64 + length * (32 + 24 * max(1, int((policy > threshold).sum() // max(length, 1) + 2)))
    while True:
        buf = ctypes.create_string_buffer(cap)
        n = lib.mz_serialize_moves(
            actions.ctypes.data, players.ctypes.data, policy.ctypes.data,
            values.ctypes.data, rewards.ctypes.data,
            length, action_size, ctypes.c_float(threshold), buf, cap,
        )
        if n >= 0:
            return buf.raw[:n].decode("ascii")
        cap *= 4
        if cap > 1 << 28:
            return None


def parse_moves(text: str, max_moves: int, action_size: int):
    """Parse a record's move stream into arrays; None -> Python fallback."""
    lib = load()
    if lib is None:
        return None
    raw = text.encode("ascii", errors="ignore")
    actions = np.zeros(max_moves, np.int32)
    players = np.zeros(max_moves, np.int8)
    policy = np.zeros((max_moves, action_size), np.float32)
    values = np.zeros(max_moves, np.float32)
    rewards = np.zeros(max_moves, np.float32)
    n = lib.mz_parse_moves(
        raw, len(raw), max_moves, action_size,
        actions.ctypes.data, players.ctypes.data, policy.ctypes.data,
        values.ctypes.data, rewards.ctypes.data,
    )
    if n < 0:
        return None
    return (
        actions[:n].copy(), players[:n].copy(), policy[:n].copy(),
        values[:n].copy(), rewards[:n].copy(),
    )
