"""Bisect the AOT compile-helper crash on the frame-window assemble jit.

The sustained r5 Atari run died twice, deterministically, compiling
``assemble_features`` (HTTP 500, tpu_compile_helper subprocess exit 1).
Compile progressively larger pieces at production shapes to find the op
the chipless TpuAotCompiler rejects.

    python scripts/probe_assemble_compile.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

R, H, W = 278_000, 96, 96
K, B, HIST = 9, 128, 8


def main():
    win = jnp.zeros((R, H, W, 3), jnp.uint8)
    idx = jnp.zeros((K, B, HIST), jnp.int32)
    valid = jnp.ones((K, B, HIST), jnp.bool_)
    aplane = jnp.zeros((K, B, HIST), jnp.uint8)

    def try_(name, fn, *args):
        try:
            out = jax.jit(fn)(*args)
            jax.block_until_ready(out)
            print(f"{name}: OK {out.shape} {out.dtype}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

    try_("take_u8", lambda w, i: jnp.take(w, i.reshape(-1), axis=0), win, idx)

    def gather_mask(w, i, v):
        f = jnp.take(w, i.reshape(-1), axis=0).reshape(K, B, HIST, H, W, 3)
        return jnp.where(v[..., None, None, None], f, jnp.uint8(0))
    try_("gather_mask", gather_mask, win, idx, valid)

    def full(w, i, v, a):
        from minizero_tpu.learner.frame_window import assemble_features
        return assemble_features(w, i, v, a)
    try_("full_assemble", full, win, idx, valid, aplane)

    def no_concat(w, i, v, a):
        f = jnp.take(w, i.reshape(-1), axis=0).reshape(K, B, HIST, H, W, 3)
        f = jnp.where(v[..., None, None, None], f, jnp.uint8(0))
        f = jnp.moveaxis(f, 2, 4)  # [K,B,H,W,8,3]
        f = f.reshape(K, B, H, W, 24).astype(jnp.float32)
        ap = jnp.broadcast_to(a[:, :, None, None, :], (K, B, H, W, HIST)).astype(jnp.float32)
        return f.sum() + ap.sum()
    try_("no_concat", no_concat, win, idx, valid, aplane)

    def f32_gather(w, i, v, a):
        f = jnp.take(w.astype(jnp.float32), i.reshape(-1), axis=0)
        return f.sum()
    try_("f32_gather(whole-window cast!)", f32_gather, win, idx, valid, aplane)


if __name__ == "__main__":
    main()
