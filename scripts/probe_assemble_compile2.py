"""Follow-up bisect: is the compile-helper crash from the u8 dtype, the
window row count, or gather itself?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def try_(name, fn, *args):
    try:
        out = jax.block_until_ready(jax.jit(fn)(*args))
        print(f"{name}: OK {out.shape} {out.dtype}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    for rows, dt, n_idx, name in [
        (1000, jnp.uint8, 64, "small_u8"),
        (1000, jnp.float32, 64, "small_f32"),
        (278_000, jnp.float32, 9216, "big_f32"),
        (278_000, jnp.uint8, 64, "big_u8_few"),
        (32_768, jnp.uint8, 9216, "mid_u8"),
        (65_536, jnp.uint8, 9216, "mid2_u8"),
        (131_072, jnp.uint8, 9216, "mid3_u8"),
        (262_144, jnp.uint8, 9216, "pow2_u8"),
        (278_000, jnp.int8, 9216, "big_i8"),
    ]:
        w = jnp.zeros((rows, 96, 96, 3), dt)
        i = jnp.zeros((n_idx,), jnp.int32)
        try_(f"{name}[{rows}x{dt.__name__}x{n_idx}]",
             lambda w, i: jnp.take(w, i, axis=0), w, i)


if __name__ == "__main__":
    main()
