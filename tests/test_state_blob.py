"""state blob pack/unpack + Pallas row gather (interpret mode).

The v2 engine path stores env states as packed i32 blobs per tree node and
fetches the selected parent's row with one DMA per game
(``ops/state_blob.py``, ``ops/gather_rows.py``). Packing must be an exact
bit-level roundtrip for every leaf dtype an env uses (bool, i8, u8, i32,
u32, f32), and the gather must match the one-hot reference.
"""

import jax
import jax.numpy as jnp
import numpy as np

from minizero_tpu.ops.gather_rows import gather_rows, gather_rows_reference
from minizero_tpu.ops.state_blob import blob_spec, pack_rows, unpack_rows


def test_blob_roundtrip_mixed_dtypes():
    rng = np.random.default_rng(0)
    b = 6
    proto = {
        "board": jnp.zeros((81,), jnp.int8),
        "mask": jnp.zeros((82,), bool),
        "hash": jnp.zeros((), jnp.uint32),
        "hist": jnp.zeros((8, 81), jnp.int8),
        "score": jnp.zeros((), jnp.float32),
        "ids": jnp.zeros((7,), jnp.int32),
        "small": jnp.zeros((), jnp.uint8),
    }
    spec = blob_spec(proto)
    states = {
        "board": jnp.asarray(rng.integers(-128, 128, (b, 81), np.int8)),
        "mask": jnp.asarray(rng.integers(0, 2, (b, 82)).astype(bool)),
        "hash": jnp.asarray(rng.integers(0, 2**32, (b,), np.uint32)),
        "hist": jnp.asarray(rng.integers(-128, 128, (b, 8, 81), np.int8)),
        "score": jnp.asarray(rng.normal(size=(b,)).astype(np.float32)),
        "ids": jnp.asarray(rng.integers(-2**31, 2**31, (b, 7), np.int32)),
        "small": jnp.asarray(rng.integers(0, 256, (b,), np.uint8)),
    }
    blob = pack_rows(spec, states)
    assert blob.shape == (b, spec.width) and blob.dtype == jnp.int32
    back = unpack_rows(spec, blob)
    for key in states:
        np.testing.assert_array_equal(np.asarray(states[key]),
                                      np.asarray(back[key]), err_msg=key)


def test_blob_roundtrip_under_jit_and_vmap_free():
    proto = {"a": jnp.zeros((3,), jnp.float32), "b": jnp.zeros((), jnp.int8)}
    spec = blob_spec(proto)

    @jax.jit
    def rt(states):
        return unpack_rows(spec, pack_rows(spec, states))

    states = {"a": jnp.arange(12, dtype=jnp.float32).reshape(4, 3),
              "b": jnp.arange(4, dtype=jnp.int8)}
    back = rt(states)
    np.testing.assert_array_equal(np.asarray(states["a"]), np.asarray(back["a"]))
    np.testing.assert_array_equal(np.asarray(states["b"]), np.asarray(back["b"]))


def test_gather_rows_matches_reference():
    rng = np.random.default_rng(1)
    # 100 and 12: batches not divisible by 8 (eval matches) pad with
    # skip lanes inside gather_rows
    for b, n, w in [(8, 8, 128), (64, 208, 768), (16, 40, 256), (100, 16, 128), (12, 8, 128)]:
        x = jnp.asarray(rng.integers(-2**31, 2**31, (b, n, w), np.int32))
        # indices may cover only a prefix (engine: n rounded up from max_nodes)
        idx = jnp.asarray(rng.integers(0, n - 3, (b,), np.int32))
        out = gather_rows(x, idx, interpret=True)
        ref = gather_rows_reference(x, idx)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref),
                                      err_msg=f"b={b} n={n} w={w}")
