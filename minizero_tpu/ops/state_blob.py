"""Pack a batch of env-state pytrees into one dense int32 row per game.

The AlphaZero device search stores env states per tree node (the TPU
replacement for the reference's replay-env-to-leaf,
``actor/zero_actor.cpp:247-252``). Reading the selected parent's state back
out is a per-game row gather over the node axis; doing that as a one-hot
reduce costs O(N * state_bytes) HBM reads per simulation, which dominates at
large simulation counts. Packing the whole state into a single ``i32[W]``
blob per node lets ONE Pallas row-gather (``ops/gather_rows.py``) fetch it
in O(state_bytes).

Packing is pure bit-movement (bitcasts + pads), exact for every dtype:
bool -> u8, then every leaf is viewed as bytes, concatenated in tree-flatten
order, padded to a multiple of 4, and viewed as int32.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BlobSpec(NamedTuple):
    """Static description of a packed state layout."""

    treedef: Any
    shapes: Tuple[Tuple[int, ...], ...]  # per-leaf trailing shape (no batch dim)
    dtypes: Tuple[Any, ...]
    nbytes: Tuple[int, ...]  # per-leaf bytes per game
    width: int  # i32 words per game


def blob_spec(proto: Any) -> BlobSpec:
    """Build the layout from a single-game state pytree (no batch dim)."""
    leaves, treedef = jax.tree_util.tree_flatten(proto)
    shapes = tuple(tuple(x.shape) for x in leaves)
    dtypes = tuple(x.dtype for x in leaves)
    nbytes = tuple(int(np.prod(s, dtype=np.int64)) * np.dtype(d).itemsize
                   for s, d in zip(shapes, dtypes))
    total = sum(nbytes)
    return BlobSpec(treedef, shapes, dtypes, nbytes, width=-(-total // 4))


def _to_bytes(x: jnp.ndarray) -> jnp.ndarray:
    """[B, ...] any dtype -> u8[B, nbytes]."""
    b = x.shape[0]
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.uint8)
    flat = x.reshape(b, -1) if x.ndim > 1 else x.reshape(b, 1)
    k = np.dtype(flat.dtype).itemsize
    if k == 1:
        return jax.lax.bitcast_convert_type(flat, jnp.uint8)
    return jax.lax.bitcast_convert_type(flat, jnp.uint8).reshape(b, -1)


def pack_rows(spec: BlobSpec, states: Any) -> jnp.ndarray:
    """Batched state pytree ([B, ...] leaves) -> i32[B, W]."""
    leaves = jax.tree_util.tree_leaves(states)
    parts: List[jnp.ndarray] = [_to_bytes(x) for x in leaves]
    byts = jnp.concatenate(parts, axis=1)
    b, total = byts.shape
    pad = spec.width * 4 - total
    if pad:
        byts = jnp.pad(byts, ((0, 0), (0, pad)))
    return jax.lax.bitcast_convert_type(
        byts.reshape(b, spec.width, 4), jnp.int32)


def unpack_rows(spec: BlobSpec, blob: jnp.ndarray) -> Any:
    """i32[B, W] -> batched state pytree."""
    b = blob.shape[0]
    byts = jax.lax.bitcast_convert_type(blob, jnp.uint8).reshape(b, -1)
    out = []
    off = 0
    for shape, dtype, nb in zip(spec.shapes, spec.dtypes, spec.nbytes):
        chunk = byts[:, off:off + nb]
        off += nb
        d = jnp.dtype(dtype)
        if d == jnp.bool_:
            x = chunk.astype(jnp.bool_)
        elif d.itemsize == 1:
            x = jax.lax.bitcast_convert_type(chunk, d)
        else:
            x = jax.lax.bitcast_convert_type(
                chunk.reshape(b, nb // d.itemsize, d.itemsize), d)
        out.append(x.reshape((b,) + shape))
    return jax.tree_util.tree_unflatten(spec.treedef, out)
