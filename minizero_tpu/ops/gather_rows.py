"""Per-game row gather ``out[b] = x[b, idx[b]]`` as a Pallas TPU kernel.

The per-lane dynamic gather is the #1 TPU performance killer in this
codebase's history (CLAUDE.md): XLA lowers a vmapped ``x[idx]`` to per-lane
scatter/gather sequences, and the one-hot masked-reduce replacement costs
O(N) HBM reads per row. This kernel instead issues one dynamic-sliced DMA
per game — O(row bytes) traffic — with the source left in HBM
(``memory_space=ANY``) and a window of DMAs kept in flight.

Used by the self-play engine to fetch the selected parent's node embedding
(packed state blob, ``ops/state_blob.py``) each simulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# games per grid step; also the number of row DMAs in flight
_TILE = 256


def _gather_kernel(tile: int, idx_ref, x_ref, o_ref, sems):
    i = pl.program_id(0)

    def issue(g, _):
        row = idx_ref[i * tile + g]
        pltpu.make_async_copy(
            x_ref.at[i * tile + g, row], o_ref.at[g], sems.at[g]
        ).start()
        return 0

    jax.lax.fori_loop(0, tile, issue, 0)

    def drain(g, _):
        row = idx_ref[i * tile + g]
        pltpu.make_async_copy(
            x_ref.at[i * tile + g, row], o_ref.at[g], sems.at[g]
        ).wait()
        return 0

    jax.lax.fori_loop(0, tile, drain, 0)


def gather_rows(x: jnp.ndarray, idx: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x: [B, N, W], idx: i32[B] in [0, N) -> [B, W] with out[b] = x[b, idx[b]]."""
    b, n, w = x.shape
    tile = _TILE
    while b % tile:
        tile //= 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // tile,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tile, w), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((tile,))],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, w), x.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), x)


def gather_rows_reference(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Pure-JAX mirror (one-hot reduce) for tests and non-TPU backends."""
    oh = idx[:, None] == jnp.arange(x.shape[1], dtype=jnp.int32)[None, :]
    return jnp.sum(jnp.where(oh[:, :, None], x, jnp.zeros((), x.dtype)),
                   axis=1, dtype=x.dtype)
