"""Per-game row gather ``out[b] = x[b, idx[b]]`` as a Pallas TPU kernel.

The per-lane dynamic gather is the #1 TPU performance killer in this
codebase's history (CLAUDE.md): XLA lowers a vmapped ``x[idx]`` to per-lane
scatter/gather sequences, and the one-hot masked-reduce replacement costs
O(N) HBM reads per row. This kernel instead issues one dynamic-sliced DMA
per game — O(row bytes) traffic — with the source left in HBM
(``memory_space=ANY``) and a window of DMAs kept in flight.

Mosaic requires HBM slices to be tile-aligned — (8, 128) on the last two
dims — so each DMA fetches the aligned 8-row window containing the target
row and the kernel then selects the sublane with a vectorised one-hot
reduce. ``x.shape[1]`` must be a multiple of 8 and ``x.shape[2]`` a
multiple of 128 (callers allocate rounded-up capacity/width).

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


def _gather_kernel(tile: int, idx_ref, x_ref, idxv_ref, o_ref, s_ref, sems):
    i = pl.program_id(0)

    def issue(g, _):
        row = idx_ref[i * tile + g]

        @pl.when(row >= 0)  # negative index = skip (inactive game)
        def _():
            base = (row // 8) * 8
            pltpu.make_async_copy(
                x_ref.at[i * tile + g, pl.ds(base, 8)], s_ref.at[g],
                sems.at[g],
            ).start()

        return 0

    jax.lax.fori_loop(0, tile, issue, 0)

    def drain(g, _):
        row = idx_ref[i * tile + g]

        @pl.when(row >= 0)
        def _():
            base = (row // 8) * 8
            pltpu.make_async_copy(
                x_ref.at[i * tile + g, pl.ds(base, 8)], s_ref.at[g],
                sems.at[g],
            ).wait()

        return 0

    jax.lax.fori_loop(0, tile, drain, 0)

    # select sublane idx % 8 from each game's fetched window
    sub = jax.lax.rem(idxv_ref[...], 8)  # [tile, 1]
    oh = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1) == sub[:, :, None]
    o_ref[...] = jnp.sum(
        jnp.where(oh, s_ref[...], jnp.zeros((), s_ref.dtype)), axis=1)


def gather_rows(x: jnp.ndarray, idx: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x: [B, N, W] (N % 8 == 0, W % 128 == 0), idx: i32[B] in [0, N) ->
    [B, W]. Negative idx skips the game's DMA (output row is garbage —
    callers mask)."""
    b, n, w = x.shape
    assert n % 8 == 0, f"gather_rows needs row dim % 8 == 0, got {n}"
    assert w % 128 == 0, f"gather_rows needs lane dim % 128 == 0, got {w}"
    idx = idx.astype(jnp.int32)
    # batch sizes not divisible by 8 (e.g. eval matches at b=100) would
    # drive the tile below the (8, 128) Mosaic block floor; pad the index
    # lane with skip markers instead — padded lanes issue no DMA and the
    # padded output rows are dropped
    pad = (-b) % 8
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), -1, jnp.int32)])
    bp = b + pad
    tile = _TILE
    while bp % tile:
        tile //= 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bp // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, w), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, 8, w), x.dtype),
            pltpu.SemaphoreType.DMA((tile,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bp, w), x.dtype),
        interpret=interpret,
    )(idx, x, idx.reshape(bp, 1))
    return out[:b] if pad else out


def gather_rows_reference(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Pure-JAX mirror (one-hot reduce) for tests and non-TPU backends."""
    oh = idx[:, None] == jnp.arange(x.shape[1], dtype=jnp.int32)[None, :]
    return jnp.sum(jnp.where(oh[:, :, None], x, jnp.zeros((), x.dtype)),
                   axis=1, dtype=x.dtype)
