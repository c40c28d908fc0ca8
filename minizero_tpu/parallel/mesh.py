"""Device mesh + sharding helpers.

TPU-native replacement for the reference's multi-GPU plumbing
(``nn.DataParallel`` in the trainer, ``learner/train.py:119``, and one network
replica per GPU in the self-play worker, ``actor_group.cpp:168-177``): a
``jax.sharding.Mesh`` with a data axis ``dp`` and a model axis ``mp``; batches
shard over ``dp`` (XLA inserts the gradient ``psum`` over ICI), and the dense
head kernels optionally shard over ``mp``. The small ResNets never *need*
model sharding (SURVEY.md §2.5 item 8) — ``mp`` exists so the same code path
scales if someone grows the trunk.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n <= len(devices), f"requested {n} devices, have {len(devices)}"
    assert n % model_parallel == 0
    dp = n // model_parallel
    grid = np.asarray(devices[:n]).reshape(dp, model_parallel)
    return Mesh(grid, axis_names=("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch dim over ``dp``, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def batch_shardings_for(mesh: Mesh, tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P("dp")), tree)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Replicate everything except 2-D dense kernels, whose output dim shards
    over ``mp`` when divisible (tensor-parallel heads)."""
    mp = mesh.shape["mp"]

    def spec_for(path, leaf):
        if mp > 1 and hasattr(leaf, "ndim") and leaf.ndim == 2 and leaf.shape[-1] % mp == 0:
            keys = "/".join(str(getattr(p, "key", p)) for p in path)
            if "Dense" in keys and keys.endswith("kernel"):
                return NamedSharding(mesh, P(None, "mp"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
