"""Device mesh + sharding rules (the reference's only parallelism is
single-process DataParallel, train_video.py:91-96; here parallelism is
first-class via jax.sharding).

Model-family mapping (SURVEY.md §5.7-5.8): there is no attention/sequence
axis — the natural shardable axes are the BATCH (data parallel, replacing
DataParallel scatter/gather) and the SPATIAL H axis of the 4D/5D activations
(spatial parallel; XLA SPMD inserts conv halo exchanges automatically).
Gradient all-reduce falls out of sharded autodiff — no NCCL porting.

Usage: place the batch sharded and the params replicated, then call the
already-jitted step — XLA sharding propagation partitions the entire fused
program over the mesh (collectives ride ICI).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["parse_mesh_shape", "make_mesh", "batch_spec", "shard_batch",
           "replicate", "shard_gvars"]

AXIS_DATA = "data"
AXIS_SPATIAL = "spatial"


def parse_mesh_shape(spec: str) -> Tuple[int, ...]:
    """'2x4' -> (2, 4); '8' -> (8,)."""
    return tuple(int(p) for p in spec.lower().split("x"))


def make_mesh(shape: Sequence[int],
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {tuple(shape)} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(tuple(shape))
    names = (AXIS_DATA, AXIS_SPATIAL)[:len(shape)]
    return Mesh(arr, names)


def default_mesh_shape(n_devices: int) -> Tuple[int, ...]:
    """Split devices into (data, spatial): batch gets 2-way DP when even,
    the rest shards the H axis."""
    if n_devices >= 4 and n_devices % 2 == 0:
        return (2, n_devices // 2)
    return (n_devices,)


def batch_spec(mesh: Mesh, ndim_spatial: int,
               shape: Optional[Sequence[int]] = None) -> P:
    """PartitionSpec for a (B, [T,] H, W, C) batch: B over 'data', H over
    'spatial' (if the mesh has that axis and, when ``shape`` is given, H is
    divisible by it — otherwise H stays unsharded)."""
    spatial: Optional[str] = (AXIS_SPATIAL
                              if AXIS_SPATIAL in mesh.axis_names else None)
    h_axis = 2 if ndim_spatial == 3 else 1
    if spatial is not None and shape is not None:
        n_spatial = mesh.shape[AXIS_SPATIAL]
        if shape[h_axis] % n_spatial != 0:
            spatial = None
    if ndim_spatial == 3:  # (B, T, H, W, C)
        return P(AXIS_DATA, None, spatial, None, None)
    return P(AXIS_DATA, spatial, None, None)


def shard_batch(x: jax.Array, mesh: Mesh, ndim_spatial: int) -> jax.Array:
    spec = batch_spec(mesh, ndim_spatial, x.shape)
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params, optimizer state) over the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)


def shard_gvars(gvars: Any, mesh: Mesh) -> Any:
    """Generator/critic variables are replicated: this model family is all
    3x3(x3) convs with <=25M params — replication is optimal; the FLOPs and
    memory live in activations, which the data/spatial axes shard."""
    return replicate(gvars, mesh)
